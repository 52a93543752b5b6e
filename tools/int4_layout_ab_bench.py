import time, numpy as np, jax, jax.numpy as jnp
from audax.core.runtime import setup
setup()
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from int4_layout_ab import int4_matmul_v2, quantize_int4_v2
from audax.ops.int4_matmul import int4_matmul, quantize_int4

rng = np.random.default_rng(0)
m, k_dim, n = 8, 1280, 5120
w = jnp.asarray(rng.standard_normal((k_dim, n)).astype(np.float32))
xbf = jnp.asarray(rng.standard_normal((m, k_dim)).astype(np.float32)).astype(jnp.bfloat16)
p1, s1 = quantize_int4(w)
p2, s2 = quantize_int4_v2(w)
wbf = w.astype(jnp.bfloat16)

from audax.utils.profiling import slope_timed as loop_timed

pk = k_dim * n * 0.5 / 2**30
for name, fn, args, byts in [
    ("v1-u8 ", lambda x_, p_, s_: int4_matmul(x_, p_, s_), (xbf, p1, s1), pk),
    ("v2-i32", lambda x_, p_, s_: int4_matmul_v2(x_, p_, s_), (xbf, p2, s2), pk),
    ("bf16  ", lambda x_, w_: jax.lax.dot_general(
        x_, w_, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16), (xbf, wbf),
     k_dim * n * 2 / 2**30),
]:
    dt = loop_timed(fn, args)
    print(f"{m}x{k_dim}x{n} {name}: {dt*1e6:7.2f} us  {byts/dt:6.1f} GB/s",
          flush=True)
