import jax, jax.numpy as jnp, numpy as np, glob, gzip, json, collections
from audax.core.runtime import setup
setup()
from audax.core.config import WhisperConfig
from audax.models.whisper import init_whisper_params, encode
from audax.models.quantize import quantize_tree
from audax.infer.decode import generate

cfg = WhisperConfig.large_v3()
params = jax.jit(lambda r: init_whisper_params(cfg, r))(jax.random.key(0))
params = quantize_tree(params)
rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((1, 3000, 128)).astype(np.float32)).astype(jnp.bfloat16)
enc = encode(params, cfg, mel, jnp.bfloat16)
prompt = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
g = lambda: generate(params, cfg, enc, prompt, max_len=68, eos_id=2,
                     dtype=jnp.bfloat16, kv_quant=True)
r = g(); np.asarray(r.lengths)          # compile+warm
with jax.profiler.trace("/tmp/jaxtrace2"):
    r = g(); np.asarray(r.lengths)

f = sorted(glob.glob("/tmp/jaxtrace2/**/*.trace.json.gz", recursive=True))[-1]
ev = json.loads(gzip.open(f).read())["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
print("processes:", pids)
dur = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        dur[e.get("name", "?")[:60]] += e.get("dur", 0)
total = sum(dur.values())
print(f"total device us: {total}")
for name, d in dur.most_common(25):
    print(f"{d/1e3:9.2f} ms  {100*d/max(total,1):5.1f}%  {name}")
