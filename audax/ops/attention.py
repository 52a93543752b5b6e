"""Flash attention: fused online-softmax kernels (Pallas TPU) + XLA twin.

Plain attention materialises the [B, H, Tq, Tk] score tensor in HBM
(models/whisper.py:attention; the reference's torch equivalents are the
transformer blocks in .charles/spectrogram.py:831-867 and
.charles/music2midi/model.py — all softmax(QK^T)V with materialised
scores). At Whisper-large-v3 encoder scale (H=20, T=1500) that is
~180 MB of f32 score traffic per layer per direction; this module keeps
score blocks in VMEM and streams K/V once.

Forward: grid (B*Hq, Tq/bq, Tk/bk) with the k-block axis innermost;
(m, l, acc) scratch carries the online-softmax state across the
sequential grid steps, and the output plus logsumexp are written on the
last k-block. Rows: running max m, normaliser l, accumulator acc — the
standard rescaling recurrence (Flash-Attention; PAPERS.md).

Backward: no O(T^2) residual — block scores are recomputed from the
saved logsumexp. Two kernels: dq over (bh, iq, ik) and a fused dk/dv
over (bhkv, ik, g, iq) whose inner (g, iq) loops also fold grouped-query
heads into the shared KV gradient. delta = rowsum(dO * O) is a cheap
elementwise pass left to XLA.

GQA (Hkv < Hq) is handled purely by block index maps (the kv block of
q-head h is block h // group — no jnp.repeat materialisation). Causal
masking skips whole above-diagonal blocks and lane-masks the diagonal.
Ragged (padded) Tk is masked from the static true length.

Probabilities are cast to the value dtype before the PV matmul, matching
the XLA path (and openai-whisper, which runs attention in model dtype).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "xla_attention", "dot_product_attention",
           "decode_attention", "decode_attention_stacked",
           "flash_applicable"]

_NEG = -1e30  # masking constant; -inf would NaN the m-recurrence


from audax.ops.common import pad_to as _pad_to  # noqa: E402 - shared policy


# ---------------------------------------------------------------- forward --

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, scale: float, causal: bool, kv_len: int,
                block_q: int, block_k: int, fold: int = 1):
    """``fold`` independent heads per grid step (round-5 experiment,
    tools/attn_headfold_probe.py + results/attn_headfold_probe.json): the
    per-head score/softmax/PV chains are independent, so folding two
    heads into one body lets Mosaic overlap head A's VPU softmax with
    head B's MXU dots. Measured bit-exact, and +10-12% on a contiguous
    [96,1536,64] probe — but 4% SLOWER inside the real jitted product
    call (pad/reshape prologue at tq_p=1504: XLA inserts operand layout
    copies for the folded block shape that eat the kernel win; stable
    across in-process A/Bs). Default is therefore fold=1;
    AUDAX_ATTN_FOLD=2 opts in for contiguous-operand shapes where the
    kernel-level win survives. fold=1 generates exactly the pre-fold
    kernel."""
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, _NEG, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def _step():
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = cols < kv_len
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, cols <= rows)
        for h in range(fold):
            q = q_ref[h]
            k = k_ref[h]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            s = jnp.where(valid, s, _NEG)
            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(valid, p, 0.0)      # fully-masked blocks: p == 0
            l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            pv = jnp.dot(p.astype(v_ref.dtype), v_ref[h],
                         preferred_element_type=jnp.float32)
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

    if causal:   # skip whole above-diagonal k-blocks
        pl.when(ik * block_k <= iq * block_q + block_q - 1)(_step)
    else:
        _step()

    @pl.when(ik == nk - 1)
    def _finish():
        for h in range(fold):
            l = l_ref[h, :, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)  # padded q rows: safe
            o_ref[h] = (acc_ref[h] / l_safe).astype(o_ref.dtype)
            lse_ref[h] = m_ref[h, :, :1] + jnp.log(l_safe)


#: upper bound on fold * block_q for the folded forward: fold multiplies
#: the q/o/acc/m/l VMEM residency, and fold=2 at block_q 2048 would plan
#: past the 16 MB scoped-vmem limit (fold2@1536 measured 11-12% faster,
#: repeatedly compiled at ~15 MB)
_FOLD_BQ_LIMIT = 3072


def _pick_fold(*, causal: bool, group: int, bhq: int, block_q: int) -> int:
    """Head folding is OPT-IN (AUDAX_ATTN_FOLD=2): the kernel-level win
    did not survive the product call's pad/reshape prologue (see
    _fwd_kernel docstring). Applies only to non-causal MHA; causal tiles
    and GQA index maps keep the fold=1 kernel."""
    want = int(os.environ.get("AUDAX_ATTN_FOLD", "1"))
    if causal or group != 1 or want <= 1:
        return 1
    fold = min(want, 2)
    if bhq % fold or fold * block_q > _FOLD_BQ_LIMIT:
        return 1
    return fold


def _fwd(q3, k3, v3, *, group: int, scale: float, causal: bool, kv_len: int,
         block_q: int, block_k: int, interpret: bool):
    """q3 [BHq, Tq_p, D]; k3/v3 [BHkv, Tk_p, D] -> (o [BHq, Tq_p, D],
    lse [BHq, Tq_p] f32)."""
    bhq, tq, d = q3.shape
    tk = k3.shape[1]
    fold = _pick_fold(causal=causal, group=group, bhq=bhq, block_q=block_q)
    grid = (bhq // fold, tq // block_q, tk // block_k)
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             kv_len=kv_len, block_q=block_q,
                             block_k=block_k, fold=fold)
    if fold == 1:
        kv_spec = pl.BlockSpec((1, block_k, d),
                               lambda b, i, j: (b // group, j, 0),
                               memory_space=pltpu.VMEM)
    else:       # group == 1 by _pick_fold: kv blocks fold like q blocks
        kv_spec = pl.BlockSpec((fold, block_k, d), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fold, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((fold, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # lse as a [T, 1] column: lane-1 blocks keep every in-kernel
            # use a sublane column (no lane<->sublane relayouts)
            pl.BlockSpec((fold, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bhq, tq, d), q3.dtype),
            jax.ShapeDtypeStruct((bhq, tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((fold, block_q, 128), jnp.float32),
            pltpu.VMEM((fold, block_q, 128), jnp.float32),
            pltpu.VMEM((fold, block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3)


# --------------------------------------------------------------- backward --

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref,
               acc_ref, *, scale: float, causal: bool, kv_len: int,
               block_q: int, block_k: int):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = cols < kv_len
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, cols <= rows)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0]), 0.0)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dlt_ref[0]) * scale
        acc_ref[:] = acc_ref[:] + jnp.dot(ds.astype(k.dtype), k,
                                          preferred_element_type=jnp.float32)

    if causal:
        pl.when(ik * block_k <= iq * block_q + block_q - 1)(_step)
    else:
        _step()

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float, causal: bool,
                kv_len: int, block_q: int, block_k: int):
    ik = pl.program_id(1)
    g = pl.program_id(2)
    iq = pl.program_id(3)
    ng = pl.num_programs(2)
    nq = pl.num_programs(3)

    @pl.when(jnp.logical_and(g == 0, iq == 0))
    def _init():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    def _step():
        q = q_ref[0]
        k = k_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = cols < kv_len
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, cols <= rows)
        p = jnp.where(valid, jnp.exp(s - lse_ref[0]), 0.0)
        # dv += P^T @ dO   (contract the q axis)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dlt_ref[0]) * scale
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(iq * block_q + block_q - 1 >= ik * block_k)(_step)
    else:
        _step()

    @pl.when(jnp.logical_and(g == ng - 1, iq == nq - 1))
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_pallas(q3, k3, v3, o3, lse, do3, *, group: int, scale: float,
                causal: bool, kv_len: int, block_q: int, block_k: int,
                interpret: bool):
    bhq, tq, d = q3.shape
    bhkv, tk, _ = k3.shape
    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32),
                    axis=-1, keepdims=True)        # [BHq, Tq, 1]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          kv_len=kv_len, block_q=block_q, block_k=block_k),
        grid=(bhq, tq // block_q, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // group, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bhq, tq, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)

    # (bhkv, ik, g, iq): inner (g, iq) sweep folds the whole q-head group
    # into one resident dk/dv block — GQA KV grads without a jnp.repeat.
    def qmap(b, j, g_, i):
        # shared by every q-row-shaped operand (q, do, lse, delta): the
        # block width differs per BlockSpec, the row indexing does not
        return (b * group + g_, i, 0)

    qvecmap = qmap

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          kv_len=kv_len, block_q=block_q, block_k=block_k),
        grid=(bhkv, tk // block_k, group, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, g_, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, g_, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qvecmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qvecmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, g_, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, g_, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bhkv, tk, d), k3.dtype),
            jax.ShapeDtypeStruct((bhkv, tk, d), v3.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta)
    return dq, dk, dv


# ------------------------------------------------------- custom-vjp glue --

class _FlashCfg(NamedTuple):
    causal: bool
    scale: float
    block_q: int
    block_k: int
    interpret: bool
    tq: int          # true (unpadded) lengths — static at trace time
    tk: int


def _run_fwd(cfg: _FlashCfg, q, k, v):
    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    bq = min(cfg.block_q, _pad_to(tq, 16))
    bk = min(cfg.block_k, _pad_to(cfg.tk, 16))
    tq_p, tk_p = _pad_to(tq, bq), _pad_to(cfg.tk, bk)
    q3 = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0))
                 ).reshape(b * hq, tq_p, d)
    k3 = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - cfg.tk), (0, 0))
                 ).reshape(b * hkv, tk_p, d)
    v3 = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - cfg.tk), (0, 0))
                 ).reshape(b * hkv, tk_p, d)
    o3, lse = _fwd(q3, k3, v3, group=group, scale=cfg.scale,
                   causal=cfg.causal, kv_len=cfg.tk, block_q=bq, block_k=bk,
                   interpret=cfg.interpret)
    o = o3.reshape(b, hq, tq_p, d)[:, :, :tq]
    return o, (q3, k3, v3, o3, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(cfg: _FlashCfg, q, k, v):
    return _run_fwd(cfg, q, k, v)[0]


def _flash_fwd_rule(cfg, q, k, v):
    o, res = _run_fwd(cfg, q, k, v)
    return o, res


def _flash_bwd_rule(cfg, res, do):
    q3, k3, v3, o3, lse = res
    bhq, tq_p, d = q3.shape
    bhkv, tk_p, _ = k3.shape
    b, hq = do.shape[:2]                   # do is [B, Hq, Tq, D]
    hkv = bhkv // b
    group = hq // hkv
    bq = min(cfg.block_q, _pad_to(cfg.tq, 16))
    bk = min(cfg.block_k, _pad_to(cfg.tk, 16))
    do3 = jnp.pad(do, ((0, 0), (0, 0), (0, tq_p - do.shape[2]), (0, 0))
                  ).reshape(bhq, tq_p, d)
    dq3, dk3, dv3 = _bwd_pallas(q3, k3, v3, o3, lse, do3, group=group,
                                scale=cfg.scale, causal=cfg.causal,
                                kv_len=cfg.tk, block_q=bq, block_k=bk,
                                interpret=cfg.interpret)
    dq = dq3.reshape(b, hq, tq_p, d)[:, :, :cfg.tq]
    dk = dk3.reshape(b, hkv, tk_p, d)[:, :, :cfg.tk]
    dv = dv3.reshape(b, hkv, tk_p, d)[:, :, :cfg.tk]
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False) -> jax.Array:
    """Fused attention. q [B, Hq, Tq, D]; k/v [B, Hkv, Tk, D] with
    Hq % Hkv == 0 (grouped-query). Differentiable (custom VJP, flash
    backward kernels). Causal requires Tq == Tk (token-aligned ends).

    Default blocks (v5e-tuned): non-causal keeps the whole q tile
    resident (up to 2048 rows) and streams K/V; causal uses small
    128x256 blocks so whole above-diagonal k-blocks are skipped."""
    b, hq, tq, d = q.shape
    if causal and tq != k.shape[2]:
        raise ValueError("causal flash attention requires Tq == Tk")
    if hq % k.shape[1]:
        raise ValueError(f"Hq={hq} not a multiple of Hkv={k.shape[1]}")
    if causal:
        block_q = block_q or 128
        block_k = block_k or 256
    else:
        block_q = block_q or 2048
        block_k = block_k or 512
    cfg = _FlashCfg(causal=causal,
                    scale=float(scale if scale is not None else d ** -0.5),
                    block_q=block_q, block_k=block_k, interpret=interpret,
                    tq=tq, tk=k.shape[2])
    return _flash(cfg, q, k, v)


# -------------------------------------------------- decode (cached KV) ----

def _dec_kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *,
                scale: float, kv_len: int, quant: bool):
    """Small-query attention over one (b, head)'s whole cached K/V.

    The entire [S, D] K and V live in VMEM for the grid slot (decode
    caches are small: large-v3 cross KV is 96 KB int8 per head), so no
    inter-block softmax state is needed. Int8 scales fold into the score
    ([Tq, S] * [1, S]) and prob rows — lane-aligned broadcasts, never a
    [S, 1] column fetch (whose physical tile would 8x the KV traffic).
    Query row i sits at absolute position pos+i and may see keys
    <= pos+i (pos >= kv_len disables the mask — cross-attention)."""
    tq, s_len = q_ref.shape[1], k_ref.shape[1]
    pos = pos_ref[0]
    s = jax.lax.dot_general(q_ref[0], k_ref[0].astype(q_ref.dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if quant:
        s = s * ks_ref[0]                          # [Tq, S] * [1, S]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, s_len), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, s_len), 0)
    valid = jnp.logical_and(cols < kv_len, cols <= pos + rows)
    s = jnp.where(valid, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    if quant:
        p = p * vs_ref[0]
    pv = jnp.dot(p.astype(q_ref.dtype), v_ref[0].astype(q_ref.dtype),
                 preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def decode_attention(q: jax.Array, kv, *, pos=None,
                     scale: Optional[float] = None,
                     backend: Optional[str] = None,
                     interpret: bool = False) -> jax.Array:
    """Attention for the KV-cached decode path (Tq of 1..~16).

    q [B, H, Tq, D]; ``kv`` either float (k, v) [B, H, S, D] or the int8
    4-tuple (k_q, k_scale, v_q, v_scale) with [B, H, S] per-vector scales
    (models/whisper.py:QuantKV fields, GQA via Hkv < H). ``pos``: scalar
    int32 — query row i may attend keys <= pos+i (None = every key;
    cross-attention).

    The Pallas path fuses scores + softmax + PV over the whole cached KV
    in VMEM with int8 scales folded along lanes; the profiled XLA decode
    spent ~30% of large-v3 per-token time in these two matvecs at
    140-213 GB/s. Prefer ``decode_attention_stacked`` inside layer scans
    (no per-layer cache slice materialisation).
    """
    quant = len(kv) == 4
    if quant:
        k, ks, v, vs = kv
    else:
        k, v = kv
        ks = vs = None
    b, h, tq, d = q.shape
    hkv = k.shape[1]
    group = h // hkv               # grouped-query: kv head = q head // group
    s_len = k.shape[2]
    scale = float(scale if scale is not None else d ** -0.5)
    backend = backend or _ENV_BACKEND or ("pallas" if _on_tpu() else "xla")
    if backend != "pallas" or (pos is not None
                               and jnp.ndim(pos) > 0):
        # per-slot [B] pos vectors are the stacked kernel's job
        # (decode_attention_stacked); here they take the XLA twin so both
        # backends accept the same inputs instead of the pallas path
        # crashing on a size-B reshape
        return _decode_attention_xla(q, k, v, ks, vs, pos=pos, scale=scale)

    posv = jnp.asarray(s_len if pos is None else pos,
                       jnp.int32).reshape(1)
    tq_p = _pad_to(tq, 8)
    q3 = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0))
                 ).reshape(b * h, tq_p, d)
    # no S padding/copies: whole-KV blocks (block dim == array dim is
    # always legal), reshape to [B*Hkv, S, D] is a free bitcast
    k3 = k.reshape(b * hkv, s_len, d)
    v3 = v.reshape(b * hkv, s_len, d)
    if quant:
        ks3 = ks.reshape(b * hkv, 1, s_len)
        vs3 = vs.reshape(b * hkv, 1, s_len)
    else:  # dummy minimal operands keep one kernel signature
        ks3 = jnp.zeros((b * hkv, 1, 1), jnp.float32)
        vs3 = ks3
    sblk = (1, 1, s_len) if quant else (1, 1, 1)
    out = pl.pallas_call(
        functools.partial(_dec_kernel, scale=scale, kv_len=s_len,
                          quant=quant),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_len, d), lambda bh: (bh // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_len, d), lambda bh: (bh // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, lambda bh: (bh // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, lambda bh: (bh // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(posv, q3, k3, v3, ks3, vs3)
    return out.reshape(b, h, tq_p, d)[:, :, :tq]


def _dec_kernel_stacked(layer_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref,
                        vs_ref, o_ref, *, scale: float, kv_len: int,
                        quant: bool, heads: int):
    """_dec_kernel over a layer-STACKED cache: the [L, B, H, S, D] cache
    block is selected by the scalar-prefetched layer index in the
    BlockSpec index maps, so the per-layer slice is a DMA straight out of
    the stacked buffer — XLA never materialises a sliced copy (which cost
    as much as the attention itself when pallas operands forced it).
    ``pos_ref`` is a prefetched [B] vector — per-slot decode depths for
    continuous batching; the grid slot's batch index selects its entry."""
    tq, s_len = q_ref.shape[1], k_ref.shape[3]
    pos = pos_ref[pl.program_id(0) // heads]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    s = jax.lax.dot_general(q_ref[0], k.astype(q_ref.dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if quant:
        s = s * ks_ref[0, 0, 0]                    # [Tq, S] * [1, S]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, s_len), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, s_len), 0)
    valid = jnp.logical_and(cols < kv_len, cols <= pos + rows)
    s = jnp.where(valid, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    if quant:
        p = p * vs_ref[0, 0, 0]
    pv = jnp.dot(p.astype(q_ref.dtype), v.astype(q_ref.dtype),
                 preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def decode_attention_stacked(q: jax.Array, kv, layer, *, pos=None,
                             scale: Optional[float] = None,
                             backend: Optional[str] = None,
                             interpret: bool = False) -> jax.Array:
    """``decode_attention`` against the full layer-stacked decode cache.

    q [B, H, Tq, D]; ``kv`` float (k, v) [L, B, Hkv, S, D] or the int8
    4-tuple with [L, B, Hkv, S] scales; ``layer`` scalar int32 selects
    the layer INSIDE the kernel's index maps (scalar prefetch) — the hot
    decode loop never materialises a per-layer slice of the cache.

    ``pos`` may be a scalar or a per-slot [B] vector (continuous-batching
    serving: slots sit at different decode depths; infer/continuous.py)."""
    quant = len(kv) == 4
    if quant:
        k, ks, v, vs = kv
    else:
        k, v = kv
        ks = vs = None
    b, h, tq, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    s_len = k.shape[3]
    scale = float(scale if scale is not None else d ** -0.5)
    backend = backend or _ENV_BACKEND or ("pallas" if _on_tpu() else "xla")
    if backend != "pallas":
        sl = lambda x: (jax.lax.dynamic_index_in_dim(x, layer, 0,
                                                     keepdims=False)
                        if x is not None else None)
        return _decode_attention_xla(q, sl(k), sl(v), sl(ks), sl(vs),
                                     pos=pos, scale=scale)

    layv = jnp.asarray(layer, jnp.int32).reshape(1)
    posv = jnp.broadcast_to(jnp.asarray(s_len if pos is None else pos,
                                        jnp.int32), (b,))
    tq_p = _pad_to(tq, 8)
    q3 = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0))
                 ).reshape(b * h, tq_p, d)
    if quant:
        # free singleton axis keeps the scale block's trailing dims legal:
        # (1, S) with both equal to the array dims
        ks4 = ks.reshape(*ks.shape[:3], 1, s_len)
        vs4 = vs.reshape(*vs.shape[:3], 1, s_len)
    else:
        ks4 = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
        vs4 = ks4
    sblk = ((1, 1, 1, 1, s_len) if quant else (1, 1, 1, 1, 1))

    def kvmap(bh, lref, pref):
        return (lref[0], bh // h, (bh % h) // group, 0, 0)

    def smap(bh, lref, pref):
        if quant:
            return (lref[0], bh // h, (bh % h) // group, 0, 0)
        return (0, 0, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq_p, d), lambda bh, lref, pref: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s_len, d), kvmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s_len, d), kvmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, smap, memory_space=pltpu.VMEM),
            pl.BlockSpec(sblk, smap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq_p, d),
                               lambda bh, lref, pref: (bh, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_dec_kernel_stacked, scale=scale, kv_len=s_len,
                          quant=quant, heads=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(layv, posv, q3, k, v, ks4, vs4)
    return out.reshape(b, h, tq_p, d)[:, :, :tq]


def _decode_attention_xla(q, k, v, ks, vs, *, pos, scale):
    """Einsum twin (the original models/whisper.py decode path math)."""
    dt = q.dtype
    group = q.shape[1] // k.shape[1]
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
        if ks is not None:
            ks = jnp.repeat(ks, group, axis=1)
            vs = jnp.repeat(vs, group, axis=1)
    if ks is not None:
        s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, dt),
                       k.astype(dt))
        s = s * ks[:, :, None, :].astype(dt)
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, dt), k)
    if pos is not None:
        tq, s_len = s.shape[-2:]
        cols = jnp.arange(s_len)[None, :]
        rows = jnp.arange(tq)[:, None]
        pos_b = jnp.asarray(pos, jnp.int32)
        if pos_b.ndim == 0:
            mask = (cols <= pos_b + rows)[None, None]
        else:  # per-slot decode depths (continuous batching)
            mask = (cols[None] <= pos_b[:, None, None] + rows[None]
                    )[:, None]
        s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(dt)
    if vs is not None:
        return jnp.einsum("bhqk,bhkd->bhqd",
                          p * vs[:, :, None, :].astype(dt), v.astype(dt))
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ------------------------------------------------------------ XLA twin ----

def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                  causal: bool = False, mask: Optional[jax.Array] = None,
                  scale: Optional[float] = None) -> jax.Array:
    """Reference/materialised path (identical math to
    models/whisper.py:attention): softmax in f32, probs cast to the
    compute dtype before PV. Supports GQA and arbitrary masks."""
    d = q.shape[-1]
    scale = float(scale if scale is not None else d ** -0.5)
    group = q.shape[1] // k.shape[1]
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    if causal:
        tq, tk = s.shape[-2:]
        cm = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ----------------------------------------------------------- dispatcher ---

from audax.ops.common import on_tpu as _on_tpu  # noqa: E402 - shared policy


_ENV_BACKEND = os.environ.get("AUDAX_ATTN_BACKEND", "").strip() or None


def flash_applicable(q_shape, k_shape, mask, causal: bool = False) -> bool:
    """Flash path: no arbitrary mask, head dims grouped, enough rows that
    the kernel beats the fused-XLA small case (decode has Tq == 1), and —
    for causal — square Tq == Tk (the kernel's block-skip assumes aligned
    diagonals; the XLA twin handles end-aligned rectangular causal)."""
    return (mask is None and q_shape[-1] == k_shape[-1]
            and q_shape[1] % k_shape[1] == 0 and q_shape[2] >= 16
            and k_shape[2] >= 16
            and (not causal or q_shape[2] == k_shape[2]))


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                          causal: bool = False,
                          mask: Optional[jax.Array] = None,
                          scale: Optional[float] = None,
                          backend: Optional[str] = None,
                          interpret: bool = False) -> jax.Array:
    """Backend-dispatched attention: the Pallas flash kernel on TPU, the
    XLA twin elsewhere (or via AUDAX_ATTN_BACKEND / ``backend=``)."""
    backend = backend or _ENV_BACKEND or ("pallas" if _on_tpu() else "xla")
    if backend == "pallas" and flash_applicable(q.shape, k.shape, mask,
                                                causal):
        return flash_attention(q, k, v, causal=causal, scale=scale,
                               interpret=interpret)
    return xla_attention(q, k, v, causal=causal, mask=mask, scale=scale)
