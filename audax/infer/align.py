"""Word-level timestamps via cross-attention alignment (whisper-style).

openai-whisper's ``word_timestamps=True`` path, rebuilt TPU-first: one
jitted teacher-forced decoder pass captures per-layer cross-attention
probabilities (a ``lax.scan`` output, so depth stays O(1) compile), the
alignment heads' maps are averaged and median-filtered on device, and a
host-side dynamic-time-warping pass (O(L*S) numpy over a <=448 x 1500
matrix — microseconds) yields a monotonic token->frame path that is merged
into word timings. Each encoder frame covers 0.02 s of audio (2 mel hops).

The reference used plain ``model.transcribe`` with segment-level timestamps
only (AB/wavToWhisper.py:10-13); this is a beyond-reference capability.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audax.core.config import WhisperConfig
from audax.models.whisper import (_merge_heads, _mlp, _split_heads, dense,
                                  layer_norm)

__all__ = ["WordTiming", "cross_attention_weights", "dtw_path",
           "word_timings", "merge_punctuations",
           "PREPEND_PUNCTUATIONS", "APPEND_PUNCTUATIONS"]

SECONDS_PER_FRAME = 0.02      # encoder frame = 2 mel hops = 20 ms


@dataclass
class WordTiming:
    word: str
    start: float                # seconds within the 30 s window
    end: float
    #: mean softmax attention mass along the aligned path (a true [0,1]
    #: quantity when ``word_timings`` receives the ``mass`` matrix;
    #: falls back to the z-scored alignment values otherwise)
    probability: float


@functools.partial(jax.jit, static_argnames=("cfg", "medfilt", "dtype"))
def cross_attention_weights(params, cfg: WhisperConfig, tokens: jnp.ndarray,
                            enc: jnp.ndarray, *,
                            n_frames: Optional[jnp.ndarray] = None,
                            medfilt: int = 7,
                            dtype=jnp.float32) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """Teacher-forced decoder pass -> (alignment matrix, attention mass).

    tokens [B, L] int32, enc [B, S, d] -> (w [B, L, S], mass [B, L, S]):
    openai-whisper find_alignment order — CROP to the valid frames first
    (``n_frames``; padded frames must not soak up softmax mass or pollute
    the stats), softmax over valid frames, z-normalize per (head, frame)
    ACROSS tokens (unbiased=False), average the alignment heads (upper
    half of the decoder layers — the fallback when a checkpoint ships no
    head mask), median-filter along frames. ``mass`` is the un-normalized
    head-mean softmax mass (a real [0,1] quantity for confidences).

    Deviation from openai (documented): the median filter runs on the
    head-averaged matrix, not per head — per-head filtering would stack
    medfilt copies of the [layers/2, B, H, L, S] tensor.
    Only the upper-half layers' probabilities are materialized (two scans)."""
    from audax.models.quantize import embed_lookup
    p = params["decoder"]
    b, l = tokens.shape
    s = enc.shape[1]
    x = embed_lookup(p, tokens, dtype) + p["pos"][:l].astype(dtype)
    causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
    enc = enc.astype(dtype)
    frame_ok = (jnp.arange(s) < (s if n_frames is None else n_frames))

    def body(x, layer, want_probs: bool):
        h = layer_norm(layer["attn_ln"], x)
        q = _split_heads(dense(layer["attn"]["q"], h), cfg.heads)
        k = _split_heads(dense(layer["attn"]["k"], h), cfg.heads)
        v = _split_heads(dense(layer["attn"]["v"], h), cfg.heads)
        scale = q.shape[-1] ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        scores = jnp.where(causal, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        x = x + dense(layer["attn"]["out"],
                      _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, v)))

        h = layer_norm(layer["cross_ln"], x)
        cq = _split_heads(dense(layer["cross_attn"]["q"], h), cfg.heads)
        ck = _split_heads(dense(layer["cross_attn"]["k"], enc), cfg.heads)
        cv = _split_heads(dense(layer["cross_attn"]["v"], enc), cfg.heads)
        cscale = cq.shape[-1] ** -0.5
        cscores = jnp.einsum("bhqd,bhkd->bhqk", cq * cscale,
                             ck).astype(jnp.float32)
        cprobs = jax.nn.softmax(cscores, -1)
        x = x + dense(layer["cross_attn"]["out"],
                      _merge_heads(jnp.einsum("bhqk,bhkd->bhqd",
                                              cprobs.astype(x.dtype), cv)))
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        if not want_probs:
            return x, None
        # alignment probabilities: re-softmax over the VALID frames only
        aprobs = jax.nn.softmax(
            jnp.where(frame_ok, cscores, -jnp.inf), -1)
        return x, aprobs                        # [B, H, L, S] per layer

    n_layers = cfg.decoder_layers
    half = n_layers // 2
    lower = jax.tree.map(lambda a: a[:half], p["layers"])
    upper = jax.tree.map(lambda a: a[half:], p["layers"])
    x, _ = lax.scan(lambda c, lyr: body(c, lyr, False), x, lower)
    _, aligned = lax.scan(lambda c, lyr: body(c, lyr, True), x, upper)
    # aligned: [layers - half, B, H, L, S] softmax over valid frames
    mass = aligned.mean(axis=(0, 2))                       # [B, L, S]
    mean = aligned.mean(axis=-2, keepdims=True)            # across tokens
    std = aligned.std(axis=-2, keepdims=True) + 1e-9
    w = ((aligned - mean) / std).mean(axis=(0, 2))         # head-mean
    if medfilt > 1:
        pad = medfilt // 2
        wp = jnp.pad(w, ((0, 0), (0, 0), (pad, pad)), mode="edge")
        stacked = jnp.stack([wp[..., i:i + w.shape[-1]]
                             for i in range(medfilt)], -1)
        w = jnp.median(stacked, axis=-1)
    # beyond-valid frames carry no signal: hard-mask so DTW never walks there
    neg = jnp.float32(-1e9)
    w = jnp.where(frame_ok, w, neg)
    return w, mass


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through a [L, S] cost matrix (lower = better aligned).

    Returns (token_idx, frame_idx) arrays tracing the optimal path with
    steps (1,1), (1,0), (0,1) — openai-whisper's alignment recurrence.

    Vectorized per row: the in-row dependency
    ``row[j] = c[j] + min(m[j], row[j-1])`` (m = best of the diagonal/up
    predecessors) is a MIN-PLUS prefix scan, solvable in closed form with a
    cumulative sum and a running minimum::

        row[j] = C[j] + min_{k<=j} (m[k] - C[k-1]),   C = cumsum(c)

    so the fill is L rows of O(S) numpy vector ops instead of an O(L*S)
    Python double loop (~100x on a 224x1500 alignment — this sits on the
    per-chunk word-timestamp path). Backtracking re-derives each step by
    argmin over the three predecessors in the stored matrix (diag > up >
    left priority), which is robust to the scan's float reassociation.
    """
    l, s = cost.shape
    cost64 = np.asarray(cost, np.float64)
    d = np.full((l + 1, s + 1), np.inf)
    d[0, 0] = 0.0
    for i in range(1, l + 1):
        c = cost64[i - 1]
        m = np.minimum(d[i - 1, :-1], d[i - 1, 1:])      # diag/up per column
        cum = np.cumsum(c)
        shifted = np.concatenate(([0.0], cum[:-1]))
        d[i, 1:] = cum + np.minimum.accumulate(m - shifted)
    i, j = l, s
    ti, fi = [], []
    while i > 0 and j > 0:
        ti.append(i - 1)
        fi.append(j - 1)
        c0, c1, c2 = d[i - 1, j - 1], d[i - 1, j], d[i, j - 1]
        if c0 <= c1 and c0 <= c2:
            i, j = i - 1, j - 1
        elif c1 <= c2:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(fi[::-1])


#: openai-whisper's transcribe(prepend_punctuations/append_punctuations)
#: defaults — membership is SUBSTRING semantics, matching upstream's
#: ``word in punctuations`` checks
PREPEND_PUNCTUATIONS = "\"'\u201c\u00bf([{-"
APPEND_PUNCTUATIONS = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"


def merge_punctuations(words: List[WordTiming],
                       prepend: str = PREPEND_PUNCTUATIONS,
                       append: str = APPEND_PUNCTUATIONS
                       ) -> List[WordTiming]:
    """Fold standalone punctuation words into their neighbours
    (openai-whisper ``merge_punctuations``): an opening quote/bracket
    attaches to the FOLLOWING word (extending its start), a closing
    quote/period/comma to the PRECEDING word (extending its end). The
    content word's probability is kept — the punctuation's alignment
    confidence is noise."""
    out: List[WordTiming] = []
    pending: List[WordTiming] = []          # prepends awaiting a word
    for w in words:
        if w.word and w.word in prepend:
            pending.append(w)
        elif out and w.word and w.word in append and not pending:
            prev = out[-1]
            out[-1] = WordTiming(prev.word + w.word, prev.start,
                                 w.end, prev.probability)
        else:
            if pending:
                w = WordTiming("".join(p.word for p in pending) + w.word,
                               pending[0].start, w.end, w.probability)
                pending = []
            out.append(w)
    out.extend(pending)                      # trailing prepends: keep as-is
    return out


def word_timings(
    weights: np.ndarray,          # [L, S] alignment matrix (higher = aligned)
    token_ids: Sequence[int],     # the L generated tokens (text+timestamps)
    tokenizer,
    *, n_frames: Optional[int] = None,
    mass: Optional[np.ndarray] = None,   # [L, S] softmax attention mass
    prepend_punctuations: str = PREPEND_PUNCTUATIONS,
    append_punctuations: str = APPEND_PUNCTUATIONS,
) -> List[WordTiming]:
    """Token->frame DTW path merged into per-word timings.

    Words are whitespace-split over the decoded text; each word's span is
    the contiguous run of its tokens' aligned frames. Timestamp/special
    tokens are skipped for text but still anchor the path monotonicity.
    ``mass`` (from ``cross_attention_weights``) supplies real [0,1]
    attention-mass confidences; without it probabilities are z-scores.
    """
    l = len(token_ids)
    w = np.asarray(weights[:l], np.float32)
    score_src = w if mass is None else np.asarray(mass[:l], np.float32)
    if n_frames is not None:
        w = w[:, :n_frames]
        score_src = score_src[:, :n_frames]
    ti, fi = dtw_path(-w)

    # first/last aligned frame per token
    starts = np.full(l, -1, np.int64)
    ends = np.zeros(l, np.int64)
    for t, f in zip(ti, fi):
        if starts[t] < 0:
            starts[t] = f
        ends[t] = f
    path_score = {int(t): [] for t in range(l)}
    for t, f in zip(ti, fi):
        path_score[int(t)].append(float(score_src[t, f]))

    # group text tokens into words AT THE BYTE LEVEL: byte-BPE pieces do not
    # decode independently (UTF-8 sequences span pieces), so words are byte
    # runs split on ASCII whitespace, each run decoded once and attributed
    # to the token indices that contributed bytes to it
    base = len(tokenizer.bpe)
    ws = b" \t\n\r"
    words: List[WordTiming] = []
    cur_bytes = bytearray()
    cur_tokens: List[int] = []

    def flush():
        nonlocal cur_bytes, cur_tokens
        text = bytes(cur_bytes).decode("utf-8", errors="replace").strip()
        aligned = [t for t in cur_tokens if starts[t] >= 0]
        if text and aligned:
            s = min(starts[t] for t in aligned)
            e = max(ends[t] for t in aligned)
            probs = [p for t in aligned for p in path_score.get(t, [])]
            words.append(WordTiming(
                text, round(s * SECONDS_PER_FRAME, 3),
                round((e + 1) * SECONDS_PER_FRAME, 3),
                float(np.mean(probs)) if probs else 0.0))
        cur_bytes, cur_tokens = bytearray(), []

    for idx, tid in enumerate(token_ids):
        tid = int(tid)
        piece = tokenizer.bpe.token_bytes(tid) if tid < base else None
        if piece is None:
            # special/timestamp: skipped WITHOUT flushing — WhisperTokenizer
            # .decode(skip_special=True) merges byte runs across specials,
            # and word grouping must reproduce its text exactly
            continue
        i0 = 0
        for k, byte in enumerate(piece):
            if byte in ws:
                if k > i0:
                    cur_bytes += piece[i0:k]
                    cur_tokens.append(idx)
                flush()
                i0 = k + 1
        if i0 < len(piece):
            cur_bytes += piece[i0:]
            cur_tokens.append(idx)
    flush()
    return merge_punctuations(words, prepend_punctuations,
                              append_punctuations)
