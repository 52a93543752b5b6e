"""Standalone causal-LM pretraining (train/lm.py + CLI train-lm): corpus
packing, learning on structured data, checkpoint round-trip into the
two-tower (the reference's pretrained-Qwen slot, music2midi/model.py:209)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.models.causal_lm import CausalLMConfig, init_causal_lm, lm_forward
from audax.train.lm import (LMTrainConfig, fit_lm, make_lm_train_step,
                            init_lm_state, pack_corpus)

TINY = CausalLMConfig(vocab_size=64, d_model=32, layers=2, heads=4,
                      kv_heads=2, ffn_dim=64, tie_embeddings=True)


def test_pack_corpus_windows():
    ids = np.arange(1000, dtype=np.int32)
    w = pack_corpus(ids, seq_len=64)
    assert w.shape == (15, 65)
    # consecutive windows overlap by exactly one token: every transition
    # (t -> t+1) is trained once
    np.testing.assert_array_equal(w[0], np.arange(65))
    assert w[1][0] == w[0][-1]
    np.testing.assert_array_equal(w[1], np.arange(64, 129))
    with pytest.raises(ValueError, match="shorter"):
        pack_corpus(np.arange(10), seq_len=64)


def test_lm_accum_matches_full_batch(rng):
    """accum_steps=2 reproduces the accum=1 loss exactly (summed-CE trick)."""
    params = init_causal_lm(TINY, jax.random.key(0))
    windows = jnp.asarray(rng.integers(0, TINY.vocab_size, (8, 17)),
                          jnp.int32)
    base = LMTrainConfig(max_steps=4, batch_size=8, seq_len=16)
    losses = []
    for accum in (1, 2):
        cfg = LMTrainConfig(**{**base.__dict__, "accum_steps": accum})
        step = make_lm_train_step(TINY, cfg, donate=False)
        state = init_lm_state(params, cfg)
        _, m = step(state, windows)
        losses.append(float(np.asarray(m["loss"])))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


def test_lm_remat_matches_and_saves_memory(rng):
    """LMTrainConfig.remat checkpoints each scanned layer: identical loss,
    strictly less planned temp memory than no remat (the whisper
    per-layer-remat contract, models/whisper._remat_body)."""
    params = init_causal_lm(TINY, jax.random.key(0))
    windows = jnp.asarray(rng.integers(0, TINY.vocab_size, (8, 17)),
                          jnp.int32)
    base = LMTrainConfig(max_steps=4, batch_size=8, seq_len=16)
    out = {}
    for remat in ("", "full"):
        cfg = LMTrainConfig(**{**base.__dict__, "remat": remat})
        step = make_lm_train_step(TINY, cfg, donate=False)
        state = init_lm_state(params, cfg)
        compiled = step.lower(state, windows).compile()
        _, m = compiled(state, windows)
        out[remat] = (float(np.asarray(m["loss"])),
                      int(compiled.memory_analysis().temp_size_in_bytes))
    assert out[""][0] == pytest.approx(out["full"][0], rel=1e-6)
    assert out["full"][1] < out[""][1], out


def test_fit_lm_learns_and_round_trips(tmp_path):
    """A structured corpus (short repeating motif) is learnable: eval ppl
    drops well below uniform; the best checkpoint reloads via load_pytree
    and plugs into build_two_tower as the pretrained decoder."""
    rng = np.random.default_rng(0)
    motif = rng.integers(0, TINY.vocab_size, 16)
    corpus = np.tile(motif, 400).astype(np.int32)        # 6400 tokens
    params = init_causal_lm(TINY, jax.random.key(1))
    cfg = LMTrainConfig(max_steps=60, batch_size=16, seq_len=32,
                        eval_every=30, eval_windows=8, learning_rate=1e-2,
                        warmup_steps=5)
    ckpt = str(tmp_path / "lm")
    trained, history = fit_lm(params, TINY, cfg, corpus, ckpt_dir=ckpt)
    assert history and "eval_ppl" in history[-1]
    # a 16-token loop is near-deterministic once seen: ppl far below vocab
    assert history[-1]["eval_ppl"] < 8.0, history
    assert history[-1]["eval_loss"] < history[0]["eval_loss"] * 1.01
    # checkpoint round-trip -> pretrained decoder slot of the two-tower
    from audax.train.checkpoints import load_pytree
    best = load_pytree(os.path.join(ckpt, "best"))
    out_a = lm_forward(trained, TINY, jnp.asarray(corpus[:12])[None])
    out_b = lm_forward(best, TINY, jnp.asarray(corpus[:12])[None])
    # best is the lowest-eval step, not necessarily the last: same model
    # family, finite diff allowed — just prove it runs and is well-formed
    assert out_b.shape == out_a.shape
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.models.two_tower import build_two_tower
    wcfg = WhisperConfig(n_mels=16, n_audio_ctx=16, d_model=32,
                         encoder_layers=1, decoder_layers=1, heads=2,
                         vocab_size=64, n_text_ctx=8)
    model = build_two_tower(TwoTowerConfig(), wcfg, TINY,
                            TINY.vocab_size + 4, jax.random.key(2),
                            lm_params=best)
    # resize preserved the pretrained rows, extended the vocab
    assert model.params["lm"]["embed"].shape[0] == TINY.vocab_size + 4
    np.testing.assert_allclose(
        np.asarray(model.params["lm"]["embed"][: TINY.vocab_size]),
        np.asarray(best["embed"]), atol=0)


def test_train_lm_cli(tmp_path):
    """CLI train-lm end-to-end: corpus files -> BPE -> checkpoints."""
    from audax.cli.main import main
    from audax.symbolic.bpe import train_bpe
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    text = "X:1\nK:C\nC D E F | G A B c |\n" * 40
    (corpus_dir / "a.abc").write_text(text)
    (corpus_dir / "b.abc").write_text(text)
    tok_dir = str(tmp_path / "tok")
    train_bpe([text], vocab_size=280).save(tok_dir)
    out = str(tmp_path / "lm")
    rc = main(["train-lm", "--corpus", str(corpus_dir),
               "--tokenizer-dir", tok_dir, "--out-dir", out,
               "--lm-size", "tiny", "--steps", "6", "--batch-size", "4",
               "--seq-len", "32", "--eval-every", "3"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "best.json"))
    assert os.path.exists(os.path.join(out, "config.json"))


def test_fit_lm_moe_with_aux_loss(tmp_path):
    """MoE pretraining: CE + Switch aux loss trains (finite, decreasing CE)
    and the router stays balanced enough to keep the aux term small."""
    from audax.models.causal_lm import load_balance_loss
    cfg = CausalLMConfig(vocab_size=64, d_model=32, layers=2, heads=4,
                         kv_heads=2, ffn_dim=64, num_experts=4,
                         experts_per_tok=2, moe_ffn_dim=32, qk_norm=True)
    rng = np.random.default_rng(1)
    motif = rng.integers(0, cfg.vocab_size, 16)
    corpus = np.tile(motif, 300).astype(np.int32)
    params = init_causal_lm(cfg, jax.random.key(3))
    tc = LMTrainConfig(max_steps=40, batch_size=8, seq_len=32,
                       eval_every=20, eval_windows=4, learning_rate=1e-2,
                       warmup_steps=5)
    trained, history = fit_lm(params, cfg, tc, corpus)
    assert history[-1]["eval_loss"] < history[0]["eval_loss"]
    # router balance after training: aux loss near its balanced floor (E
    # when perfectly uniform, HF normalization) — not collapsed (>> E)
    toks = jnp.asarray(corpus[:65][None])
    _, router = lm_forward(trained, cfg, toks[:, :-1],
                           return_router_logits=True)
    aux = float(load_balance_loss(router, cfg.num_experts,
                                  cfg.experts_per_tok))
    assert np.isfinite(aux) and aux < 3.0 * cfg.num_experts


def test_fit_lm_dp_and_fsdp_match_single_device():
    """fit_lm on an 8-device data mesh (replicated params, then ZeRO-3
    FSDP) reproduces the single-device losses — same windows, same PRNG
    batch order — and FSDP really shards the parameters over 'data'."""
    from jax.sharding import Mesh
    from audax.train.lm import init_lm_state
    # big enough that leaves clear fsdp's min_size replication floor
    big = CausalLMConfig(vocab_size=96, d_model=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, tie_embeddings=True)
    rng = np.random.default_rng(2)
    corpus = np.tile(rng.integers(0, big.vocab_size, 24), 200).astype(
        np.int32)
    cfg = LMTrainConfig(max_steps=6, batch_size=16, seq_len=32,
                        eval_every=3, eval_windows=4, learning_rate=5e-3,
                        warmup_steps=2)
    params = init_causal_lm(big, jax.random.key(5))
    _, ref = fit_lm(params, big, cfg, corpus)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    for use_fsdp in (False, True):
        _, got = fit_lm(params, big, cfg, corpus, mesh=mesh,
                        fsdp=use_fsdp)
        for a, b in zip(ref, got):
            assert a["loss"] == pytest.approx(b["loss"], rel=2e-4), \
                (use_fsdp, ref, got)
    # placement check: ZeRO-3 shards leaves over 'data'
    from audax.parallel.fsdp import fsdp_shard_state
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES
    st = fsdp_shard_state(init_lm_state(params, cfg), mesh,
                          rules=CAUSAL_LM_TP_RULES)
    spec = st.params["layers"]["q"]["kernel"].sharding.spec
    assert "data" in jax.tree.leaves(tuple(spec)), spec
