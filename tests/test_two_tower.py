"""Two-tower model: fusion forward, partial-unfreeze training dynamics,
KV-cached generation, trainable-only checkpoint roundtrip."""

import csv
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import TwoTowerConfig, WhisperConfig
from audax.models.causal_lm import CausalLMConfig, init_causal_lm
from audax.models.two_tower import TwoTowerModel, adapter_apply, init_adapter
from audax.models.whisper import init_whisper_params
from audax.train.two_tower import (init_two_tower_optimizer,
                                   layer_unfreeze_mask,
                                   load_trainable_checkpoint,
                                   make_two_tower_step,
                                   save_trainable_checkpoint,
                                   trainable_param_counts, TwoTowerState)

AUDIO = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=24, encoder_layers=1,
                      decoder_layers=1, heads=2, vocab_size=40, n_text_ctx=8)
LM = CausalLMConfig(vocab_size=64, d_model=32, layers=4, heads=4, kv_heads=2,
                    ffn_dim=64, tie_embeddings=True, rope_theta=1e4)
TT = TwoTowerConfig(adapter_heads=4, top_k_unfrozen_layers=2,
                    max_target_tokens=32, adapter_lr=3e-3, lm_lr=1e-3)


@pytest.fixture(scope="module")
def model():
    audio_params = init_whisper_params(AUDIO, jax.random.key(0))
    lm_params = init_causal_lm(LM, jax.random.key(1))
    adapter = init_adapter(jax.random.key(2), AUDIO.d_model, LM.d_model,
                           heads=TT.adapter_heads)
    return TwoTowerModel(audio_params, AUDIO, {"adapter": adapter,
                                               "lm": lm_params}, LM, TT)


def _batch(rng, b=2, t_text=12):
    mel = rng.standard_normal((b, 2 * AUDIO.n_audio_ctx, AUDIO.n_mels)
                              ).astype(np.float32)
    ids = rng.integers(1, LM.vocab_size, (b, t_text)).astype(np.int32)
    mask = np.ones((b, t_text), np.int32)
    mask[-1, t_text - 3:] = 0
    return {"mel": jnp.asarray(mel), "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask)}


def test_forward_shapes_and_loss(model, rng):
    batch = _batch(rng)
    enc = model.encode_audio(batch["mel"])
    assert enc.shape == (2, AUDIO.n_audio_ctx, AUDIO.d_model)
    logits = model.forward(model.params, enc, batch["input_ids"],
                           batch["attention_mask"])
    assert logits.shape == (2, 12, LM.vocab_size)
    loss = model.loss(model.params, enc, batch["input_ids"],
                      batch["attention_mask"])
    assert np.isfinite(float(loss))


def test_adapter_is_position_independent(model, rng):
    """adapter(T tokens) == adapter applied token-by-token — the property
    the KV-cached generator relies on."""
    text = jnp.asarray(rng.standard_normal((1, 5, LM.d_model)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((1, 7, AUDIO.d_model)), jnp.float32)
    full = adapter_apply(model.params["adapter"], text, audio, TT.adapter_heads)
    stepwise = jnp.concatenate(
        [adapter_apply(model.params["adapter"], text[:, i: i + 1], audio,
                       TT.adapter_heads) for i in range(5)], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepwise),
                               atol=1e-5, rtol=1e-4)


def test_partial_unfreeze_training(model, rng):
    tx, mask = init_two_tower_optimizer(model)
    np.testing.assert_array_equal(np.asarray(mask), [0, 0, 1, 1])
    state = TwoTowerState(step=jnp.int32(0), params=model.params,
                          opt_state=tx.init(model.params), tx=tx,
                          layer_mask=mask)
    train_step, eval_step = make_two_tower_step(model)
    batch = _batch(rng)
    losses = []
    for _ in range(12):
        state, m = train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # frozen bottom layers exactly unchanged; top layers moved
    old = model.params["lm"]["layers"]["q"]["kernel"]
    new = state.params["lm"]["layers"]["q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(new[0]), np.asarray(old[0]))
    np.testing.assert_array_equal(np.asarray(new[1]), np.asarray(old[1]))
    assert not np.allclose(np.asarray(new[3]), np.asarray(old[3]))
    # adapter moved
    assert not np.allclose(
        np.asarray(state.params["adapter"]["q"]["kernel"]),
        np.asarray(model.params["adapter"]["q"]["kernel"]))
    # eval works
    em = eval_step(state, batch)
    assert np.isfinite(float(em["loss"]))


def test_grad_accum_matches_full_batch(model, rng):
    """accum_steps=2 must equal the full-batch update exactly (summed-CE +
    token-count accumulation, normalized once) including ragged masks.

    SGD makes the update linear in the gradient, so the comparison checks
    gradient equivalence directly — Adam's first-step g/sqrt(g^2)
    normalization would amplify float-association noise on near-zero
    gradient leaves into sign-level differences."""
    import optax
    _, mask = init_two_tower_optimizer(model)
    tx = optax.sgd(1e-2)
    batch = _batch(rng, b=4)
    outs = {}
    for k in (1, 2):
        state = TwoTowerState(step=jnp.int32(0), params=model.params,
                              opt_state=tx.init(model.params), tx=tx,
                              layer_mask=mask)
        step, _ = make_two_tower_step(model, accum_steps=k)
        state, m = step(state, batch)
        outs[k] = (float(m["loss"]), state.params)
    assert outs[2][0] == pytest.approx(outs[1][0], rel=1e-5)
    for a, b in zip(jax.tree.leaves(outs[1][1]), jax.tree.leaves(outs[2][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_param_counts(model):
    _, mask = init_two_tower_optimizer(model)
    counts = trainable_param_counts(model, mask)
    assert counts["whisper_frozen"] > 0
    assert counts["trainable_total"] < (counts["lm_total"]
                                        + counts["adapter"])
    assert counts["lm_trainable"] < counts["lm_total"]


def test_generate_kv_cached(model, rng):
    batch = _batch(rng)
    enc = model.encode_audio(batch["mel"])
    gen = jax.jit(lambda p, e: model.generate(
        p, e, start_id=1, end_id=2, max_len=20, temperature=0.7,
        rng=jax.random.key(3)))
    tokens, lengths = gen(model.params, enc)
    assert tokens.shape == (2, 20)
    assert (np.asarray(tokens[:, 0]) == 1).all()
    assert (np.asarray(lengths) <= 20).all()
    # greedy is deterministic
    g0 = model.generate(model.params, enc, start_id=1, end_id=2, max_len=16,
                        temperature=0.0)
    g1 = model.generate(model.params, enc, start_id=1, end_id=2, max_len=16,
                        temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g0[0]), np.asarray(g1[0]))


def test_trainable_checkpoint_roundtrip(model, tmp_path, rng):
    tx, mask = init_two_tower_optimizer(model)
    state = TwoTowerState(step=jnp.int32(0), params=model.params,
                          opt_state=tx.init(model.params), tx=tx,
                          layer_mask=mask)
    train_step, _ = make_two_tower_step(model)
    batch = _batch(rng)
    for _ in range(3):
        state, _ = train_step(state, batch)

    path = str(tmp_path / "tt_ckpt")
    save_trainable_checkpoint(path, state, model, extra={"epoch": 1})

    # fresh model + restore == trained params (trainable parts)
    fresh = TwoTowerModel(model.audio_params, AUDIO,
                          jax.tree.map(lambda x: x, model.params), LM, TT)
    restored = load_trainable_checkpoint(path, fresh)
    enc = restored.encode_audio(batch["mel"])
    want = model.loss(state.params, enc, batch["input_ids"],
                      batch["attention_mask"])
    got = restored.loss(restored.params, enc, batch["input_ids"],
                        batch["attention_mask"])
    assert float(want) == pytest.approx(float(got), rel=1e-6)
    # opt_state travels (Adam moments + plateau-scaled LRs live in it)
    _, saved = load_trainable_checkpoint(path, fresh, return_saved=True)
    assert "opt_state" in saved and int(saved["step"]) == 3


def test_trainable_checkpoint_topk_exceeds_layers(model, tmp_path, rng):
    """Regression (review finding): top_k_unfrozen_layers > n_layers means
    'everything trainable'; the unclamped n-k slice spliced fresh random
    layers under the trained ones on load. Round-trip must preserve ALL
    layers exactly."""
    from dataclasses import replace

    big = model._replace(cfg=replace(TT, top_k_unfrozen_layers=LM.layers + 2))
    tx, mask = init_two_tower_optimizer(big)
    np.testing.assert_array_equal(np.asarray(mask), [1, 1, 1, 1])
    state = TwoTowerState(step=jnp.int32(0), params=big.params,
                          opt_state=tx.init(big.params), tx=tx,
                          layer_mask=mask)
    train_step, _ = make_two_tower_step(big)
    batch = _batch(rng)
    for _ in range(2):
        state, _ = train_step(state, batch)
    path = str(tmp_path / "tt_full")
    save_trainable_checkpoint(path, state, big)
    # fresh random params: every restored layer must equal the trained ones
    fresh = TwoTowerModel(
        big.audio_params, AUDIO,
        {"adapter": big.params["adapter"],
         "lm": jax.tree.map(lambda x: x * 0.0, big.params["lm"])},
        LM, big.cfg)
    restored = load_trainable_checkpoint(path, fresh)
    for a, b in zip(jax.tree.leaves(restored.params["lm"]["layers"]),
                    jax.tree.leaves(state.params["lm"]["layers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_layer_unfreeze_mask_edges():
    np.testing.assert_array_equal(np.asarray(layer_unfreeze_mask(4, 0)),
                                  [0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(layer_unfreeze_mask(4, 9)),
                                  [1, 1, 1, 1])


def test_fit_two_tower_with_note_f1_eval(tmp_path, rng):
    """End-to-end loop over a real (tiny) MusicDataset with the note-level
    generation eval wired in: every epoch record carries note P/R/F1 and the
    ABC-parseable rate (the metric whose absence hid the reference's
    'A5 A5 A5 A5' collapse)."""
    import os

    from audax.core.config import DataGenConfig
    from audax.data.music_dataset import (ABC_SPECIALS, MusicDataset,
                                          stage_genparquet, stage_midi2abc,
                                          stage_midi2wav)
    from audax.frontend import LogMelFrontend
    from audax.models.two_tower import build_two_tower
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.midi import MidiFile, Note, Tempo
    from audax.train.two_tower_loop import fit_two_tower

    midi_dir = tmp_path / "m"
    os.makedirs(midi_dir)
    for i in range(4):
        mf = MidiFile()
        mf.tempos.append(Tempo(0, 500000))
        for j in range(3):
            mf.notes.append(Note(j * 480, 480, 60 + i + 2 * j, 100))
        mf.save(str(midi_dir / f"x{i}.mid"))
    wav_dir, abc_dir = str(tmp_path / "w"), str(tmp_path / "a")
    stage_midi2wav(str(midi_dir), wav_dir, DataGenConfig(chunk_duration_s=2),
                   workers=1)
    stage_midi2abc(wav_dir, abc_dir, workers=1)
    parquet = stage_genparquet(wav_dir, abc_dir, str(tmp_path / "d.parquet"))

    abcs = [open(os.path.join(abc_dir, f)).read()
            for f in os.listdir(abc_dir) if f.endswith(".abc")]
    bpe = train_bpe(abcs, vocab_size=320, special_tokens=list(ABC_SPECIALS))
    ds = MusicDataset(parquet, bpe, max_tokens=48)
    assert len(ds) == 4

    tt = TwoTowerConfig(adapter_heads=2, top_k_unfrozen_layers=1,
                        max_target_tokens=48, adapter_lr=3e-3, lm_lr=1e-3,
                        epochs=1, batch_size=2)
    audio = WhisperConfig(n_mels=8, n_audio_ctx=100, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    lm = CausalLMConfig(vocab_size=len(bpe), d_model=32, layers=2, heads=4,
                        kv_heads=2, ffn_dim=64, tie_embeddings=True,
                        rope_theta=1e4)
    model = build_two_tower(tt, audio, lm, len(bpe), jax.random.key(0))
    frontend = LogMelFrontend.whisper(8, backend="xla")
    state, history = fit_two_tower(
        model, ds, chunk_seconds=2.0, val_fraction=0.5, frontend=frontend,
        note_eval_every=1, note_eval_samples=2)
    assert history["train_loss"] and history["val_loss"]
    assert "note_f1" in history and len(history["note_f1"]) == 1
    f1 = history["note_f1"][0]
    assert f1 is not None and 0.0 <= f1 <= 1.0


def test_fit_two_tower_resume(tmp_path, rng):
    """Mid-run resume (reference had save/load but never wired resume):
    2 epochs + checkpoints, then a resumed fit to 4 — only the remaining
    2 epochs run, the step counter continues, and the optimizer state
    restores with its optax structure intact."""
    import os

    from audax.core.config import DataGenConfig
    from audax.data.music_dataset import (ABC_SPECIALS, MusicDataset,
                                          stage_genparquet, stage_midi2abc,
                                          stage_midi2wav)
    from audax.frontend import LogMelFrontend
    from audax.models.two_tower import build_two_tower
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.midi import MidiFile, Note, Tempo
    from audax.train.two_tower_loop import fit_two_tower

    midi_dir = tmp_path / "m"
    os.makedirs(midi_dir)
    for i in range(4):
        mf = MidiFile()
        mf.tempos.append(Tempo(0, 500000))
        for j in range(2):
            mf.notes.append(Note(j * 480, 480, 60 + i + j, 100))
        mf.save(str(midi_dir / f"x{i}.mid"))
    wav_dir, abc_dir = str(tmp_path / "w"), str(tmp_path / "a")
    stage_midi2wav(str(midi_dir), wav_dir, DataGenConfig(chunk_duration_s=2),
                   workers=1)
    stage_midi2abc(wav_dir, abc_dir, workers=1)
    parquet = stage_genparquet(wav_dir, abc_dir, str(tmp_path / "d.parquet"))
    abcs = [open(os.path.join(abc_dir, f)).read()
            for f in os.listdir(abc_dir) if f.endswith(".abc")]
    bpe = train_bpe(abcs, vocab_size=320, special_tokens=list(ABC_SPECIALS))
    ds = MusicDataset(parquet, bpe, max_tokens=32)

    audio = WhisperConfig(n_mels=8, n_audio_ctx=100, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    lm = CausalLMConfig(vocab_size=len(bpe), d_model=32, layers=2, heads=4,
                        kv_heads=2, ffn_dim=64, tie_embeddings=True,
                        rope_theta=1e4)
    frontend = LogMelFrontend.whisper(8, backend="xla")
    ckpt = str(tmp_path / "ck")

    def fit(epochs, resume):
        tt = TwoTowerConfig(adapter_heads=2, top_k_unfrozen_layers=1,
                            max_target_tokens=32, adapter_lr=3e-3,
                            lm_lr=1e-3, epochs=epochs, batch_size=2)
        model = build_two_tower(tt, audio, lm, len(bpe), jax.random.key(0))
        return fit_two_tower(model, ds, chunk_seconds=2.0, val_fraction=0.5,
                             frontend=frontend, ckpt_dir=ckpt, resume=resume)

    state1, hist1 = fit(2, resume=False)
    assert len(hist1["train_loss"]) == 2
    steps_after_2 = int(state1.step)
    assert steps_after_2 > 0

    state2, hist2 = fit(4, resume=True)
    assert len(hist2["train_loss"]) == 2          # only epochs 2,3 ran
    assert int(state2.step) == 2 * steps_after_2  # counter continued
    # resumed params start from the checkpoint, not fresh init: first
    # resumed loss continues below the fresh-init first loss
    assert hist2["train_loss"][0] < hist1["train_loss"][0]


def test_music_transcription_proof_learns(tmp_path):
    """End-to-end learning proof (the working-model evidence the reference's
    music2midi never produced — its MIDI fine-tune collapsed to constant
    output, AB/midiDatasetResults.csv:2-5): synthetic corpus through the
    4-stage pipeline, random-init two-tower, train to memorization, and
    note-level F1 must rise from ~0 to a clearly non-degenerate value.
    Compact budget for CI; the committed results/ artifact uses the full
    `audax music-proof` defaults."""
    from audax.train.two_tower_loop import music_transcription_proof

    out = music_transcription_proof(str(tmp_path), num_items=8,
                                    notes_per_item=2, epochs=400,
                                    chunk_seconds=2.0, holdout_items=2,
                                    pretrain_encoder_steps=0,
                                    eval_items=5)
    assert out["after"].get("abc_valid_rate", 0.0) >= 0.5, out
    assert (out["after"].get("note_f1", 0.0)
            >= out["before"].get("note_f1", 0.0) + 0.5), out
    # holdout split scored separately (generalization column; strong
    # holdout numbers need the full-budget committed artifact)
    assert "note_f1" in out["holdout_after"], out
    # eval_items=5 subsamples the train-set F1 pass (corpus-scale proofs
    # would otherwise spend more chip time generating than training);
    # the holdout eval stays complete
    assert out["eval_items"] == 5, out
    import csv
    rows = list(csv.DictReader(open(out["csv"])))
    assert len(rows) == 7                      # 5 sampled train + 2 holdout
    assert all(set(r) == {"file", "target_abc", "previous", "trained",
                          "split"} for r in rows)
    assert sum(r["split"] == "holdout" for r in rows) == 2


def test_generate_constrained_and_prompted(model, rng):
    """Constrained decoding (the reference's abandoned 'mask out non-ABC
    tokens' variant, model.py:346-417) emits ONLY allowed ids; a prompt
    header is teacher-forced after <abc_start> and never terminates
    generation even if it contains the end id's neighbours."""
    batch = _batch(rng)
    enc = model.encode_audio(batch["mel"])
    allowed = [5, 9, 12, 33]
    tokens, lengths = model.generate(
        model.params, enc, start_id=1, end_id=2, max_len=24,
        temperature=0.7, rng=jax.random.key(4), allowed_ids=allowed)
    ok = set(allowed) | {2}
    t = np.asarray(tokens)
    for b in range(t.shape[0]):
        gen = t[b, 1: int(np.asarray(lengths)[b])]
        assert set(gen.tolist()) <= ok, gen
    # prompt forcing: exact prefix, generation continues past it
    prompt = [7, 8, 9, 10]
    tokens_p, lengths_p = model.generate(
        model.params, enc, start_id=1, end_id=2, max_len=24,
        temperature=0.7, rng=jax.random.key(4), prompt_ids=prompt)
    tp = np.asarray(tokens_p)
    np.testing.assert_array_equal(tp[:, 1:5],
                                  np.tile(prompt, (tp.shape[0], 1)))
    assert (np.asarray(lengths_p) > 5).all()
    # both together: prompt tokens may lie OUTSIDE the allowed set (forced
    # positions bypass the mask); free positions respect it
    tokens_b, lengths_b = model.generate(
        model.params, enc, start_id=1, end_id=2, max_len=24,
        temperature=0.7, rng=jax.random.key(4), allowed_ids=allowed,
        prompt_ids=prompt)
    tb = np.asarray(tokens_b)
    np.testing.assert_array_equal(tb[:, 1:5],
                                  np.tile(prompt, (tb.shape[0], 1)))
    for b in range(tb.shape[0]):
        free = tb[b, 5: int(np.asarray(lengths_b)[b])]
        assert set(free.tolist()) <= ok, free


def test_random_melody_polyphony():
    """max_poly>1 emits chord events (same tick, multiple pitches) that
    round-trip through midi_to_abc's [CEG] grouping; max_poly=1 keeps the
    historical per-seed stream exactly (no extra rng draws)."""
    from audax.data.synth import _random_melody
    from audax.symbolic.abc import midi_to_abc
    from audax.symbolic.abc_parse import abc_to_midi

    a, _ = _random_melody(np.random.default_rng(5), 6, velocity=100)
    b, _ = _random_melody(np.random.default_rng(5), 6, velocity=100,
                          max_poly=1)
    assert [(n.start_tick, n.pitch) for n in a.notes] \
        == [(n.start_tick, n.pitch) for n in b.notes]

    found_chord = False
    for seed in range(8):
        mf, names = _random_melody(np.random.default_rng(seed), 6,
                                   velocity=100, low=48, high=84,
                                   max_poly=3)
        by_tick = {}
        for n in mf.notes:
            by_tick.setdefault(n.start_tick, []).append(n.pitch)
        if any(len(v) > 1 for v in by_tick.values()):
            found_chord = True
            abc = midi_to_abc(mf)
            assert "[" in abc                 # chord syntax emitted
            back = abc_to_midi(abc)           # and parses back
            assert len(back.notes) == len(mf.notes)
            assert any("+" in nm for nm in names)
            break
    assert found_chord


def test_music_proof_polyphony_and_pretrained_lm(tmp_path):
    """The VERDICT-r3 arms in one compact run: polyphonic corpus
    (chords through the whole learned loop) + decoder pretrained on a
    disjoint synthetic ABC corpus before the two-tower fit (the
    reference's pretrained-Qwen design)."""
    from audax.train.two_tower_loop import music_transcription_proof

    out = music_transcription_proof(
        str(tmp_path), num_items=6, notes_per_item=2, notes_max=3,
        max_poly=2, epochs=400, chunk_seconds=2.0, holdout_items=2,
        pretrain_encoder_steps=0, pretrain_lm_steps=60,
        pretrain_lm_items=24)
    metrics = json.load(open(out["metrics"]))
    assert metrics["lm_pretrained"] and metrics["max_poly"] == 2
    # training moved the needle on the train split (tiny budget: any
    # clear rise; the committed artifact uses the full CLI budget)
    assert (out["after"].get("note_f1", 0.0)
            > out["before"].get("note_f1", 0.0)), out
    # the corpus really is polyphonic: some target ABC carries a chord
    rows = list(csv.DictReader(open(out["csv"])))
    assert any("[" in r["target_abc"] for r in rows), rows
