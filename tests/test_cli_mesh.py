"""Parallelism on the PRODUCT surfaces (VERDICT r2 weak #3): the CLI's
--dp/--tp/--fsdp flags drive the same sharded loops the dryrun proves —
`finetune` at DP x TP reproduces the single-device losses, `serve --tp`
is token-equal over a live socket, and fit_lm TP matches replicated.

The reference is strictly single-process/single-device (SURVEY.md §2.3).
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.data.audio_io import write_wav


def _micro_tiny():
    # stands in for the whisper-tiny preset: the mesh logic under test is
    # dimension-independent, and full-tiny compiles take minutes on the
    # CPU test mesh
    return WhisperConfig(n_mels=80, n_audio_ctx=100, d_model=32,
                         encoder_layers=1, decoder_layers=1, heads=2,
                         vocab_size=300, n_text_ctx=32)


def _make_wavs(d, rng, n=8, seconds=2.0):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        write_wav(str(d / f"c{i}.wav"),
                  0.05 * rng.standard_normal(int(seconds * 16000))
                  .astype(np.float32), 16000)


def _losses(run_dir):
    rows = []
    with open(run_dir / "artifacts/runs/whisper_ft.metrics.jsonl") as fh:
        for line in fh:
            r = json.loads(line)
            if "loss" in r:
                rows.append(r["loss"])
    return rows


def test_finetune_cli_dp_tp_matches_single_device(tmp_path, rng, monkeypatch):
    """`finetune --dp 4 --tp 2 --chunk-seconds 2` — the full CLI path
    (argparse -> mesh build -> sharded finetune_whisper) — reproduces the
    single-device loss trajectory (grad all-reduce + Megatron TP change
    nothing but the schedule)."""
    from audax.cli.main import _COMMANDS

    monkeypatch.setattr(WhisperConfig, "tiny",
                        classmethod(lambda cls: _micro_tiny()))
    wavs = tmp_path / "wavs"
    _make_wavs(wavs, rng)
    base = ["--audio-dir", str(wavs), "--transcript", "hello world",
            "--steps", "3", "--batch-size", "4", "--chunk-seconds", "2",
            "--lora-rank", "0"]

    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    monkeypatch.chdir(plain_dir)
    assert _COMMANDS["finetune"](
        base + ["--out", str(tmp_path / "out_plain")]) == 0

    mesh_dir = tmp_path / "mesh"
    mesh_dir.mkdir()
    monkeypatch.chdir(mesh_dir)
    assert _COMMANDS["finetune"](
        base + ["--out", str(tmp_path / "out_mesh"),
                "--dp", "4", "--tp", "2"]) == 0

    lp, lm = _losses(plain_dir), _losses(mesh_dir)
    assert len(lp) == len(lm) == 3
    np.testing.assert_allclose(lm, lp, rtol=1e-3, atol=1e-5)

    # the saved (unsharded) checkpoints are interchangeable artifacts
    from audax.train.checkpoints import load_pytree
    a = load_pytree(str(tmp_path / "out_plain"))
    b = load_pytree(str(tmp_path / "out_mesh"))
    diffs = jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()), a, b)
    assert max(jax.tree.leaves(diffs)) < 5e-3


def test_finetune_cli_fsdp_lora(tmp_path, rng, monkeypatch):
    """`finetune --dp 8 --fsdp` with LoRA adapters runs and trains
    (ZeRO-3 layout on the product surface)."""
    from audax.cli.main import _COMMANDS

    monkeypatch.setattr(WhisperConfig, "tiny",
                        classmethod(lambda cls: _micro_tiny()))
    wavs = tmp_path / "wavs"
    _make_wavs(wavs, rng)
    run = tmp_path / "run"
    run.mkdir()
    monkeypatch.chdir(run)
    assert _COMMANDS["finetune"](
        ["--audio-dir", str(wavs), "--transcript", "hello world",
         "--steps", "2", "--batch-size", "4", "--chunk-seconds", "2",
         "--lora-rank", "2", "--dp", "8", "--fsdp",
         "--out", str(tmp_path / "out")]) == 0
    losses = _losses(run)
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_serve_tp_token_equal(rng, tmp_path):
    """The `serve --tp 2` construction (shard_params + mesh into the
    continuous engine, exactly as cmd_serve builds it) answers HTTP
    requests with byte-identical text to the replicated server."""
    from audax.cli.http_server import serve_http
    from audax.core.config import MeshConfig
    from audax.infer.continuous import ContinuousBatcher
    from audax.models.whisper import init_whisper_params
    from audax.parallel.mesh import make_mesh
    from audax.parallel.sharding import shard_params
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    wav = tmp_path / "clip.wav"
    write_wav(str(wav), 0.01 * rng.standard_normal(16000).astype(np.float32),
              16000)
    body = wav.read_bytes()

    def ask(cb):
        srv = serve_http(cb, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_address[1]}"
                "/v1/audio/transcriptions?max_tokens=5",
                data=body, method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.load(r)["text"]
        finally:
            srv.scheduler.shutdown()
            srv.shutdown()

    rep = ask(ContinuousBatcher(params, cfg, tok, slots=2,
                                window_seconds=1.0, max_new_tokens=5,
                                steps_per_sync=4))
    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:4])
    tp = ask(ContinuousBatcher(shard_params(params, mesh), cfg, tok,
                               slots=2, window_seconds=1.0, max_new_tokens=5,
                               steps_per_sync=4, mesh=mesh))
    assert tp == rep


@pytest.mark.parametrize("fsdp", [False, True])
def test_fit_lm_tp_matches_replicated(fsdp):
    """fit_lm over a (data=2, model=2) mesh (the train-lm --dp/--tp/--fsdp
    path) reproduces the single-device losses."""
    from audax.core.config import MeshConfig
    from audax.models.causal_lm import CausalLMConfig, init_causal_lm
    from audax.parallel.mesh import make_mesh
    from audax.train.lm import LMTrainConfig, fit_lm

    cfg = CausalLMConfig(vocab_size=96, d_model=32, layers=2, heads=4,
                         kv_heads=2, ffn_dim=64)
    tc = LMTrainConfig(max_steps=3, batch_size=4, seq_len=16,
                       eval_every=1, eval_windows=2, warmup_steps=0)
    corpus = np.arange(4000, dtype=np.int32) % 96
    params = init_causal_lm(cfg, jax.random.key(0))
    _, h_ref = fit_lm(params, cfg, tc, corpus)
    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:4])
    _, h_tp = fit_lm(params, cfg, tc, corpus, mesh=mesh, fsdp=fsdp)
    for a, b in zip(h_ref, h_tp):
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=1e-3)
        np.testing.assert_allclose(b["eval_loss"], a["eval_loss"], rtol=1e-3)


@pytest.mark.parametrize("fsdp", [False, True])
def test_fit_two_tower_mesh_matches_single_device(tmp_path, fsdp):
    """fit_two_tower over a (data=2, model=2) mesh (the train-music
    --dp/--tp/--fsdp path): decoder + frozen encoder TP-sharded, batches
    over 'data' — same loss trajectory as the single-device loop."""
    import os

    from audax.core.config import DataGenConfig, MeshConfig, TwoTowerConfig
    from audax.models.causal_lm import CausalLMConfig
    from audax.data.music_dataset import (ABC_SPECIALS, MusicDataset,
                                          stage_genparquet, stage_midi2abc,
                                          stage_midi2wav)
    from audax.frontend import LogMelFrontend
    from audax.models.two_tower import build_two_tower
    from audax.parallel.mesh import make_mesh
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

    tt = TwoTowerConfig(adapter_heads=2, top_k_unfrozen_layers=1,
                        max_target_tokens=48, adapter_lr=3e-3, lm_lr=1e-3,
                        epochs=2, batch_size=2)
    audio = WhisperConfig(n_mels=8, n_audio_ctx=100, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    lm = CausalLMConfig(vocab_size=len(bpe), d_model=32, layers=2, heads=4,
                        kv_heads=2, ffn_dim=64, tie_embeddings=True,
                        rope_theta=1e4)
    frontend = LogMelFrontend.whisper(8, backend="xla")

    def run(mesh, use_fsdp):
        model = build_two_tower(tt, audio, lm, len(bpe), jax.random.key(0))
        _, h = fit_two_tower(model, ds, chunk_seconds=2.0, val_fraction=0.5,
                             frontend=frontend, mesh=mesh, fsdp=use_fsdp)
        return h

    h_ref = run(None, False)
    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:4])
    h_mesh = run(mesh, fsdp)
    np.testing.assert_allclose(h_mesh["train_loss"], h_ref["train_loss"],
                               rtol=1e-3)
    np.testing.assert_allclose(h_mesh["val_loss"], h_ref["val_loss"],
                               rtol=1e-3)


def test_transcriber_tp_token_equal(rng):
    """Transcriber(mesh=...) — the `transcribe --tp` path: weights
    Megatron-sharded, decode KV constrained over heads — produces
    byte-identical text to the replicated transcriber, greedy AND beam."""
    from audax.core.config import MeshConfig
    from audax.infer.transcribe import Transcriber
    from audax.models.whisper import init_whisper_params
    from audax.parallel.mesh import make_mesh
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    audio = (0.05 * rng.standard_normal(32000)).astype(np.float32)
    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:4])

    for kw in ({}, {"beam_width": 2}):
        rep = Transcriber(params, cfg, tok, max_new_tokens=6,
                          temperature_fallback=False, backend="xla", **kw)
        tp = Transcriber(params, cfg, tok, max_new_tokens=6,
                         temperature_fallback=False, backend="xla",
                         mesh=mesh, **kw)
        assert tp.transcribe(audio).text == rep.transcribe(audio).text


def test_finetune_chunk_seconds_ckpt_roundtrips(tmp_path, rng, monkeypatch):
    """A `finetune --chunk-seconds` checkpoint carries its true dims in a
    .config.json sidecar, and `transcribe --ckpt` reads it — the sliced
    encoder context must not be rebuilt from the size preset (shape
    mismatch otherwise)."""
    from audax.cli.main import _COMMANDS

    monkeypatch.setattr(WhisperConfig, "tiny",
                        classmethod(lambda cls: _micro_tiny()))
    wavs = tmp_path / "wavs"
    _make_wavs(wavs, rng, n=4)
    run = tmp_path / "run"
    run.mkdir()
    monkeypatch.chdir(run)
    out = str(tmp_path / "out")
    assert _COMMANDS["finetune"](
        ["--audio-dir", str(wavs), "--transcript", "hello world",
         "--steps", "2", "--batch-size", "4", "--chunk-seconds", "2",
         "--lora-rank", "0", "--out", out]) == 0
    import os
    assert os.path.exists(out + ".config.json")
    csv_path = str(tmp_path / "t.csv")
    assert _COMMANDS["transcribe"](
        [str(wavs / "c0.wav"), "--size", "tiny", "--ckpt", out,
         "--csv", csv_path]) == 0
    assert os.path.exists(csv_path)


def test_transcriber_tp_quantized(rng):
    """`transcribe --tp --quantize int8`: quantized trees shard by the
    same rule tables (int4/int8 leaves keep their replication rules) and
    the TP transcriber stays token-equal to the replicated quantized one."""
    from audax.core.config import MeshConfig
    from audax.infer.transcribe import Transcriber
    from audax.models.whisper import init_whisper_params
    from audax.parallel.mesh import make_mesh
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    audio = (0.05 * rng.standard_normal(32000)).astype(np.float32)
    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:4])

    rep = Transcriber(params, cfg, tok, max_new_tokens=6, quantize="int8",
                      temperature_fallback=False, backend="xla")
    tp = Transcriber(params, cfg, tok, max_new_tokens=6, quantize="int8",
                     temperature_fallback=False, backend="xla", mesh=mesh)
    assert tp.transcribe(audio).text == rep.transcribe(audio).text


def test_finetune_cli_sp_matches_single_device(tmp_path, rng, monkeypatch):
    """`finetune --dp 2 --sp 2 --accum-steps 2` — the full CLI path into
    the DP x SP ring-attention step WITH gradient accumulation (microbatch
    scan outside the shard_map) — reproduces the single-device loss
    trajectory (accumulation is the exact full-batch update, the ring is
    exact attention)."""
    from audax.cli.main import _COMMANDS

    monkeypatch.setattr(WhisperConfig, "tiny",
                        classmethod(lambda cls: _micro_tiny()))
    wavs = tmp_path / "wavs"
    _make_wavs(wavs, rng)
    base = ["--audio-dir", str(wavs), "--transcript", "hello world",
            "--steps", "3", "--batch-size", "4", "--chunk-seconds", "2",
            "--lora-rank", "0"]

    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    monkeypatch.chdir(plain_dir)
    assert _COMMANDS["finetune"](
        base + ["--out", str(tmp_path / "out_plain")]) == 0

    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    monkeypatch.chdir(sp_dir)
    assert _COMMANDS["finetune"](
        base + ["--out", str(tmp_path / "out_sp"),
                "--dp", "2", "--sp", "2", "--accum-steps", "2"]) == 0

    lp, ls = _losses(plain_dir), _losses(sp_dir)
    assert len(lp) == len(ls) == 3
    np.testing.assert_allclose(ls, lp, rtol=1e-3, atol=1e-5)


def test_finetune_cli_sp_device_count_validated_early():
    """An infeasible --dp x --sp combo errors at argparse time (before
    checkpoint load / dataset build), like the exclusivity check."""
    from audax.cli.main import _COMMANDS

    with pytest.raises(SystemExit):
        _COMMANDS["finetune"](["--audio-dir", "/nonexistent",
                               "--dp", "8", "--sp", "8"])


def test_finetune_cli_sp_flag_validation():
    """`finetune --sp` composes with --dp only: conflicting --tp/--fsdp
    combinations are rejected at argparse time (before any dataset or
    checkpoint loading)."""
    from audax.cli.main import _COMMANDS

    for bad in (["--sp", "2", "--tp", "2"], ["--sp", "2", "--fsdp"]):
        with pytest.raises(SystemExit):
            _COMMANDS["finetune"](["--audio-dir", "/nonexistent"] + bad)
