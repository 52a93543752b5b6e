"""Auxiliary subsystems: quality reports, model reports, profiling timer,
fine-tune loop with WER eval, demo server endpoints, resume."""

import json
import os
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import (ClassifierTrainConfig, FineTuneConfig,
                               MelConfig, UrbanSoundConfig, WhisperConfig)


def test_urbansound_quality_report(tmp_path, rng):
    from audax.data.audio_io import write_wav
    from audax.data.quality import format_report, urbansound_quality_report
    from audax.data.urbansound import preprocess_to_parquet
    import pandas as pd
    root = tmp_path / "US"
    rows = []
    for fold in (1, 2):
        d = root / "audio" / f"fold{fold}"
        os.makedirs(d)
        for i in range(3):
            name = f"f{fold}_{i}.wav"
            write_wav(str(d / name),
                      (0.2 * rng.standard_normal(8000)).astype(np.float32), 16000)
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": i % 2, "class": f"c{i % 2}"})
    os.makedirs(root / "metadata")
    pd.DataFrame(rows).to_csv(root / "metadata" / "UrbanSound8K.csv",
                              index=False)
    cfg = UrbanSoundConfig(dataset_root=str(root),
                           parquet_dir=str(tmp_path / "a"))
    path = preprocess_to_parquet(cfg, MelConfig(n_fft=256, hop_length=256,
                                                n_mels=8))
    report = urbansound_quality_report(path)
    assert report["rows"] == 6 and report["failed_rows"] == 0
    assert report["duplicate_files"] == 0
    assert report["all_shapes_equal"]
    assert report["folds"] == {1: 3, 2: 3}
    assert "quality" in format_report(report)


def test_music_quality_report(tmp_path, rng):
    from audax.core.config import DataGenConfig
    from audax.data.music_dataset import (stage_genparquet, stage_midi2abc,
                                          stage_midi2wav)
    from audax.data.quality import music_quality_report
    from audax.symbolic.midi import MidiFile, Note, Tempo
    midi_dir = tmp_path / "m"
    os.makedirs(midi_dir)
    for i in range(2):
        mf = MidiFile()
        mf.tempos.append(Tempo(0, 500000))
        for j in range(4):
            mf.notes.append(Note(j * 480, 480, 60 + i + j, 100))
        mf.save(str(midi_dir / f"x{i}.mid"))
    wav_dir, abc_dir = str(tmp_path / "w"), str(tmp_path / "a")
    stage_midi2wav(str(midi_dir), wav_dir, DataGenConfig(chunk_duration_s=3),
                   workers=1)
    stage_midi2abc(wav_dir, abc_dir, workers=1)
    parquet = stage_genparquet(wav_dir, abc_dir, str(tmp_path / "m.parquet"))
    report = music_quality_report(parquet)
    assert report["rows"] == 2 and report["failed_rows"] == 0
    assert report["duration_s"]["n"] == 2
    assert report["missing_tempo"] == 0


def test_model_report():
    from audax.models.whisper import init_whisper_params
    from audax.utils.reports import model_report, param_count
    cfg = WhisperConfig(n_mels=8, n_audio_ctx=8, d_model=16, encoder_layers=1,
                        decoder_layers=1, heads=2, vocab_size=30, n_text_ctx=8)
    params = init_whisper_params(cfg, jax.random.key(0))
    text = model_report({"whisper": params}, trainable={"whisper": True},
                        kv_cache={"layers": 1, "batch": 1, "kv_heads": 2,
                                  "max_len": 8, "head_dim": 8})
    assert "MODEL ANALYSIS" in text and "trainable" in text
    assert f"{param_count(params):,}" in text


def test_time_fn_sync():
    from audax.utils.profiling import time_fn
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    t = time_fn(f, x, iters=5)
    assert t["seconds_per_call"] > 0
    assert t["calls_per_second"] > 0


def test_slope_timed_chained():
    """Chained slope timing (x <- f(x) carry): the trustworthy form for
    bare matmuls — the element-[0] accumulator variant lets XLA dead-code
    narrow `a @ w` to a single dot (observed 10 PFLOP/s). On CPU we can
    only pin the contract: positive finite per-op latency, and extra
    (weight) args pass through untouched."""
    from audax.utils.profiling import slope_timed_chained
    w = jnp.eye(16) * 0.5
    sec = slope_timed_chained(lambda x, w: x @ w, jnp.ones((16, 16)), (w,),
                              iters=(4, 24), repeats=2)
    assert np.isfinite(sec)


def test_finetune_loop_with_wer(tmp_path, rng):
    """End-to-end fine-tune driver: dataset build from sidecars, steps, WER
    eval path, best-params plumbing."""
    from audax.data.audio_io import write_wav
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer
    from audax.train.finetune_loop import (build_speech_dataset, eval_wer,
                                           finetune_whisper)
    audio_dir = str(tmp_path / "audio")
    os.makedirs(audio_dir)
    for i in range(2):
        write_wav(os.path.join(audio_dir, f"m{i}.wav"),
                  (0.1 * rng.standard_normal(8000)).astype(np.float32), 16000)
        with open(os.path.join(audio_dir, f"m{i}.txt"), "w") as fh:
            fh.write("hello world")
    tok = WhisperTokenizer(train_bpe(["hello world"] * 4, vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    mel_cfg = MelConfig.whisper(80)
    examples = build_speech_dataset(audio_dir, tok, mel_cfg,
                                    chunk_seconds=30.0)
    assert len(examples) == 2
    assert examples[0]["labels"][0] == tok.sot
    assert examples[0]["labels"][-1] == tok.eot

    params = init_whisper_params(cfg, jax.random.key(0))
    ft = FineTuneConfig(learning_rate=1e-3, warmup_steps=1, max_steps=4,
                        eval_every=2, batch_size=2, lora_rank=0)
    state, hist = finetune_whisper(params, cfg, tok, examples, ft,
                                   mel_cfg=mel_cfg, eval_examples=examples)
    assert len(hist["loss"]) == 4
    assert len(hist["wer"]) == 2           # evaluated at steps 2 and 4
    assert hist["best_params"] is not None

    # chunked loss fetching (loss_fetch_every) must not drop or reorder
    # records: 5 steps with chunk 3 -> flushes at steps 2 and 4 (tail),
    # one sink record per step in step order
    from audax.train.metrics_sink import MetricsSink
    sink = MetricsSink("ft_chunk_test", out_dir=str(tmp_path / "runs"),
                       use_wandb=False)
    ft2 = FineTuneConfig(learning_rate=1e-3, warmup_steps=1, max_steps=5,
                         eval_every=100, batch_size=2, lora_rank=0,
                         loss_fetch_every=3)
    _, hist2 = finetune_whisper(params, cfg, tok, examples, ft2,
                                mel_cfg=mel_cfg, sink=sink)
    sink.close()
    assert len(hist2["loss"]) == 5
    recs = [json.loads(l) for l in open(sink.path)]
    steps = [r["step"] for r in recs if "loss" in r]
    assert steps == [0, 1, 2, 3, 4]


def test_demo_server_endpoints(tmp_path, rng):
    from audax.cli.demo_ui import serve
    from audax.data.audio_io import write_wav

    class FakeResult:
        text = "fake transcription"
        rtf = 0.01

    class FakeTranscriber:
        def transcribe(self, audio):
            assert len(audio) > 0
            return FakeResult()

    server = serve(FakeTranscriber(), port=0,
                   dataset_dir=str(tmp_path / "ds"))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "audax" in page and "Record" in page

        wav_path = str(tmp_path / "u.wav")
        write_wav(wav_path, (0.1 * rng.standard_normal(4000)).astype(np.float32),
                  16000)
        body = open(wav_path, "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe?model=original", data=body)
        out = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert out["text"] == "fake transcription"

        req = urllib.request.Request(f"http://127.0.0.1:{port}/add", data=body)
        out = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert os.path.exists(os.path.join(str(tmp_path / "ds"), out["file"]))

        req = urllib.request.Request(f"http://127.0.0.1:{port}/add",
                                     data=b"not audio at all")
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_best_tracking_keeps_latest(tmp_path, rng):
    """Regression (review finding, empirically confirmed): an orbax best_fn
    made retention keep the best-N steps and DELETE the latest — a run
    whose metric worsened lost its final checkpoints, breaking resume and
    the 'test from the final checkpoint' protocol. Best is now tracked
    side-band; retention keeps the latest steps."""
    from audax.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                            best_metric="val_loss")
    for step, v in enumerate([1.0, 0.5, 0.9, 1.2, 1.5]):
        mgr.save(step, {"w": np.full(4, float(step), np.float32)},
                 metrics={"val_loss": v})
    mgr.wait()
    assert mgr.latest_step() == 4          # newest survives retention
    assert mgr.best_step() == 1            # best tracked independently
    latest = mgr.restore({"w": np.zeros(4, np.float32)})
    assert float(latest["w"][0]) == 4.0
    best = mgr.restore_best({"w": np.zeros(4, np.float32)})
    assert float(best["w"][0]) == 1.0
    mgr.close()


def test_async_save_then_kill_restores(tmp_path, rng):
    """Async epoch saves must survive an abrupt end of the writing process:
    after save()+wait() the manager object is dropped WITHOUT close() (the
    'kill'), and a fresh manager in a new scope restores the exact state."""
    from audax.train.checkpoints import CheckpointManager

    tree = {"w": rng.standard_normal((64, 64)).astype(np.float32),
            "step": np.asarray(7, np.int32)}
    mgr = CheckpointManager(str(tmp_path / "ck"), best_metric="val_loss")
    mgr.save(3, tree, metrics={"val_loss": 0.5})   # async: returns early
    mgr.wait()                                     # write finalized
    del mgr                                        # no close(): simulated kill

    fresh = CheckpointManager(str(tmp_path / "ck"), best_metric="val_loss")
    assert fresh.latest_step() == 3
    restored = fresh.restore({"w": np.zeros((64, 64), np.float32),
                              "step": np.asarray(0, np.int32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
    assert int(restored["step"]) == 7
    fresh.close()


def test_save_pytree_async_handle(tmp_path, rng):
    from audax.train.checkpoints import load_pytree, save_pytree

    tree = {"a": rng.standard_normal((32, 32)).astype(np.float32)}
    handle = save_pytree(str(tmp_path / "p"), tree, block=False)
    assert handle is not None
    handle.wait_until_finished()
    back = load_pytree(str(tmp_path / "p"))
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])


def test_classifier_resume(tmp_path, rng):
    """Stop after 2 epochs, resume completes to 4 without redoing work."""
    from audax.core.config import CNNClassifierConfig
    from audax.models.classifiers import CNNClassifier
    from audax.train.checkpoints import CheckpointManager
    from audax.train.loops import fit_classifier
    data = {"x": rng.standard_normal((32, 32, 8)).astype(np.float32),
            "y": rng.integers(0, 3, 32).astype(np.int64)}
    model = CNNClassifier(CNNClassifierConfig(channels=(8,), head_dims=(8,),
                                              num_classes=3))
    cfg2 = ClassifierTrainConfig(batch_size=8, epochs=2, learning_rate=1e-3)
    mgr = CheckpointManager(str(tmp_path / "ck"), best_metric="val_loss")
    fit_classifier(model, data, None, cfg2, num_classes=3, ckpt_manager=mgr)
    assert mgr.latest_step() == 1
    cfg4 = ClassifierTrainConfig(batch_size=8, epochs=4, learning_rate=1e-3)
    _, hist = fit_classifier(model, data, None, cfg4, num_classes=3,
                             ckpt_manager=mgr)
    assert len(hist["train_loss"]) == 2    # only epochs 2,3 ran
    assert mgr.latest_step() == 3
    mgr.close()


def test_demo_server_compressed_upload(tmp_path, rng):
    """Non-WAV uploads (browser webm/m4a) decode through the in-process C++
    module — no ffmpeg binary needed."""
    from audax.cli.demo_ui import serve
    from audax.native.bindings import decode_available, encode_audio_file

    if not decode_available():
        pytest.skip("system ffmpeg libraries unavailable")

    class FakeResult:
        text = "compressed ok"
        rtf = 0.01

    class FakeTranscriber:
        def transcribe(self, audio):
            assert len(audio) > 1000
            return FakeResult()

    server = serve(FakeTranscriber(), port=0, dataset_dir=str(tmp_path))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        m4a = str(tmp_path / "up.m4a")
        encode_audio_file(m4a, (0.3 * rng.standard_normal(32000))
                          .astype(np.float32), 16000)
        body = open(m4a, "rb").read()
        assert body[:4] != b"RIFF"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe?model=original", data=body)
        out = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out["text"] == "compressed ok"
    finally:
        server.shutdown()


def test_demo_finetune_swap_loop(tmp_path, rng):
    """The reference UI's full loop (AB/UI/Asmo.py:152-166): record ->
    add-to-dataset (with transcript) -> Finetune (background LoRA over the
    collected corpus) -> Swap model -> evaluate the fine-tuned slot. The
    swapped model's output must differ from the base model's on the same
    clip (the adapters trained) and /status must report the run."""
    import time

    import jax

    from audax.cli.demo_ui import serve
    from audax.core.config import WhisperConfig
    from audax.data.audio_io import write_wav
    from audax.infer.transcribe import Transcriber
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=100, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    tr = Transcriber(params, cfg, tok, chunk_seconds=2.0,
                     temperature_fallback=False, max_new_tokens=8,
                     backend="xla")
    server = serve(tr, port=0, dataset_dir=str(tmp_path / "ds"),
                   ft_steps=120, ft_lora_rank=2)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        wav_path = str(tmp_path / "u.wav")
        write_wav(wav_path,
                  (0.1 * rng.standard_normal(32000)).astype(np.float32),
                  16000)
        body = open(wav_path, "rb").read()

        def post(path, data=b""):
            req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                         data=data, method="POST")
            return json.loads(urllib.request.urlopen(req, timeout=120).read())

        # swap before any finetune -> 409
        try:
            post("/swap")
            assert False, "expected 409"
        except urllib.error.HTTPError as e:
            assert e.code == 409

        out = post("/add?text=hello%20world", body)
        side = os.path.join(str(tmp_path / "ds"),
                            out["file"].replace(".wav", ".txt"))
        assert open(side).read().strip() == "hello world"

        base_text = post("/transcribe?model=finetuned", body)["text"]

        assert post("/finetune")["state"] == "running"
        deadline = time.time() + 300
        while time.time() < deadline:
            s = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=30).read())
            if s["state"] in ("done", "failed"):
                break
            time.sleep(0.5)
        assert s["state"] == "done", s
        assert s["loss"] is not None

        assert post("/swap")["serving"] == "finetuned"
        ft_text = post("/transcribe?model=finetuned", body)["text"]
        orig_text = post("/transcribe?model=original", body)["text"]
        assert orig_text == base_text        # base slot untouched
        assert ft_text != base_text          # adapters actually trained
        s = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/status", timeout=30).read())
        assert s["serving"] == "finetuned"
    finally:
        server.shutdown()
