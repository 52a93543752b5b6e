"""audax command line: stage-flag subcommands mirroring the reference surface.

The reference exposes boolean argparse flags per pipeline stage
(.charles/spectrogram.py:1285-1311, .charles/music2midi/preprocess_data.py:634-668).
Here each stage is a subcommand on one entry point::

    python -m audax.cli.main preprocess --dataset-root ... [--mels 128 ...]
    python -m audax.cli.main sample --wav f.wav --out sample.png
    python -m audax.cli.main train-transformer / train-cnn / test-transformer / test-cnn
    (later stages register below: midi2wav, gentokens, genparquet, transcribe, ...)
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from dataclasses import replace
from typing import Callable, Dict

from audax.core.config import (ClassifierTrainConfig, CNNClassifierConfig,
                               MelConfig, TransformerClassifierConfig,
                               UrbanSoundConfig, load_dotenv)
from audax.core.logging import get_logger

log = get_logger("audax.cli")

_COMMANDS: Dict[str, Callable] = {}


def command(name: str):
    def deco(fn):
        _COMMANDS[name] = fn
        return fn
    return deco


def _mel_from_args(args) -> MelConfig:
    cfg = MelConfig.from_env()
    over = {}
    if args.mels: over["n_mels"] = args.mels
    if args.hop: over["hop_length"] = args.hop
    if args.fft: over["n_fft"] = args.fft
    return replace(cfg, **over)


def _add_mel_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mels", type=int, default=0)
    p.add_argument("--hop", type=int, default=0)
    p.add_argument("--fft", type=int, default=0)


def _add_mesh_flags(p: argparse.ArgumentParser) -> None:
    """Parallelism knobs shared by the training/serving surfaces. The
    reference is strictly single-device (SURVEY.md §2.3); on TPU these pick
    the (data, model) mesh layout and XLA inserts the ICI collectives."""
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel axis size (0 = no mesh; -1 = all "
                        "devices not taken by --tp)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel axis size (Megatron head/ffn "
                        "split; must divide the device count)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params + Adam moments over the "
                        "data axis (cuts per-chip optimizer memory ~dp-fold)")


def _mesh_from_args(args):
    """(mesh, fsdp) from --dp/--tp/--fsdp; (None, False) = single device."""
    if not (args.dp or args.tp > 1 or args.fsdp):
        return None, False
    from audax.core.config import MeshConfig
    from audax.parallel.mesh import make_mesh
    mesh = make_mesh(MeshConfig(data=args.dp if args.dp else -1,
                                model=args.tp))
    log.info("mesh: %s over %d devices%s", dict(mesh.shape),
             mesh.devices.size, " + FSDP" if args.fsdp else "")
    return mesh, args.fsdp


@command("preprocess")
def cmd_preprocess(argv) -> int:
    p = argparse.ArgumentParser(prog="audax preprocess")
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--limit", type=int, default=0)
    _add_mel_flags(p)
    args = p.parse_args(argv)
    us = UrbanSoundConfig.from_env()
    if args.dataset_root:
        us = replace(us, dataset_root=args.dataset_root)
    from audax.core.runtime import setup
    from audax.data.urbansound import preprocess_to_parquet
    setup()
    path = preprocess_to_parquet(us, _mel_from_args(args), args.out,
                                 limit=args.limit or None)
    print(path)
    return 0


@command("sample")
def cmd_sample(argv) -> int:
    """Waveform+spectrogram PNG for one wav (reference --sample-* flags)."""
    p = argparse.ArgumentParser(prog="audax sample")
    p.add_argument("--wav", required=True)
    p.add_argument("--out", default="sample.png")
    _add_mel_flags(p)
    args = p.parse_args(argv)
    import numpy as np
    from audax.data.audio_io import read_wav, resample, to_mono
    from audax.eval.plots import plot_sample
    from audax.frontend import LogMelFrontend
    mel_cfg = _mel_from_args(args)
    x, rate = read_wav(args.wav)
    x = to_mono(x)
    if rate != mel_cfg.sample_rate:
        x = resample(x, rate, mel_cfg.sample_rate)
    fe = LogMelFrontend(mel_cfg)
    feats = np.asarray(fe(x, mel_first=True))
    plot_sample(x, feats, mel_cfg.sample_rate, mel_cfg.hop_length, args.out,
                window_s=UrbanSoundConfig.from_env().duration_s,
                title=os.path.basename(args.wav))
    print(args.out)
    return 0


def _classifier_common(argv, model_kind: str, train: bool) -> int:
    p = argparse.ArgumentParser(prog=f"audax {'train' if train else 'test'}-{model_kind}")
    p.add_argument("--parquet", required=True)
    p.add_argument("--run-name", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--pool", default="cls", choices=["cls", "mean"])
    if train:
        _add_mesh_flags(p)
    args = p.parse_args(argv)

    from audax.core.artifacts import stamped_name
    from audax.core.runtime import setup
    from audax.data.urbansound import load_split
    from audax.eval.metrics import (URBANSOUND8K_CLASSES, classification_report,
                                    plot_confusion_matrix)
    from audax.models.classifiers import CNNClassifier, TransformerClassifier
    from audax.train.checkpoints import CheckpointManager
    from audax.train.loops import evaluate_classifier, fit_classifier
    from audax.train.metrics_sink import MetricsSink
    from audax.train.steps import make_classifier_steps

    setup()
    us = UrbanSoundConfig.from_env()
    tc = ClassifierTrainConfig.from_env()
    if args.epochs: tc = replace(tc, epochs=args.epochs)
    if args.batch_size: tc = replace(tc, batch_size=args.batch_size)
    mel = MelConfig.from_env()

    if model_kind == "cnn":
        model = CNNClassifier(CNNClassifierConfig.from_env())
        dropout = model.cfg.dropout
    else:
        model = TransformerClassifier(
            replace(TransformerClassifierConfig.from_env(), pool=args.pool),
            max_len=2048)
        dropout = model.cfg.dropout
    run = args.run_name or stamped_name(
        f"urbansound8k_{model_kind}", n_mels=mel.n_mels,
        hop_length=mel.hop_length, batch_size=tc.batch_size, epochs=tc.epochs,
        learning_rate=tc.learning_rate, dropout=dropout)
    ckpt_dir = args.ckpt_dir or os.path.join("artifacts", "ckpt", run)

    if train:
        data = load_split(args.parquet, us.train_folds)
        ev = load_split(args.parquet, [us.eval_fold])
        mesh, _fsdp = _mesh_from_args(args)
        if _fsdp:
            log.warning("--fsdp is a no-op for the small classifiers "
                        "(params fit any chip); using DP only")
        sink = MetricsSink(run, config={"model": model_kind, **tc.asdict()})
        mgr = CheckpointManager(ckpt_dir, config=tc.asdict())
        state, _ = fit_classifier(model, data, ev if len(ev["y"]) else None,
                                  tc, sink=sink, ckpt_manager=mgr,
                                  mesh=mesh)
        mgr.close()
        sink.close()
        print(ckpt_dir)
        return 0

    # test: fold 10 from the saved checkpoint
    import jax
    import jax.numpy as jnp
    import numpy as np
    test = load_split(args.parquet, [us.test_fold])
    # jit the init: eager per-op dispatch over the tunnel is ~0.5 s/op and
    # the values only serve as a restore template (train/loops.py:37)
    variables = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=True))(
        jax.random.key(0), jnp.asarray(test["x"][:1]))
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore({"params": variables["params"],
                            "batch_stats": variables.get("batch_stats", {})})
    from audax.train.optim import adamw
    from audax.train.steps import TrainState
    state = TrainState.create(apply_fn=model.apply, params=restored["params"],
                              tx=adamw(1e-3),
                              batch_stats=restored["batch_stats"])
    _, eval_step = make_classifier_steps(model)
    m, preds = evaluate_classifier(eval_step, state, test, tc.batch_size, 10)
    print(classification_report(test["y"], preds, URBANSOUND8K_CLASSES))
    cm_path = os.path.join("artifacts", f"confusion_matrix_{run}.png")
    os.makedirs("artifacts", exist_ok=True)
    plot_confusion_matrix(test["y"], preds, URBANSOUND8K_CLASSES, cm_path,
                          title=f"{model_kind} fold-{us.test_fold}")
    log.success("test accuracy %.4f; confusion matrix -> %s",
                m["accuracy"], cm_path)
    mgr.close()
    return 0


@command("train-cnn")
def cmd_train_cnn(argv) -> int:
    return _classifier_common(argv, "cnn", train=True)


@command("test-cnn")
def cmd_test_cnn(argv) -> int:
    return _classifier_common(argv, "cnn", train=False)


@command("train-transformer")
def cmd_train_transformer(argv) -> int:
    return _classifier_common(argv, "transformer", train=True)


@command("test-transformer")
def cmd_test_transformer(argv) -> int:
    return _classifier_common(argv, "transformer", train=False)


#: the published whisper family (openai model card); "turbo" is the
#: distilled 4-decoder-layer large-v3
WHISPER_SIZES = ("tiny", "base", "small", "medium", "large-v3",
                 "large-v3-turbo")


def _whisper_preset(size: str):
    from audax.core.config import WhisperConfig
    return {"tiny": WhisperConfig.tiny, "base": WhisperConfig.base,
            "small": WhisperConfig.small, "medium": WhisperConfig.medium,
            "large-v3": WhisperConfig.large_v3,
            "large-v3-turbo": WhisperConfig.large_v3_turbo}[size]()


def _load_whisper(size: str, ckpt: str, tokenizer_dir: str):
    """Assemble (params, cfg, tokenizer) from a size preset + optional orbax
    checkpoint + tokenizer dir (vocab.json/merges.txt; a tiny built-in test
    vocab is used when absent — no network in this environment)."""
    import jax
    from audax.core.config import WhisperConfig
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import BPE, train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    cfg = _whisper_preset(size)
    sidecar = (ckpt.rstrip("/") + ".config.json") if ckpt else ""
    if sidecar and os.path.exists(sidecar):
        # checkpoints carry their true dims (convert-hf and finetune write
        # this): a finetune --chunk-seconds run slices the encoder
        # positions, and rebuilding from the size preset would mismatch
        import json as _json
        with open(sidecar) as fh:
            cfg = WhisperConfig(**_json.load(fh))
    if tokenizer_dir and not os.path.exists(
            os.path.join(tokenizer_dir, "vocab.json")):
        # an explicitly supplied path that does not resolve is an ERROR —
        # falling back to the toy vocab would decode a real checkpoint's
        # ids through a ~300-token table (garbage text, no loud failure)
        raise FileNotFoundError(
            f"--tokenizer-dir {tokenizer_dir!r} has no vocab.json")
    if tokenizer_dir:
        bpe = BPE.load(tokenizer_dir)
        try:
            # real checkpoint vocabs: solve language count from the preset's
            # vocab size (51866 -> 100 languages for large-v3, 51865 -> 99)
            tok = WhisperTokenizer.for_vocab_size(bpe, cfg.vocab_size)
        except ValueError:
            tok = WhisperTokenizer(bpe)    # ad-hoc/test vocab: default layout
    else:
        log.warning("no tokenizer dir; building a small ad-hoc BPE vocab")
        corpus = ["the quick brown fox jumps over the lazy dog"] * 4
        tok = WhisperTokenizer(train_bpe(corpus, vocab_size=300))
    if tok.vocab_size != cfg.vocab_size:
        if sidecar and os.path.exists(sidecar):
            # the checkpoint's dims win — a mismatched tokenizer decodes
            # garbage but a mismatched cfg would SHAPE-fail the load
            log.warning("tokenizer vocab %d != checkpoint vocab %d — pass "
                        "the tokenizer the model was trained with",
                        tok.vocab_size, cfg.vocab_size)
        else:
            cfg = replace(cfg, vocab_size=tok.vocab_size)
    params = init_whisper_params(cfg, jax.random.key(0))
    if ckpt:
        from audax.train.checkpoints import load_pytree
        # target-less restore: the checkpoint may be the float tree or the
        # int8 serving tree from `convert-hf --quantize` (kernel_q leaves)
        params = load_pytree(ckpt)
    return params, cfg, tok


@command("convert-hf")
def cmd_convert_hf(argv) -> int:
    """Convert a local HF checkpoint directory (Whisper or Qwen/LLaMA-family)
    to an audax orbax checkpoint. No network access: the directory must exist
    locally (e.g. rsynced from a model cache)."""
    p = argparse.ArgumentParser(prog="audax convert-hf")
    p.add_argument("--hf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--kind", default="whisper", choices=["whisper", "causal-lm"])
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="save int8/int4 weight-only serving weights "
                   "(models/quantize.py + ops/int4_matmul.py; 3-8x smaller "
                   "checkpoint, loads straight into Transcriber/generate)")
    args = p.parse_args(argv)
    from audax.train.checkpoints import save_pytree
    if args.kind == "whisper":
        from transformers import WhisperForConditionalGeneration
        from audax.models.port import (port_whisper_from_hf,
                                       whisper_config_from_hf)
        hf = WhisperForConditionalGeneration.from_pretrained(args.hf_dir)
        params = port_whisper_from_hf(hf)
        cfg = whisper_config_from_hf(hf.config)
    else:
        from transformers import AutoModelForCausalLM
        from audax.models.causal_lm import port_causal_lm_from_hf
        hf = AutoModelForCausalLM.from_pretrained(args.hf_dir)
        params, cfg = port_causal_lm_from_hf(hf)
    if args.quantize:
        from audax.models.quantize import quantize_tree
        params = quantize_tree(params, bits=4 if args.quantize == "int4"
                               else 8)
    save_pytree(args.out, params)
    import json
    with open(args.out + ".config.json", "w") as fh:
        json.dump(cfg.asdict() if hasattr(cfg, "asdict") else cfg.__dict__,
                  fh, indent=2)
    log.success("ported %s (%s) -> %s", args.hf_dir, args.kind, args.out)
    print(args.out)
    return 0


@command("verify-parity")
def cmd_verify_parity(argv) -> int:
    """One-command real-weights parity harness: port a local HF whisper
    checkpoint, prove logit parity against the torch forward, and (with
    --audio-dir) compare transcriptions — audax vs HF generate on identical
    features, plus WER against .txt reference sidecars when present.

    The reference's published quality numbers (fine-tuned-word CSV,
    AB/transcriptions.csv:2-5) are unreproducible in this egress-less
    environment; this harness packages the reproduction so the moment real
    checkpoints/audio become reachable it is a single command."""
    p = argparse.ArgumentParser(prog="audax verify-parity")
    p.add_argument("--hf-dir", required=True,
                   help="local HF checkpoint directory")
    p.add_argument("--kind", default="whisper",
                   choices=["whisper", "causal-lm", "classifier"],
                   help="whisper (logits + optional transcription compare), "
                        "causal-lm (Qwen/LLaMA-family logit parity), or "
                        "classifier (the full UrbanSound8K fold protocol "
                        "against the published 64%%/68%% accuracies)")
    p.add_argument("--audio-dir", default="",
                   help="wavs to transcribe with both stacks; .txt sidecars "
                        "(when present) add reference WER columns")
    p.add_argument("--tokenizer-dir", default="",
                   help="vocab.json/merges.txt dir (default: --hf-dir)")
    p.add_argument("--lang", default="en")
    p.add_argument("--tol", type=float, default=1e-4,
                   help="max |logit diff| allowed for parity PASS")
    p.add_argument("--samples", type=int, default=16,
                   help="max clips from --audio-dir")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--report", default="",
                   help="write the full JSON report here")
    p.add_argument("--data-dir", default="",
                   help="[classifier] UrbanSound8K root (metadata/ + "
                        "audio/fold*/); featurized to Parquet first")
    p.add_argument("--parquet", default="",
                   help="[classifier] already-featurized Parquet instead "
                        "of --data-dir")
    p.add_argument("--variant", default="v2", choices=["v1", "v2"],
                   help="[classifier] preprocessing variant: v1 = 64 mels "
                        "hop 512 [64,126] (published 64%%), v2 = 128 mels "
                        "hop 128 [128,501] (published 68%%) — "
                        "urbansound8k_sql.md:94,71-110")
    p.add_argument("--model", default="cnn", choices=["cnn", "transformer"],
                   help="[classifier] architecture (the reference ran both)")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--limit", type=int, default=0,
                   help="[classifier] cap clips featurized (CI stand-ins)")
    args = p.parse_args(argv)

    import json

    import jax
    import numpy as np

    from audax.core.runtime import setup

    setup()
    rng = np.random.default_rng(0)
    if args.kind == "classifier":
        # the full fold protocol (train 1-8, eval 9, test 10) from raw
        # UrbanSound8K or a Parquet, scored against the reference's
        # published accuracies — the one-command reproduction for the
        # moment the real dataset is reachable (no egress here; CI runs
        # it on a synthetic stand-in dir, tests/test_export.py)
        from audax.data.urbansound import load_split, preprocess_to_parquet
        from audax.models.classifiers import (CNNClassifier,
                                              TransformerClassifier)
        from audax.train.loops import evaluate_classifier, fit_classifier
        from audax.train.steps import make_classifier_steps

        if not (args.data_dir or args.parquet):
            p.error("--kind classifier needs --data-dir or --parquet")
        published = {"v1": 0.64, "v2": 0.68}[args.variant]
        mel = (MelConfig.urbansound_v1() if args.variant == "v1"
               else MelConfig.urbansound_v2())
        us = UrbanSoundConfig.from_env()
        parquet = args.parquet
        if not parquet:
            us = replace(us, dataset_root=args.data_dir)
            parquet = preprocess_to_parquet(
                us, mel, limit=args.limit or None)
        tc = ClassifierTrainConfig.from_env()
        if args.epochs:
            tc = replace(tc, epochs=args.epochs)
        if args.batch_size:
            tc = replace(tc, batch_size=args.batch_size)
        if args.model == "cnn":
            model = CNNClassifier(CNNClassifierConfig.from_env())
        else:
            model = TransformerClassifier(
                TransformerClassifierConfig.from_env(), max_len=2048)
        data = load_split(parquet, us.train_folds)
        ev = load_split(parquet, [us.eval_fold])
        test = load_split(parquet, [us.test_fold])
        state, _hist = fit_classifier(model, data,
                                      ev if len(ev["y"]) else None, tc)
        _, eval_step = make_classifier_steps(model)
        accs = {}
        for name, split in (("fold9", ev), ("fold10", test)):
            if len(split["y"]):
                m, _preds = evaluate_classifier(eval_step, state, split,
                                                tc.batch_size,
                                                us.num_classes)
                accs[f"{name}_accuracy"] = round(float(m["accuracy"]), 4)
        report = {"kind": "classifier", "variant": args.variant,
                  "model": args.model, "parquet": parquet,
                  "train_clips": int(len(data["y"])), **accs,
                  "published_accuracy": published,
                  "delta_vs_published": (
                      round(accs["fold10_accuracy"] - published, 4)
                      if "fold10_accuracy" in accs else None)}
        if args.report:
            with open(args.report, "w") as fh:
                json.dump(report, fh, indent=2)
        print(json.dumps(report))
        return 0 if accs else 1

    import torch
    if args.kind == "causal-lm":
        # Qwen/LLaMA-family: port + teacher-forced logit parity (the
        # reference's decoder tower, music2midi/model.py:209-213)
        from transformers import AutoModelForCausalLM
        from audax.models.causal_lm import (lm_forward,
                                            port_causal_lm_from_hf)
        hf = AutoModelForCausalLM.from_pretrained(args.hf_dir).eval()
        params, cfg = port_causal_lm_from_hf(hf)
        toks = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(toks)).logits.numpy()
        got = np.asarray(lm_forward(params, cfg, toks.astype(np.int32)))
        logit_diff = float(np.abs(got - ref).max())
        report = {"hf_dir": args.hf_dir, "kind": "causal-lm",
                  "logit_max_abs_diff": logit_diff, "logit_tol": args.tol,
                  "logit_parity": logit_diff <= args.tol}
        if args.report:
            with open(args.report, "w") as fh:
                json.dump(report, fh, indent=2)
        print(json.dumps(report))
        return 0 if report["logit_parity"] else 1

    from audax.models.port import (port_whisper_from_hf,
                                   whisper_config_from_hf)
    from audax.models.whisper import whisper_forward
    from transformers import WhisperForConditionalGeneration

    hf = WhisperForConditionalGeneration.from_pretrained(args.hf_dir).eval()
    cfg = whisper_config_from_hf(hf.config)
    params = port_whisper_from_hf(hf)

    # --- logit parity (the BASELINE acceptance criterion) ---------------
    mel = rng.standard_normal((1, 2 * cfg.n_audio_ctx, cfg.n_mels)) \
        .astype(np.float32)
    toks = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
                 decoder_input_ids=torch.from_numpy(toks)).logits.numpy()
    got = np.asarray(whisper_forward(params, cfg, mel,
                                     toks.astype(np.int32)))
    logit_diff = float(np.abs(got - ref).max())
    report = {"hf_dir": args.hf_dir, "kind": "whisper",
              "logit_max_abs_diff": logit_diff,
              "logit_tol": args.tol, "logit_parity": logit_diff <= args.tol}

    # --- transcription comparison on real audio -------------------------
    if args.audio_dir:
        from audax.data.audio_io import read_wav, resample, to_mono
        from audax.eval.wer import word_error_rate
        from audax.frontend import pad_or_trim
        from audax.infer.transcribe import Transcriber
        from audax.symbolic.bpe import BPE
        from audax.symbolic.tokenizer import WhisperTokenizer

        tok_dir = args.tokenizer_dir or args.hf_dir
        bpe = BPE.load(tok_dir)
        try:
            tok = WhisperTokenizer.for_vocab_size(bpe, cfg.vocab_size)
        except ValueError:
            tok = WhisperTokenizer(bpe)
        tr = Transcriber(params, cfg, tok, lang=args.lang,
                         max_new_tokens=args.max_tokens,
                         temperature_fallback=False)
        rows, ours, theirs, refs = [], [], [], []
        paths = sorted(glob.glob(os.path.join(args.audio_dir, "*.wav")))
        for path in paths[: args.samples]:
            x, rate = read_wav(path)
            x = to_mono(x)
            if rate != 16000:
                x = resample(x, rate, 16000)
            our_text = tr.transcribe(x).text.strip()
            # HF side consumes the SAME whisper-exact features (our
            # frontend) so the comparison isolates model+decode parity
            feats = tr.frontend(jax.numpy.asarray(
                pad_or_trim(jax.numpy.asarray(x), tr.chunk_samples))[None])
            with torch.no_grad():
                ids = hf.generate(
                    input_features=torch.from_numpy(
                        np.asarray(feats).transpose(0, 2, 1)),
                    max_new_tokens=args.max_tokens)
            hf_text = tok.decode([int(t) for t in ids[0]]).strip()
            row = {"file": os.path.basename(path), "audax": our_text,
                   "hf": hf_text}
            side = os.path.splitext(path)[0] + ".txt"
            if os.path.exists(side):
                row["reference"] = open(side).read().strip()
                refs.append(row["reference"])
            ours.append(our_text)
            theirs.append(hf_text)
            rows.append(row)
        report["clips"] = rows
        if rows:
            report["cross_wer_audax_vs_hf"] = round(
                word_error_rate(theirs, ours), 4)
        if refs and len(refs) == len(rows):
            report["wer_audax_vs_reference"] = round(
                word_error_rate(refs, ours), 4)
            report["wer_hf_vs_reference"] = round(
                word_error_rate(refs, theirs), 4)

    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "clips"}))
    return 0 if report["logit_parity"] else 1


@command("export-hf")
def cmd_export_hf(argv) -> int:
    """Export an audax orbax checkpoint back to a local HF checkpoint
    directory (config.json + pytorch_model.bin) — the inverse of
    `convert-hf`, so fine-tunes made here load with
    ``from_pretrained(dir)`` in the reference's torch stack
    (AB/fineTune.py:131 consumed checkpoints one-way)."""
    p = argparse.ArgumentParser(prog="audax export-hf")
    p.add_argument("--ckpt", required=True, help="audax orbax checkpoint")
    p.add_argument("--out", required=True, help="output HF directory")
    p.add_argument("--kind", default="whisper",
                   choices=["whisper", "causal-lm"])
    p.add_argument("--size", default="",
                   choices=("",) + WHISPER_SIZES,
                   help="whisper size preset when no <ckpt>.config.json "
                        "sidecar exists")
    p.add_argument("--config", default="",
                   help="explicit config JSON (overrides the sidecar)")
    p.add_argument("--lora-ckpt", default="",
                   help="LoRA adapter checkpoint (finetune --lora) to merge "
                        "into the base weights before export")
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--format", default="safetensors",
                   choices=["safetensors", "bin"],
                   help="safetensors (default; tied aliases dropped — "
                        "from_pretrained re-ties via the config) or a "
                        "classic pytorch_model.bin")
    args = p.parse_args(argv)
    import json

    import jax
    import numpy as np
    import torch

    from audax.train.checkpoints import load_pytree
    cfg_path = args.config or (args.ckpt.rstrip("/") + ".config.json")
    params = load_pytree(args.ckpt)
    if args.lora_ckpt:
        from audax.models.lora import merge_lora
        params = merge_lora(params, load_pytree(args.lora_ckpt),
                            alpha=args.lora_alpha)
    if args.kind == "whisper":
        from audax.core.config import WhisperConfig
        from audax.models.export import (export_whisper_state_dict,
                                         hf_whisper_config_dict)
        if os.path.exists(cfg_path):
            with open(cfg_path) as fh:
                cfg = WhisperConfig(**json.load(fh))
        elif args.size:
            cfg = _whisper_preset(args.size)
        else:
            raise FileNotFoundError(
                f"no config sidecar at {cfg_path}; pass --size or --config")
        # a --size smaller than the checkpoint would silently truncate
        # layers in _unstack (export "succeeds" with missing layers)
        for tower, want in (("encoder", cfg.encoder_layers),
                            ("decoder", cfg.decoder_layers)):
            have = int(np.shape(jax.tree.leaves(
                params[tower]["layers"])[0])[0])
            if have != want:
                raise ValueError(
                    f"config mismatch: checkpoint has {have} {tower} "
                    f"layers, config says {want} — wrong --size/--config?")
        sd = export_whisper_state_dict(params, cfg)
        hf_cfg = hf_whisper_config_dict(cfg)
    else:
        from audax.models.causal_lm import CausalLMConfig
        from audax.models.export import (export_causal_lm_state_dict,
                                         hf_causal_lm_config_dict)
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(
                f"no config sidecar at {cfg_path}; pass --config")
        with open(cfg_path) as fh:
            cfg = CausalLMConfig(**json.load(fh))
        sd = export_causal_lm_state_dict(params, cfg)
        hf_cfg = hf_causal_lm_config_dict(cfg)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as fh:
        json.dump(hf_cfg, fh, indent=2)
    # order="C": orbax restores can be non-C-contiguous views, which both
    # torch.from_numpy and safetensors' shared-storage check choke on.
    # ml_dtypes floats (bf16 checkpoints from `finetune --dtype bfloat16`)
    # have no torch buffer protocol — upcast them to f32 first
    def _to_torch(v):
        v = np.array(v, order="C")
        if v.dtype.kind == "V" or v.dtype.name in ("bfloat16", "float8_e4m3",
                                                   "float8_e5m2"):
            v = v.astype(np.float32)
        return torch.from_numpy(v)

    tensors = {k: _to_torch(v) for k, v in sd.items()}
    if args.format == "safetensors":
        # tied aliases share storage, which safetensors refuses; HF models
        # re-tie them from the config (_tied_weights_keys) at load time
        tied = (["proj_out.weight"] if args.kind == "whisper"
                else ["lm_head.weight"] if cfg.tie_embeddings else [])
        for k in tied:
            tensors.pop(k, None)
        from safetensors.torch import save_file
        save_file(tensors, os.path.join(args.out, "model.safetensors"))
    else:
        torch.save(tensors, os.path.join(args.out, "pytorch_model.bin"))
    log.success("exported %s (%s) -> %s (%d tensors)",
                args.ckpt, args.kind, args.out, len(sd))
    print(args.out)
    return 0


@command("transcribe")
def cmd_transcribe(argv) -> int:
    """Batch wav -> text with CSV + sidecars (reference: AB/wavToWhisper.py)."""
    p = argparse.ArgumentParser(prog="audax transcribe")
    p.add_argument("wavs", nargs="+")
    p.add_argument("--size", default="tiny")
    p.add_argument("--ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--csv", default="transcriptions.csv")
    p.add_argument("--lang", default="en",
                   help="language code, or 'auto' for per-file detection")
    p.add_argument("--timestamps", action="store_true",
                   help="timestamp-rule decoding into timed segments")
    p.add_argument("--word-timestamps", action="store_true",
                   help="word-level timings via cross-attention alignment")
    p.add_argument("--beam-width", type=int, default=1,
                   help=">1 = beam search at temperature 0")
    p.add_argument("--best-of", type=int, default=5,
                   help="n-best sampling on the t>0 fallback rungs, best "
                        "kept by avg logprob (openai best_of default 5)")
    p.add_argument("--patience", type=float, default=None,
                   help="beam patience: collect round(W*patience) "
                        "candidates before committing (openai patience)")
    p.add_argument("--length-penalty", type=float, default=None,
                   help="GNMT length-penalty exponent for candidate "
                        "ranking (openai length_penalty; default: rank "
                        "by simple avg logprob)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--draft-size", default="",
                   help="draft model size for speculative decoding "
                        "(single-stream greedy latency; token-exact)")
    p.add_argument("--draft-ckpt", default="",
                   help="orbax checkpoint for the draft model")
    p.add_argument("--spec-tokens", type=int, default=8)
    p.add_argument("--no-speech-threshold", type=float, default=0.6,
                   help="silence gate: <|nospeech|> prob above this + low "
                        "confidence emits silence (openai default 0.6; "
                        "<=0 disables)")
    p.add_argument("--initial-prompt", default=None,
                   help="context/vocabulary hint fed as <|startofprev|> "
                        "text (openai initial_prompt)")
    p.add_argument("--task", default="transcribe",
                   choices=["transcribe", "translate"],
                   help="whisper task token (translate = any language "
                        "to English)")
    p.add_argument("--seek", action="store_true",
                   help="openai seek loop (with --timestamps): windows "
                        "advance to the last complete segment instead of "
                        "fixed 30 s strides — no word cut at boundaries")
    p.add_argument("--clip-timestamps", default=None,
                   help="comma-separated start,end,... seconds: transcribe "
                        "only these ranges (openai clip_timestamps; last "
                        "end defaults to end-of-file)")
    p.add_argument("--hallucination-silence-threshold", type=float,
                   default=None,
                   help="with --word-timestamps --timestamps: skip silent "
                        "gaps longer than this around segments whose word "
                        "probabilities/durations look hallucinated "
                        "(openai hallucination_silence_threshold)")
    p.add_argument("--vad-threshold-db", type=float, default=None,
                   help="energy VAD: windows whose peak 100ms-frame RMS "
                        "is below this dBFS are emitted as silence with "
                        "NO decode (try -45..-55; off by default)")
    p.add_argument("--verbose", action="store_true",
                   help="print timed segment lines per file (openai CLI "
                        "style); timestamps recommended")
    p.add_argument("--suppress-tokens", default="-1",
                   help="'-1' (default): ban the tokenizer's non-speech "
                        "symbol set; comma-separated ids: ban those; '' : "
                        "ban only control tokens (openai suppress_tokens)")
    p.add_argument("--no-suppress-blank", action="store_true",
                   help="allow ' '/EOT at the first generated position "
                        "(openai suppress_blank=False)")
    p.add_argument("--output-format", default=None,
                   choices=["txt", "srt", "vtt", "tsv", "json", "all"],
                   help="also write per-file transcripts in this format "
                        "(srt/vtt/tsv need --timestamps; auto-enabled)")
    p.add_argument("--output-dir", default=None,
                   help="directory for --output-format files (default: "
                        "alongside the CSV)")
    p.add_argument("--max-line-width", type=int, default=None,
                   help="srt/vtt: max chars per subtitle line (uses word "
                        "timings; implies --word-timestamps)")
    p.add_argument("--max-line-count", type=int, default=None,
                   help="srt/vtt: max lines per subtitle cue")
    p.add_argument("--max-words-per-line", type=int, default=None,
                   help="srt/vtt: max words per subtitle line")
    p.add_argument("--highlight-words", action="store_true",
                   help="srt/vtt: one cue per word with the active word "
                        "underlined (implies --word-timestamps)")
    _add_mesh_flags(p)
    args = p.parse_args(argv)
    import jax.numpy as jnp

    from audax.core.runtime import setup
    from audax.infer.transcribe import Transcriber, batch_transcribe_to_csv
    setup()
    params, cfg, tok = _load_whisper(args.size, args.ckpt, args.tokenizer_dir)
    draft = None
    if args.draft_size:
        import dataclasses
        dparams, dcfg, _ = _load_whisper(args.draft_size, args.draft_ckpt,
                                         args.tokenizer_dir)
        if dcfg.vocab_size != cfg.vocab_size:
            if args.draft_ckpt:
                # NEVER silently replace user weights: a random draft runs
                # below the no-draft baseline (acceptance floor)
                print(f"--draft-ckpt vocab {dcfg.vocab_size} does not match "
                      f"the target's {cfg.vocab_size}; the draft must share "
                      f"the target token space", file=sys.stderr)
                return 1
            # random-init drafts (no --draft-ckpt) are only useful for
            # plumbing/benchmarks: align the vocab and re-init
            dcfg = dataclasses.replace(dcfg, vocab_size=cfg.vocab_size)
            from audax.models.whisper import init_whisper_params
            import jax
            dparams = init_whisper_params(dcfg, jax.random.key(1))
        draft = (dparams, dcfg)
    mesh, _ = _mesh_from_args(args)
    hal = args.hallucination_silence_threshold
    want_subs = args.output_format in ("srt", "vtt", "tsv", "json", "all")
    want_words = (args.highlight_words or args.max_line_width is not None
                  or args.max_words_per_line is not None)
    tr = Transcriber(params, cfg, tok, lang=args.lang, task=args.task,
                     timestamps=args.timestamps or args.seek
                     or hal is not None or want_subs,
                     seek_by_timestamps=args.seek,
                     clip_timestamps=args.clip_timestamps,
                     hallucination_silence_threshold=hal,
                     word_timestamps=args.word_timestamps
                     or hal is not None or want_words,
                     beam_width=args.beam_width,
                     best_of=args.best_of, patience=args.patience,
                     length_penalty=args.length_penalty,
                     draft=draft, spec_tokens=args.spec_tokens,
                     no_speech_threshold=(args.no_speech_threshold
                                          if args.no_speech_threshold > 0
                                          else None),
                     suppress_tokens=(args.suppress_tokens
                                      if args.suppress_tokens == "-1"
                                      else [int(t) for t in
                                            args.suppress_tokens.split(",")
                                            if t.strip()]),
                     suppress_blank=not args.no_suppress_blank,
                     vad_threshold_db=args.vad_threshold_db,
                     initial_prompt=args.initial_prompt, mesh=mesh,
                     dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                     else jnp.float32)
    paths = []
    for w in args.wavs:
        paths.extend(sorted(glob.glob(os.path.join(w, "*.wav")))
                     if os.path.isdir(w) else [w])
    rows = batch_transcribe_to_csv(
        tr, paths, args.csv, output_format=args.output_format,
        output_dir=args.output_dir, verbose=args.verbose,
        writer_opts={"max_line_width": args.max_line_width,
                     "max_line_count": args.max_line_count,
                     "max_words_per_line": args.max_words_per_line,
                     "highlight_words": args.highlight_words})
    for r in rows:
        print(f"{r['file']}: {r.get('text', '')[:80]}")
    print(args.csv)
    return 0


@command("detect-language")
def cmd_detect_language(argv) -> int:
    """Identify the spoken language of audio files (whisper
    detect_language over the first 30 s window)."""
    p = argparse.ArgumentParser(prog="audax detect-language")
    p.add_argument("files", nargs="+")
    p.add_argument("--size", default="tiny")
    p.add_argument("--ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--top", type=int, default=5,
                   help="print this many candidate languages per file")
    args = p.parse_args(argv)

    from audax.core.runtime import setup
    from audax.data.audio_io import read_audio, resample, to_mono
    from audax.infer.transcribe import Transcriber
    setup()
    params, cfg, tok = _load_whisper(args.size, args.ckpt,
                                     args.tokenizer_dir)
    tr = Transcriber(params, cfg, tok)
    sr = tr.frontend.cfg.sample_rate
    rc = 0
    for path in args.files:
        try:
            x, rate = read_audio(path)
            x = to_mono(x)
            if rate != sr:
                x = resample(x, rate, sr)
            best, probs = tr.detect(x)
            top = sorted(probs.items(), key=lambda kv: -kv[1])[: args.top]
            print(f"{os.path.basename(path)}: {best}  "
                  + "  ".join(f"{c}={p:.3f}" for c, p in top))
        except Exception as e:  # noqa: BLE001 - per-file tolerance
            print(f"{os.path.basename(path)}: error: {e}", file=sys.stderr)
            rc = 1
    return rc


@command("finetune")
def cmd_finetune(argv) -> int:
    """Whisper fine-tune on wavs + transcripts with WER tracking
    (reference: AB/fineTune.py)."""
    p = argparse.ArgumentParser(prog="audax finetune")
    p.add_argument("--audio-dir", default="")
    p.add_argument("--transcript", default=None,
                   help="shared target text (the reference's magic-word mode)")
    p.add_argument("--labels-csv", default=None,
                   help="filename,labels CSV (the mididataset.csv contract)")
    p.add_argument("--size", default="tiny")
    p.add_argument("--ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--out", default="artifacts/whisper_ft")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--lora-rank", type=int, default=-1)
    p.add_argument("--accum-steps", type=int, default=0,
                   help="gradient accumulation microbatches per step "
                        "(AB/fineTune.py:165)")
    p.add_argument("--dtype", default="",
                   choices=["", "float32", "bfloat16"],
                   help="train-step compute dtype (bf16 ~1.4x on v5e)")
    p.add_argument("--compare-csv", default="",
                   help="write before/after transcription comparison CSV")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help=">0: Polyak/EMA-average the trainable params; WER "
                        "eval + the saved checkpoint use the averaged "
                        "weights (e.g. 0.999)")
    p.add_argument("--spec-augment", action="store_true",
                   help="SpecAugment time/freq masking on train mels "
                        "(ops/augment.py); eval stays clean")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel axis size: the encoder runs "
                        "ring attention with the mel sequence sharded "
                        "over this many devices (long --chunk-seconds "
                        "windows whose activations exceed one chip); "
                        "composes with --dp, exclusive with --tp/--fsdp")
    p.add_argument("--chunk-seconds", type=float, default=30.0,
                   help="audio window (default whisper's 30 s). Shorter "
                        "windows shrink the encoder context to match — "
                        "clips like the 4 s UrbanSound corpus then stop "
                        "paying 7.5x padded-window compute; checkpoint "
                        "encoder positions are sliced accordingly")
    p.add_argument("--eval-suppress-tokens", default="-1",
                   help="suppress_tokens for the WER-eval transcriber: "
                        "'-1' = whisper's non-speech ban (speech targets); "
                        "'' = none — REQUIRED when labels contain banned "
                        "symbols like '#' in note names (mididataset.csv)")
    p.add_argument("--moment-dtype", default="",
                   choices=["", "float32", "bfloat16", "int8"],
                   help="Adam moment storage dtype (train/optim.py: bf16 "
                        "halves optimizer HBM traffic/state; gated at the "
                        "same holdout WER in results/ft_gate_*)")
    _add_mesh_flags(p)
    args = p.parse_args(argv)
    if args.sp > 1 and (args.tp > 1 or args.fsdp):
        p.error("--sp composes with --dp only (not --tp/--fsdp)")

    from audax.core.config import FineTuneConfig, MelConfig
    import jax

    sp_dp = 0
    if args.sp > 1:
        # device-count feasibility checked BEFORE checkpoint load / dataset
        # build, like the flag-exclusivity check above — an infeasible
        # --dp x --sp combo must not fail minutes into the run
        devs = jax.devices()
        sp_dp = args.dp if args.dp and args.dp > 0 else \
            max(1, len(devs) // args.sp)
        if sp_dp * args.sp > len(devs):
            p.error(f"--dp {sp_dp} x --sp {args.sp} needs "
                    f"{sp_dp * args.sp} devices; {len(devs)} available")

    from audax.core.runtime import setup
    from audax.infer.transcribe import Transcriber
    from audax.train.checkpoints import save_pytree
    from audax.train.finetune_loop import build_speech_dataset, finetune_whisper
    from audax.train.metrics_sink import MetricsSink

    setup()
    ft = FineTuneConfig.from_env()
    if args.steps:
        ft = replace(ft, max_steps=args.steps)
    if args.batch_size:
        ft = replace(ft, batch_size=args.batch_size)
    if args.lora_rank >= 0:
        ft = replace(ft, lora_rank=args.lora_rank)
    if args.accum_steps:
        ft = replace(ft, accum_steps=args.accum_steps)
    if args.dtype:
        ft = replace(ft, dtype=args.dtype)
    if args.ema_decay:
        ft = replace(ft, ema_decay=args.ema_decay)
    if args.spec_augment:
        ft = replace(ft, spec_augment=True)
    if args.moment_dtype:
        ft = replace(ft, moment_dtype=args.moment_dtype)

    params, cfg, tok = _load_whisper(args.size, args.ckpt, args.tokenizer_dir)
    mel_cfg = MelConfig.whisper(cfg.n_mels)
    if args.chunk_seconds != 30.0:
        ctx = int(args.chunk_seconds * mel_cfg.sample_rate) \
            // mel_cfg.hop_length // 2
        cfg = replace(cfg, n_audio_ctx=ctx)
        enc = dict(params["encoder"])
        if enc["pos"].shape[0] < ctx:
            raise ValueError(f"--chunk-seconds {args.chunk_seconds} needs "
                             f"{ctx} encoder positions; checkpoint has "
                             f"{enc['pos'].shape[0]}")
        enc["pos"] = enc["pos"][:ctx]
        params = {**params, "encoder": enc}
    examples = build_speech_dataset(args.audio_dir, tok, mel_cfg,
                                    transcript=args.transcript,
                                    labels_csv=args.labels_csv,
                                    chunk_seconds=args.chunk_seconds)
    if not examples:
        print("no training examples", file=sys.stderr)
        return 1

    before = None
    if args.compare_csv:
        tr0 = Transcriber(params, cfg, tok,
                          chunk_seconds=args.chunk_seconds)
        before = {ex["file"]: tr0.transcribe(ex["audio"]).text
                  for ex in examples}

    mesh, fsdp = _mesh_from_args(args)
    sp_mesh = None
    if args.sp > 1:
        import numpy as _np
        from jax.sharding import Mesh as _Mesh
        devs = jax.devices()
        dp = sp_dp
        sp_mesh = _Mesh(_np.array(devs[: dp * args.sp]).reshape(dp, args.sp),
                        ("data", "seq"))
        mesh = None
        log.info("SP mesh: %s", dict(sp_mesh.shape))
    sink = MetricsSink("whisper_ft", config=ft.asdict())
    est = (args.eval_suppress_tokens if args.eval_suppress_tokens == "-1"
           else [int(t) for t in args.eval_suppress_tokens.split(",")
                 if t.strip()])
    state, history = finetune_whisper(params, cfg, tok, examples, ft,
                                      mel_cfg=mel_cfg, sink=sink,
                                      eval_examples=examples,
                                      mesh=mesh, fsdp=fsdp, sp_mesh=sp_mesh,
                                      eval_suppress_tokens=est)
    sink.close()
    serving = history["best_params"] or state.model_params()
    if mesh is not None:
        serving = jax.device_get(serving)   # portable unsharded checkpoint
    save_pytree(args.out, serving)
    # dims sidecar (the convert-hf convention): --chunk-seconds runs carry
    # a shortened n_audio_ctx, and transcribe --ckpt / export-hf read this
    import dataclasses as _dc
    import json as _json
    with open(args.out.rstrip("/") + ".config.json", "w") as fh:
        _json.dump(_dc.asdict(cfg), fh, indent=2)
    log.success("saved fine-tuned params -> %s (best WER %.3f)", args.out,
                history["best_wer"])

    if args.compare_csv:
        import csv as _csv
        tr1 = Transcriber(serving, cfg, tok,
                          chunk_seconds=args.chunk_seconds)
        with open(args.compare_csv, "w", newline="") as fh:
            w = _csv.DictWriter(fh, fieldnames=["file", "target", "previous",
                                                "finetuned"])
            w.writeheader()
            for ex in examples:
                w.writerow({"file": ex["file"], "target": ex["text"],
                            "previous": before.get(ex["file"], ""),
                            "finetuned": tr1.transcribe(ex["audio"]).text})
        print(args.compare_csv)
    print(args.out)
    return 0


@command("classifier-proof")
def cmd_classifier_proof(argv) -> int:
    """Full UrbanSound fold protocol end-to-end on synthetic 10-class audio
    (the real dataset is not reachable here): datagen -> Parquet (fused mel)
    -> train folds 1-8 / eval 9 -> test fold 10 -> metrics JSON + confusion
    matrix PNG. The committed analogue of the reference's 64/68% accuracy
    artifacts (.charles/urbansound8k_sql.md:94)."""
    p = argparse.ArgumentParser(prog="audax classifier-proof")
    p.add_argument("--out", default="results")
    p.add_argument("--per-fold", type=int, default=20)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--model", default="transformer",
                   choices=["transformer", "cnn"])
    p.add_argument("--work-dir", default="artifacts/synth_urbansound")
    args = p.parse_args(argv)

    import json

    from audax.core.config import UrbanSoundConfig
    from audax.core.runtime import setup
    from audax.data.synth import SYNTH_CLASSES, make_synthetic_urbansound
    from audax.models.classifiers import CNNClassifier, TransformerClassifier
    from audax.data.urbansound import load_split, preprocess_to_parquet
    from audax.eval.metrics import plot_confusion_matrix
    from audax.train.loops import evaluate_classifier, fit_classifier
    from audax.train.steps import make_classifier_steps

    setup()
    root = make_synthetic_urbansound(args.work_dir, per_fold=args.per_fold)
    us = UrbanSoundConfig(dataset_root=root,
                          parquet_dir=os.path.join(args.work_dir, "pq"))
    mel = MelConfig.urbansound_v2()
    parquet = preprocess_to_parquet(us, mel)

    tc = ClassifierTrainConfig(batch_size=16, epochs=args.epochs,
                               learning_rate=3e-4)
    if args.model == "transformer":
        model = TransformerClassifier(TransformerClassifierConfig())
    else:
        model = CNNClassifier(CNNClassifierConfig())
    data = load_split(parquet, list(us.train_folds))
    ev = load_split(parquet, [us.eval_fold])
    state, history = fit_classifier(model, data, ev, tc, num_classes=10)

    test = load_split(parquet, [us.test_fold])
    _, eval_step = make_classifier_steps(model)
    m, preds = evaluate_classifier(eval_step, state, test, tc.batch_size, 10)
    os.makedirs(args.out, exist_ok=True)
    cm_path = os.path.join(args.out, "synthetic_urbansound_confusion.png")
    plot_confusion_matrix(test["y"], preds, list(SYNTH_CLASSES), cm_path,
                          title=f"{args.model} fold-10 (synthetic)")
    metrics = {"model": args.model, "per_fold": args.per_fold,
               "epochs": args.epochs,
               "test_accuracy": round(float(m["accuracy"]), 4),
               "test_f1_macro": round(float(m["f1_macro"]), 4),
               "eval_accuracy_last": round(
                   float(history["eval"][-1]["accuracy"]), 4)
               if history["eval"] else None,
               "classes": list(SYNTH_CLASSES)}
    mpath = os.path.join(args.out, "synthetic_urbansound_metrics.json")
    with open(mpath, "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics))
    return 0 if m["accuracy"] >= 0.5 else 1


@command("stream-serve")
def cmd_stream_serve(argv) -> int:
    """Live streaming-ASR WebSocket server (first-party RFC 6455 layer over
    the fixed-slot batched StreamingTranscriber)."""
    p = argparse.ArgumentParser(prog="audax stream-serve")
    p.add_argument("--size", default="base")
    p.add_argument("--ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--batch-slots", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the startup compile (first request pays it)")
    p.add_argument("--vad-threshold-db", type=float, default=None,
                   help="energy VAD: silent windows answer as empty text "
                        "without consuming a batch slot (try -45..-55)")
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from audax.cli.stream_server import serve_streaming
    from audax.core.runtime import setup
    from audax.infer.streaming import StreamingTranscriber

    setup()
    params, cfg, tok = _load_whisper(args.size, args.ckpt, args.tokenizer_dir)
    mesh, _ = _mesh_from_args(args)
    # StreamingTranscriber places params on the mesh itself (its __init__
    # calls shard_params when mesh is given) — don't double-place here
    st = StreamingTranscriber(
        params, cfg, tok, batch_slots=args.batch_slots, mesh=mesh,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        vad_threshold_db=args.vad_threshold_db)
    if not args.no_warmup:
        log.info("warming up (compiling the batch program)...")
        st.warmup()
    server = serve_streaming(st, host=args.host, port=args.port)
    log.success("streaming ASR on ws://%s:%d/ws?stream=<id>", args.host,
                args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


@command("serve")
def cmd_serve(argv) -> int:
    """REST transcription server: every in-flight HTTP request is a slot of
    ONE continuous-batching engine (slot refill mid-decode, one compiled
    chunk program; infer/continuous.py, cli/http_server.py)."""
    p = argparse.ArgumentParser(prog="audax serve")
    p.add_argument("--size", default="base")
    p.add_argument("--ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--lang", default="en")
    p.add_argument("--max-tokens", type=int, default=224)
    p.add_argument("--steps-per-sync", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV caches (serving capacity tier)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the startup compile (first request pays it)")
    p.add_argument("--max-inflight", type=int, default=0,
                   help="admission cap before 429 (default 8x slots)")
    p.add_argument("--suppress-blank", action="store_true",
                   help="ban ' '/EOT at each request's first generated "
                        "position (whisper SuppressBlank)")
    p.add_argument("--suppress-tokens", default="-1",
                   help="'-1' (default): specials + the vocab's non-speech "
                        "symbol set (same as the transcribe CLI); '' : "
                        "control specials only; comma-separated ids: "
                        "specials + those")
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from audax.cli.http_server import serve_http
    from audax.core.runtime import setup
    from audax.infer.continuous import ContinuousBatcher

    setup()
    params, cfg, tok = _load_whisper(args.size, args.ckpt, args.tokenizer_dir)
    mesh, _ = _mesh_from_args(args)
    if mesh is not None:
        # TP serving: Megatron head/ffn split over 'model', slot batch over
        # 'data' when divisible — token-equal to the replicated engine
        # (dryrun stage 12, tests/test_continuous.py)
        from audax.parallel.sharding import shard_params
        params = shard_params(params, mesh)
    cb = ContinuousBatcher(
        params, cfg, tok, slots=args.slots, lang=args.lang,
        max_new_tokens=args.max_tokens, steps_per_sync=args.steps_per_sync,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        kv_quant=args.kv_quant, suppress_blank=args.suppress_blank,
        suppress_tokens=(args.suppress_tokens
                         if args.suppress_tokens == "-1"
                         else [int(t) for t in
                               args.suppress_tokens.split(",") if t.strip()]),
        mesh=mesh)
    if not args.no_warmup:
        log.info("warming up (chunk + admit programs at every bucket)...")
        cb.warmup()
    server = serve_http(cb, host=args.host, port=args.port,
                        max_inflight=args.max_inflight or None)
    log.success("POST audio to http://%s:%d/v1/audio/transcriptions",
                args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.scheduler.shutdown()
        server.shutdown()
    return 0


@command("bench-rtf")
def cmd_bench_rtf(argv) -> int:
    """Serving real-time-factor benchmark: synthetic audio through the full
    Transcriber (frontend + encoder + KV-cached decode + fallback ladder).
    BASELINE target: whisper-base RTF <= 0.05 on one chip."""
    p = argparse.ArgumentParser(prog="audax bench-rtf")
    p.add_argument("--size", default="base")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seconds", type=float, default=120.0)
    p.add_argument("--batch-chunks", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=224)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="int8/int4 weight-only serving (models/quantize.py"
                   " / ops/int4_matmul.py)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 self+cross KV caches (whisper.QuantKV)")
    p.add_argument("--no-fallback", action="store_true",
                   help="single greedy decode per chunk (random-weight "
                   "models always fail the quality gates, so the default "
                   "measures the full 6-temperature ladder — the "
                   "worst case; trained checkpoints mostly decode once)")
    args = p.parse_args(argv)

    import json

    import jax.numpy as jnp
    import numpy as np

    from audax.core.runtime import setup
    from audax.infer.transcribe import Transcriber

    setup()
    params, cfg, tok = _load_whisper(args.size, "", "")
    tr = Transcriber(params, cfg, tok,
                     max_new_tokens=args.max_new_tokens,
                     quantize=args.quantize, kv_quant=args.kv_quant,
                     temperature_fallback=not args.no_fallback,
                     dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                     else jnp.float32)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(int(args.seconds * 16000))
             ).astype(np.float32)
    tr.transcribe(audio, batch_chunks=args.batch_chunks)   # compile warmup
    best = min((tr.transcribe(audio, batch_chunks=args.batch_chunks)
                for _ in range(args.runs)), key=lambda r: r.rtf)
    rtf = best.rtf
    # approximate achieved TFLOP/s: 2*params*tokens forward-pass rule
    # (encoder: n_audio_ctx positions per 30 s window; decoder: one full
    # forward per emitted token, token count re-derived from the text) —
    # decode is HBM-bandwidth-bound, so low MFU here is expected and the
    # number contextualizes RTF against hardware, not a utilization target
    from audax.utils.profiling import mfu
    from audax.utils.reports import param_count
    n_chunks = -(-int(args.seconds * 16000) // (30 * 16000))
    enc_tok = n_chunks * cfg.n_audio_ctx
    dec_tok = len(tok.encode(best.text)) + 6 * n_chunks
    flops = (2 * param_count(params["encoder"]) * enc_tok
             + 2 * param_count(params["decoder"]) * dec_tok)
    print(json.dumps({"metric": "whisper_rtf", "size": args.size,
                      "dtype": args.dtype + ("+" + args.quantize if args.quantize else "")
                      + ("+int8kv" if args.kv_quant else ""),
                      "fallback_ladder": not args.no_fallback,
                      "seconds": args.seconds,
                      "value": round(rtf, 5), "target": 0.05,
                      **mfu(flops, best.wall_seconds)}))
    return 0 if rtf <= 0.05 else 1


@command("bench-streaming")
def cmd_bench_streaming(argv) -> int:
    """Batched multi-stream serving throughput: N concurrent streams of
    synthetic audio through StreamingTranscriber's fixed-slot batches.
    Reports audio-seconds transcribed per wall-second = how many real-time
    streams one chip sustains (the BASELINE stretch config's capacity
    metric; the reference has no serving layer at all)."""
    p = argparse.ArgumentParser(prog="audax bench-streaming")
    p.add_argument("--size", default="base")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--windows", type=int, default=2,
                   help="30 s windows fed per stream")
    p.add_argument("--batch-slots", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=224)
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"])
    p.add_argument("--kv-quant", action="store_true")
    args = p.parse_args(argv)

    import json
    import time

    import jax.numpy as jnp
    import numpy as np

    from audax.core.runtime import setup
    from audax.infer.streaming import StreamingTranscriber

    setup()
    params, cfg, tok = _load_whisper(args.size, "", "")
    if args.quantize:
        from audax.models.quantize import quantize_tree
        params = quantize_tree(params, bits=4 if args.quantize == "int4"
                               else 8)
    st = StreamingTranscriber(
        params, cfg, tok, batch_slots=args.batch_slots,
        max_new_tokens=args.max_new_tokens, kv_quant=args.kv_quant,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    rng = np.random.default_rng(0)
    window = st.window

    def fill():
        for i in range(args.streams):
            for _ in range(args.windows):
                st.feed(f"s{i:03d}",
                        (0.1 * rng.standard_normal(window)).astype(np.float32))

    fill()
    st.drain()                                   # compile warmup
    fill()
    audio_s = args.streams * args.windows * window / 16000.0
    t0 = time.perf_counter()
    segs = st.drain()
    wall = time.perf_counter() - t0
    assert len(segs) == args.streams * args.windows
    capacity = audio_s / wall
    print(json.dumps({
        "metric": "streaming_realtime_streams_per_chip", "size": args.size,
        "dtype": args.dtype + ("+" + args.quantize if args.quantize else "")
        + ("+int8kv" if args.kv_quant else ""),
        "batch_slots": args.batch_slots, "streams": args.streams,
        "value": round(capacity, 2), "audio_seconds": audio_s,
        "wall_seconds": round(wall, 3)}))
    return 0


@command("bench-continuous")
def cmd_bench_continuous(argv) -> int:
    """Continuous-batching vs convoy scheduling on one variable-length
    workload (per-request max_tokens drawn uniformly — the shape of real
    transcript-length traffic). Convoy = the fixed-batch schedule (admit a
    full batch, drain it completely, repeat: every slot waits for the
    slowest, infer/decode.py:generate's model); continuous = slot refill
    mid-decode (infer/continuous.py). Both run the SAME compiled chunk
    program, so the speedup is pure scheduling."""
    p = argparse.ArgumentParser(prog="audax bench-continuous")
    p.add_argument("--engine", default="asr", choices=["asr", "music"],
                   help="asr: whisper ContinuousBatcher; music: two-tower "
                        "audio->ABC ContinuousGenerator (whisper-base "
                        "encoder + Qwen3-0.6B-shape decoder, constrained "
                        "decoding on — the reference's music2midi serving "
                        "shape, model.py:209-213)")
    p.add_argument("--size", default="base")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=224)
    p.add_argument("--min-new-tokens", type=int, default=16)
    p.add_argument("--steps-per-sync", type=int, default=32)
    p.add_argument("--window-seconds", type=float, default=10.0,
                   help="music engine: per-request audio window")
    p.add_argument("--lm-preset", default="qwen3-0.6b",
                   choices=["qwen3-0.6b", "tiny"],
                   help="music engine decoder shape (tiny = smoke/test)")
    p.add_argument("--kv-quant", action="store_true")
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"])
    args = p.parse_args(argv)

    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audax.core.runtime import setup
    from audax.infer.continuous import ContinuousBatcher

    setup()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    budgets = rng.integers(args.min_new_tokens, args.max_new_tokens + 1,
                           args.requests)
    if args.engine == "music":
        from audax.core.config import TwoTowerConfig, WhisperConfig
        from audax.infer.continuous import ContinuousGenerator
        from audax.models.causal_lm import CausalLMConfig
        from audax.models.two_tower import build_two_tower

        audio_cfg = {"tiny": WhisperConfig.tiny, "base": WhisperConfig.base,
                     "small": WhisperConfig.small}[args.size]()
        if args.lm_preset == "qwen3-0.6b":
            lm_cfg = CausalLMConfig(
                vocab_size=151936, d_model=1024, layers=28, heads=16,
                kv_heads=8, head_dim=128, ffn_dim=3072, qk_norm=True,
                tie_embeddings=True, rope_theta=1e6,
                max_seq=max(2048, 1 + args.max_new_tokens))
        else:
            lm_cfg = CausalLMConfig(
                vocab_size=1024, d_model=128, layers=2, heads=4,
                kv_heads=2, ffn_dim=256, qk_norm=True,
                tie_embeddings=True,
                max_seq=max(256, 1 + args.max_new_tokens))
        model = build_two_tower(TwoTowerConfig(), audio_cfg, lm_cfg,
                                lm_cfg.vocab_size, jax.random.key(0))
        if args.quantize:
            from audax.models.quantize import quantize_tree
            model = model._replace(params=quantize_tree(
                model.params, bits=4 if args.quantize == "int4" else 8))
        # constrained decoding: a realistic ABC alphabet-sized allow set
        allowed = list(range(3, 515))
        win = args.window_seconds
        audio = [(0.1 * rng.standard_normal(int(win * 16000)))
                 .astype(np.float32) for _ in range(args.requests)]

        def make():
            return ContinuousGenerator(
                model, start_id=0, end_id=1, slots=args.slots,
                window_seconds=win, max_new_tokens=args.max_new_tokens,
                temperature=0.7, steps_per_sync=args.steps_per_sync,
                dtype=dtype, allowed_ids=allowed)
    else:
        params, cfg, tok = _load_whisper(args.size, "", "")
        if args.quantize:
            from audax.models.quantize import quantize_tree
            params = quantize_tree(params, bits=4 if args.quantize == "int4"
                                   else 8)
        audio = [(0.1 * rng.standard_normal(16000)).astype(np.float32)
                 for _ in range(args.requests)]

        def make():
            return ContinuousBatcher(
                params, cfg, tok, slots=args.slots,
                max_new_tokens=args.max_new_tokens,
                steps_per_sync=args.steps_per_sync, dtype=dtype,
                kv_quant=args.kv_quant)

    def continuous(cb):
        for i in range(args.requests):
            cb.submit(f"r{i}", audio[i], max_new_tokens=int(budgets[i]))
        return cb.run()

    def convoy(cb):
        out = []
        for lo in range(0, args.requests, args.slots):
            for i in range(lo, min(lo + args.slots, args.requests)):
                cb.submit(f"r{i}", audio[i], max_new_tokens=int(budgets[i]))
            out.extend(cb.run())          # barrier: drain the whole batch
        return out

    cb = make()
    cb.warmup()                           # compile admit + chunk programs
    results = {}
    for name, fn in (("continuous", continuous), ("convoy", convoy)):
        steps0 = cb.steps_run
        t0 = time.perf_counter()
        got = fn(cb)
        wall = time.perf_counter() - t0
        assert len(got) == args.requests
        toks = sum(len(r.tokens) for r in got)
        steps = cb.steps_run - steps0
        results[name] = {"wall_s": round(wall, 3),
                         "tokens_per_s": round(toks / wall, 1),
                         "decode_steps": steps,
                         # useful tokens per slot-step — the scheduling
                         # quality metric, independent of tunnel latency
                         "slot_efficiency": round(
                             toks / (steps * args.slots), 3)}
    speedup = (results["convoy"]["wall_s"] /
               results["continuous"]["wall_s"])
    print(json.dumps({
        "metric": "continuous_batching_speedup_vs_convoy",
        "engine": args.engine,
        "size": args.size, "slots": args.slots,
        "requests": args.requests,
        "budget_range": [args.min_new_tokens, args.max_new_tokens],
        "dtype": args.dtype + ("+" + args.quantize if args.quantize else "")
        + ("+int8kv" if args.kv_quant else ""),
        "value": round(speedup, 3), **results}))
    return 0


@command("bench-speculative")
def cmd_bench_speculative(argv) -> int:
    """Speculative-decoding latency bench (single 30 s chunk, greedy).
    Reports the acceptance-rate SPECTRUM honestly: random-weight draft
    ~never agrees with a random-weight target (floor = verify overhead),
    a self-draft always agrees (ceiling = K-token verify amortisation);
    a real distilled draft lands between (~70-85% acceptance for speech).
    Output is token-exact vs plain greedy in all cases (tested)."""
    p = argparse.ArgumentParser(prog="audax bench-speculative")
    p.add_argument("--size", default="base")
    p.add_argument("--draft-size", default="tiny")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--spec-tokens", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=224)
    p.add_argument("--kv-quant", action="store_true")
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=["int8", "int4"],
                   help="int8/int4 weight-only target (draft stays float)")
    args = p.parse_args(argv)

    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audax.core.runtime import setup
    from audax.infer.decode import generate
    from audax.infer.speculative import generate_speculative
    from audax.models.whisper import encode, init_whisper_params

    setup()
    params, cfg, tok = _load_whisper(args.size, "", "")
    if args.quantize:
        from audax.models.quantize import quantize_tree
        params = quantize_tree(params, bits=4 if args.quantize == "int4"
                               else 8)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    import dataclasses

    dcfg = _whisper_preset(args.draft_size)
    # draft must share the target's token space (real deployments pair a
    # distilled draft with the same tokenizer, e.g. large-v3 + turbo)
    dcfg = dataclasses.replace(dcfg, vocab_size=cfg.vocab_size)
    draft = init_whisper_params(dcfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((1, 30 * 16000))).astype(np.float32)
    from audax.frontend import LogMelFrontend
    mel = LogMelFrontend.whisper(cfg.n_mels)(jnp.asarray(audio))
    dmel = (mel if dcfg.n_mels == cfg.n_mels
            else LogMelFrontend.whisper(dcfg.n_mels)(jnp.asarray(audio)))
    enc = encode(params, cfg, mel, dtype)
    denc = encode(draft, dcfg, dmel, dtype)
    prompt = jnp.asarray([tok.sot_sequence(lang="en", timestamps=False)],
                         jnp.int32)
    max_len = prompt.shape[1] + args.max_new_tokens
    sup = jnp.asarray([i for i in tok.special_ids() if i != tok.eot],
                      jnp.int32)

    def timed(fn, reps=3):
        fn()                                     # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out.lengths)              # host sync through result
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_plain, ref = timed(lambda: generate(
        params, cfg, enc, prompt, max_len=max_len, eos_id=tok.eot,
        suppress=sup, dtype=dtype, kv_quant=args.kv_quant))
    t_draft, _ = timed(lambda: generate(
        draft, dcfg, denc, prompt, max_len=max_len, eos_id=tok.eot,
        suppress=sup, dtype=dtype))
    t_floor, o1 = timed(lambda: generate_speculative(
        draft, params, dcfg, cfg, denc, enc, prompt, max_len=max_len,
        eos_id=tok.eot, spec_tokens=args.spec_tokens, suppress=sup,
        dtype=dtype, kv_quant=args.kv_quant))
    # self-draft = acceptance 1.0 with a full-cost draft; subtracting the
    # target's own per-token cost isolates the span-verify overhead, from
    # which the cheap-draft ceiling follows: ceil = t_draft + t_span/K
    t_self, o2 = timed(lambda: generate_speculative(
        params, params, cfg, cfg, enc, enc, prompt, max_len=max_len,
        eos_id=tok.eot, spec_tokens=args.spec_tokens, suppress=sup,
        dtype=dtype, kv_quant=args.kv_quant))
    n = int(ref.lengths[0])
    # exactness holds in exact arithmetic (tests/test_speculative.py, f32);
    # in bf16 the span-vs-step matmul tiling can flip argmax at near-ties,
    # which random weights hit constantly — report the agreement rate
    agree = min(
        float((np.asarray(o.tokens[0, :n])
               == np.asarray(ref.tokens[0, :n])).mean()) for o in (o1, o2))
    tok_plain = t_plain / n
    tok_draft = t_draft / n
    span_per_tok = max(t_self / n - tok_plain, 0.0)   # verify amortised/K
    ceil_tok = tok_draft + span_per_tok
    print(json.dumps({
        "metric": "speculative_decode_ms_per_token", "size": args.size,
        "draft": args.draft_size,
        "dtype": args.dtype + ("+" + args.quantize if args.quantize else "")
        + ("+int8kv" if args.kv_quant else ""),
        "spec_tokens": args.spec_tokens, "tokens": n,
        "plain": round(tok_plain * 1e3, 3),
        "draft_alone": round(tok_draft * 1e3, 3),
        "floor_random_draft": round(t_floor / n * 1e3, 3),
        "ceiling_full_acceptance": round(ceil_tok * 1e3, 3),
        "ceiling_speedup": round(tok_plain / max(ceil_tok, 1e-9), 2),
        "greedy_agreement": round(agree, 4)}))
    return 0


@command("bench-train")
def cmd_bench_train(argv) -> int:
    """Fine-tune step throughput on the chip: jitted seq2seq train step
    (optionally LoRA) over 30 s windows — the BASELINE north-star config
    ('LoRA fine-tuning runs as pjit data-parallel over ICI')."""
    p = argparse.ArgumentParser(prog="audax bench-train")
    p.add_argument("--size", default="tiny")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--label-len", type=int, default=32)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (master weights stay f32; the "
                   "synthetic fine-tune proof validates bf16 WER parity)")
    p.add_argument("--remat", default="full",
                   choices=["full", "dots", "none"],
                   help="gradient checkpointing: full recompute / save "
                   "matmul outputs / off")
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audax.core.config import FineTuneConfig
    from audax.core.runtime import setup
    from audax.train.seq2seq import (collate_seq2seq, init_finetune,
                                     make_finetune_step)
    from audax.utils.profiling import mfu

    setup()
    params, cfg, tok = _load_whisper(args.size, "", "")
    mesh, fsdp = _mesh_from_args(args)
    if mesh is not None:
        from audax.parallel.sharding import shard_params
        params = shard_params(params, mesh)
    ft = FineTuneConfig(learning_rate=1e-4, warmup_steps=1, max_steps=10,
                        lora_rank=args.lora_rank)
    state = init_finetune(params, ft)
    if mesh is not None and fsdp:
        from audax.parallel.fsdp import fsdp_shard_state
        state = fsdp_shard_state(state, mesh)
    step = make_finetune_step(
        cfg, remat={"full": True, "dots": "dots", "none": False}[args.remat],
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)

    rng = np.random.default_rng(0)
    b = args.batch_size
    mel = jnp.asarray(rng.standard_normal(
        (b, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    rows = [list(rng.integers(3, cfg.vocab_size - 1, args.label_len))
            for _ in range(b)]
    lab = collate_seq2seq(rows, decoder_start_id=1)
    batch = {"mel": mel,
             "decoder_input_ids": jnp.asarray(lab["decoder_input_ids"]),
             "labels": jnp.asarray(lab["labels"])}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch = {k: jax.device_put(v, NamedSharding(
            mesh, P("data", *([None] * (v.ndim - 1)))))
            for k, v in batch.items()}

    @jax.jit
    def checksum(m):
        return m["loss"]

    # MODEL FLOPs are analytic (utils/flops.py): XLA's cost_analysis
    # counts a lax.scan body ONCE, so the scanned layer stack under-counts
    # by ~the layer count (measured: whisper-small encoder reports ~1
    # layer's FLOPs) — every MFU built on it was understated ~10x. The
    # analytic count divides by the mesh size for the per-chip rate.
    # AOT-compile once and execute the SAME executable (an AOT
    # .lower().compile() does not populate the jit call cache — calling
    # `step` afterwards would compile the whisper step a second time,
    # minutes over the tunnel).
    from audax.utils.flops import whisper_train_step_flops
    compiled = step.lower(state, batch).compile()
    flops = whisper_train_step_flops(
        cfg, b, int(batch["decoder_input_ids"].shape[1]),
        remat=args.remat, lora=args.lora_rank > 0) \
        / (mesh.size if mesh is not None else 1)
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
    except Exception:
        xla_flops = 0.0
    step = compiled

    state, m = step(state, batch)
    np.asarray(checksum(m))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch)
    np.asarray(checksum(m))                          # 4-byte sync
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "metric": "finetune_examples_per_sec", "size": args.size,
        "lora_rank": args.lora_rank, "batch_size": b, "dtype": args.dtype,
        "value": round(b / dt, 2), "sec_per_step": round(dt, 4),
        "audio_seconds_per_sec": round(b * 30.0 / dt, 1),
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "fsdp": bool(fsdp), **mfu(flops, dt),
        "xla_counted_tflops": round(xla_flops / dt / 1e12, 2)}))
    return 0


@command("memo2wav")
def cmd_memo2wav(argv) -> int:
    """Batch-convert voice memos (m4a/mp3/...) to 16 kHz mono 16-bit WAV
    (reference: AB/memoToWav.py — in-process decode, no ffmpeg subprocess)."""
    p = argparse.ArgumentParser(prog="audax memo2wav")
    p.add_argument("--src-dir", required=True)
    p.add_argument("--dst-dir", required=True)
    p.add_argument("--rate", type=int, default=16000)
    args = p.parse_args(argv)

    from audax.data.audio_io import memo_to_wav
    exts = (".m4a", ".mp4", ".mp3", ".ogg", ".flac", ".webm", ".wav")
    n = 0
    for name in sorted(os.listdir(args.src_dir)):
        if not name.lower().endswith(exts):
            continue
        src = os.path.join(args.src_dir, name)
        try:
            dst = memo_to_wav(src, args.dst_dir, rate=args.rate)
            log.info("%s -> %s", name, dst)
            n += 1
        except Exception as e:          # per-file tolerance, like the ref
            log.warning("skip %s: %s", name, e)
    log.success("converted %d file(s) -> %s", n, args.dst_dir)
    return 0 if n else 1


@command("finetune-proof")
def cmd_finetune_proof(argv) -> int:
    """Self-contained synthetic fine-tune proof: datagen -> BPE -> random
    init -> before/after transcription CSV with WER drop (the committed
    analogue of the reference's AB/transcriptions2.csv artifact)."""
    p = argparse.ArgumentParser(prog="audax finetune-proof")
    p.add_argument("--out", default="results")
    p.add_argument("--items", type=int, default=16)
    p.add_argument("--notes", type=int, default=3)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--chunk-seconds", type=float, default=6.0)
    p.add_argument("--d-model", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--holdout-items", type=int, default=6,
                   help="unseen clips (disjoint seed) scored separately — "
                        "the generalization column")
    p.add_argument("--augment", action="store_true",
                   help="velocity/gain/noise datagen jitter + SpecAugment "
                        "on train batches (holdout stays clean)")
    p.add_argument("--moment-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="Adam moment storage dtype (train/optim.py) — the "
                        "quality gate for the low-precision default")
    args = p.parse_args(argv)

    import json

    from audax.core.runtime import setup
    from audax.train.finetune_loop import midi_finetune_proof
    setup()
    out = midi_finetune_proof(
        args.out, num_items=args.items, notes_per_item=args.notes,
        steps=args.steps, chunk_seconds=args.chunk_seconds,
        d_model=args.d_model, layers=args.layers,
        holdout_items=args.holdout_items, augment=args.augment,
        moment_dtype=args.moment_dtype)
    print(json.dumps({k: out[k] for k in
                      ("wer_before", "wer_after", "holdout_wer_before",
                       "holdout_wer_after", "csv", "metrics")}))
    return 0 if out["wer_after"] < out["wer_before"] else 1


@command("music-proof")
def cmd_music_proof(argv) -> int:
    """Self-contained two-tower learning proof: synthetic MIDI corpus ->
    4-stage pipeline -> random-init two-tower -> train -> note-level F1
    before/after with a generated-vs-target ABC CSV (the working-model
    evidence the reference's music2midi never produced)."""
    p = argparse.ArgumentParser(prog="audax music-proof")
    p.add_argument("--out", default="results")
    p.add_argument("--items", type=int, default=12)
    p.add_argument("--notes", type=int, default=3)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--chunk-seconds", type=float, default=3.0)
    p.add_argument("--holdout-items", type=int, default=4,
                   help="unseen melodies (disjoint draws) scored "
                        "separately — the generalization column")
    p.add_argument("--pretrain-encoder-steps", type=int, default=600,
                   help="pretrain the frozen audio tower on a note-name "
                        "seq2seq task first (the hubless stand-in for the "
                        "reference's frozen PRETRAINED whisper); 0 = "
                        "random frozen encoder (memorization-only)")
    p.add_argument("--pretrain-items", type=int, default=64)
    p.add_argument("--augment", action="store_true",
                   help="SpecAugment in both training stages + pretrain "
                        "datagen jitter (holdout stays clean)")
    p.add_argument("--pretrain-lm-steps", type=int, default=0,
                   help=">0: pretrain the decoder LM on a large disjoint "
                        "synthetic ABC corpus first (the reference's "
                        "pretrained-Qwen design, music2midi/model.py:"
                        "209-224) and start the two-tower from it")
    p.add_argument("--pretrain-lm-items", type=int, default=256,
                   help="melodies in the LM-pretraining ABC corpus")
    p.add_argument("--lm-ckpt", default="",
                   help="EXTERNAL pretrained decoder checkpoint (train-lm "
                        "output); overrides --pretrain-lm-steps")
    p.add_argument("--lm-tokenizer-dir", default="",
                   help="BPE dir the --lm-ckpt was trained with "
                        "(required with --lm-ckpt)")
    p.add_argument("--max-poly", type=int, default=1,
                   help=">1: polyphonic corpus — events become chords of "
                        "up to this many pitches ([CEG] through the whole "
                        "learned loop); the reference's target corpus is "
                        "polyphonic MIDI (music2midi/README.md:28-90)")
    p.add_argument("--notes-max", type=int, default=0,
                   help="> --notes: variable per-melody note count drawn "
                        "from [notes, notes-max]")
    p.add_argument("--eval-items", type=int, default=0,
                   help=">0: score train-set F1 on this many sampled "
                        "items (holdout eval is always complete) — at "
                        "1k+ items full train-set generation costs more "
                        "chip time than the training itself")
    p.add_argument("--model-scale", type=float, default=1.0,
                   help="width multiplier for both towers (head_dim "
                        "preserved) — capacity experiments")
    args = p.parse_args(argv)
    if args.lm_ckpt and not args.lm_tokenizer_dir:
        p.error("--lm-ckpt requires --lm-tokenizer-dir")

    import json

    from audax.core.runtime import setup
    from audax.train.two_tower_loop import music_transcription_proof
    setup()
    lm_params = lm_cfg = bpe_override = None
    if args.lm_ckpt:
        from audax.models.causal_lm import CausalLMConfig
        from audax.symbolic.bpe import BPE
        from audax.train.checkpoints import load_pytree
        lm_params = load_pytree(args.lm_ckpt)
        bpe_override = BPE.load(args.lm_tokenizer_dir)
        cfg_json = None
        for d in (args.lm_ckpt, os.path.dirname(args.lm_ckpt.rstrip("/"))):
            c = os.path.join(d, "config.json")
            if os.path.exists(c):
                cfg_json = json.load(open(c))
                break
        if cfg_json is None:
            p.error(f"no config.json sidecar next to {args.lm_ckpt}")
        lm_cfg = CausalLMConfig(**cfg_json)
    out = music_transcription_proof(
        args.out, num_items=args.items, notes_per_item=args.notes,
        epochs=args.epochs, chunk_seconds=args.chunk_seconds,
        holdout_items=args.holdout_items,
        pretrain_encoder_steps=args.pretrain_encoder_steps,
        pretrain_items=args.pretrain_items, augment=args.augment,
        pretrain_lm_steps=args.pretrain_lm_steps,
        pretrain_lm_items=args.pretrain_lm_items,
        lm_params=lm_params, lm_cfg_override=lm_cfg,
        bpe_override=bpe_override,
        max_poly=args.max_poly, notes_max=args.notes_max,
        eval_items=args.eval_items, model_scale=args.model_scale)
    print(json.dumps({"before": out["before"], "after": out["after"],
                      "holdout_before": out["holdout_before"],
                      "holdout_after": out["holdout_after"],
                      "csv": out["csv"], "metrics": out["metrics"]}))
    # pass/fail keys on HOLDOUT improvement when a holdout exists — the
    # train-set criterion is only optimizer evidence (the round-2
    # memorization lesson, applied to the exit code too)
    if args.holdout_items > 0 and out["holdout_after"] is not None:
        return 0 if (out["holdout_after"].get("note_f1", 0.0)
                     > out["holdout_before"].get("note_f1", 0.0)) else 1
    return 0 if (out["after"].get("note_f1", 0.0)
                 > out["before"].get("note_f1", 0.0)) else 1


@command("data-quality")
def cmd_data_quality(argv) -> int:
    """Dataset quality report (reference SQL cookbooks as callable checks)."""
    p = argparse.ArgumentParser(prog="audax data-quality")
    p.add_argument("--parquet", required=True)
    p.add_argument("--kind", default="urbansound",
                   choices=["urbansound", "music"])
    args = p.parse_args(argv)
    from audax.data.quality import (format_report, music_quality_report,
                                    urbansound_quality_report)
    fn = (urbansound_quality_report if args.kind == "urbansound"
          else music_quality_report)
    print(format_report(fn(args.parquet), f"{args.kind} quality"))
    return 0


@command("demo")
def cmd_demo(argv) -> int:
    """Record-and-compare browser demo (reference: AB/UI/Asmo.py)."""
    p = argparse.ArgumentParser(prog="audax demo")
    p.add_argument("--size", default="tiny")
    p.add_argument("--ckpt", default="")
    p.add_argument("--ft-ckpt", default="")
    p.add_argument("--tokenizer-dir", default="")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--ft-steps", type=int, default=50,
                   help="steps for the UI's Finetune button "
                        "(AB/fineTune.py:175 used 50)")
    p.add_argument("--ft-lora-rank", type=int, default=4,
                   help="LoRA rank for the UI fine-tune (0 = full)")
    args = p.parse_args(argv)
    from audax.cli.demo_ui import serve
    from audax.infer.transcribe import Transcriber
    params, cfg, tok = _load_whisper(args.size, args.ckpt, args.tokenizer_dir)
    tr = Transcriber(params, cfg, tok)
    ft_tr = None
    if args.ft_ckpt:
        ft_params, _, _ = _load_whisper(args.size, args.ft_ckpt,
                                        args.tokenizer_dir)
        ft_tr = Transcriber(ft_params, cfg, tok)
    server = serve(tr, ft_tr, port=args.port, host=args.host,
                   ft_steps=args.ft_steps, ft_lora_rank=args.ft_lora_rank)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


#: decoder dims per --lm-size: (d_model, layers, heads, kv_heads). Shared
#: by train-lm / train-music / infer-music so a pretrained LM checkpoint
#: always matches the two-tower that loads it.
_LM_DIMS = {"tiny": (128, 4, 4, 2), "small": (256, 6, 8, 4),
            "base": (512, 12, 8, 4)}


def _lm_preset(size: str, vocab_size: int):
    from audax.models.causal_lm import CausalLMConfig
    d, layers, heads, kv = _LM_DIMS[size]
    return CausalLMConfig(vocab_size=vocab_size, d_model=d, layers=layers,
                          heads=heads, kv_heads=kv)


@command("train-lm")
def cmd_train_lm(argv) -> int:
    """Pretrain a Qwen-family causal LM on a text corpus.

    The reference's music decoder is a hub-downloaded pretrained Qwen
    (music2midi/model.py:209-213); this is the hubless counterpart —
    e.g. pretrain on the ABC corpus from the gentokens stages, then
    ``train-music --lm-ckpt <out-dir>/best`` starts the two-tower from a
    music-aware decoder instead of random init."""
    p = argparse.ArgumentParser(prog="audax train-lm")
    p.add_argument("--corpus", nargs="+", required=True,
                   help="text files or directories (*.txt/*.abc) to train on")
    p.add_argument("--tokenizer-dir", required=True,
                   help="BPE dir (symbolic/bpe.py format, e.g. from "
                        "gentokens-bpe)")
    p.add_argument("--out-dir", default="artifacts/lm")
    p.add_argument("--lm-size", default="small",
                   choices=sorted(_LM_DIMS))
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--moe-experts", type=int, default=0,
                   help=">0 pretrains a Qwen3-MoE-family decoder: N experts "
                        "(ragged impl) with the Switch load-balancing aux "
                        "loss; see --moe-top-k/--moe-ffn-dim")
    p.add_argument("--moe-top-k", type=int, default=2)
    p.add_argument("--moe-ffn-dim", type=int, default=0,
                   help="per-expert FFN width (default: dense ffn_dim / "
                        "top_k — iso-FLOPs with the dense preset)")
    p.add_argument("--remat", default="", choices=["", "full", "dots"],
                   help="per-layer gradient checkpointing (bigger "
                        "batch/seq-len in 16 GB; models/whisper."
                        "_remat_body)")
    p.add_argument("--moment-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="Adam moment storage dtype (train/optim.py)")
    p.add_argument("--seed", type=int, default=0)
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from audax.core.runtime import setup as _setup
    from audax.models.causal_lm import init_causal_lm
    from audax.symbolic.bpe import BPE
    from audax.train.lm import LMTrainConfig, fit_lm
    from audax.train.metrics_sink import MetricsSink

    _setup()
    bpe = BPE.load(args.tokenizer_dir)
    paths = []
    for c in args.corpus:
        if os.path.isdir(c):
            paths.extend(sorted(os.path.join(c, f) for f in os.listdir(c)
                                if f.endswith((".txt", ".abc"))))
        else:
            paths.extend(sorted(glob.glob(c)) or [c])
    ids: list = []
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as fh:
            ids.extend(bpe.encode(fh.read()))
        ids.extend(bpe.encode("\n\n"))          # document separator
    log.info("corpus: %d files -> %d tokens (vocab %d)", len(paths),
             len(ids), len(bpe))
    cfg = _lm_preset(args.lm_size, len(bpe))
    if args.moe_experts:
        cfg = replace(cfg, num_experts=args.moe_experts,
                      experts_per_tok=args.moe_top_k,
                      moe_ffn_dim=args.moe_ffn_dim
                      or max(cfg.ffn_dim // args.moe_top_k, 16))
    train_cfg = LMTrainConfig(
        learning_rate=args.lr, max_steps=args.steps,
        batch_size=args.batch_size, seq_len=args.seq_len,
        accum_steps=args.accum_steps, dtype=args.dtype,
        eval_every=args.eval_every, remat=args.remat,
        moment_dtype=args.moment_dtype, seed=args.seed)
    params = init_causal_lm(cfg, jax.random.key(args.seed))
    sink = MetricsSink("lm", config={"model": cfg.__dict__.copy(),
                                     "train": train_cfg.__dict__.copy()})
    mesh, fsdp = _mesh_from_args(args)
    _, history = fit_lm(params, cfg, train_cfg, np.asarray(ids, np.int32),
                        ckpt_dir=args.out_dir, sink=sink,
                        mesh=mesh, fsdp=fsdp)
    sink.close()
    if history:
        last = history[-1]
        print({k: round(v, 4) for k, v in last.items()})
    print(args.out_dir)
    return 0


@command("train-music")
def cmd_train_music(argv) -> int:
    """Two-tower audio->ABC training (reference: music2midi/train.py main)."""
    p = argparse.ArgumentParser(prog="audax train-music")
    p.add_argument("--parquet", required=True)
    p.add_argument("--tokenizer-dir", required=True)
    p.add_argument("--ckpt-dir", default="artifacts/two_tower")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--accum-steps", type=int, default=0,
                   help="gradient accumulation microbatches per step")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest epoch checkpoint in "
                        "--ckpt-dir (params + optimizer state + step)")
    p.add_argument("--chunk-seconds", type=float, default=10.0)
    p.add_argument("--note-eval-every", type=int, default=0,
                   help="run note-level P/R/F1 generation eval every N epochs")
    p.add_argument("--lm-size", default="small",
                   choices=sorted(_LM_DIMS))
    p.add_argument("--lm-ckpt", default="",
                   help="pretrained decoder weights from `train-lm` (orbax "
                        "path, e.g. artifacts/lm/best) — the reference "
                        "starts from a pretrained Qwen; this is the hubless "
                        "equivalent. Dims must match --lm-size")
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import jax
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.core.runtime import setup as _setup
    from audax.data.music_dataset import MusicDataset
    from audax.models.two_tower import build_two_tower
    from audax.symbolic.bpe import BPE
    from audax.train.metrics_sink import MetricsSink
    from audax.train.two_tower_loop import fit_two_tower
    from audax.utils.reports import TWO_TOWER_DIAGRAM, model_report

    _setup()
    tt = TwoTowerConfig.from_env()
    if args.epochs:
        tt = replace(tt, epochs=args.epochs)
    if args.batch_size:
        tt = replace(tt, batch_size=args.batch_size)
    if args.accum_steps:
        tt = replace(tt, accum_steps=args.accum_steps)

    lm_cfg = _lm_preset(args.lm_size, 2048)
    audio_cfg = _whisper_preset(tt.whisper_size)

    bpe = BPE.load(args.tokenizer_dir)
    ds = MusicDataset(args.parquet, bpe, max_tokens=tt.max_target_tokens)
    lm_params = None
    if args.lm_ckpt:
        from audax.train.checkpoints import load_pytree
        lm_params = load_pytree(args.lm_ckpt)
        lm_vocab = lm_params["embed"].shape[0]
        lm_cfg = replace(lm_cfg, vocab_size=lm_vocab)
        log.info("pretrained decoder: %s (vocab %d)", args.lm_ckpt, lm_vocab)
    model = build_two_tower(tt, audio_cfg, lm_cfg, len(bpe),
                            jax.random.key(tt.seed), lm_params=lm_params)
    print(model_report(
        {"whisper(frozen)": model.audio_params,
         "adapter": model.params["adapter"], "lm": model.params["lm"]},
        trainable={"adapter": True, "lm": True},
        diagram=TWO_TOWER_DIAGRAM))
    mesh, fsdp = _mesh_from_args(args)
    sink = MetricsSink("two_tower", config=tt.asdict())
    state, history = fit_two_tower(model, ds, chunk_seconds=args.chunk_seconds,
                                   sink=sink, ckpt_dir=args.ckpt_dir,
                                   note_eval_every=args.note_eval_every,
                                   resume=args.resume, mesh=mesh, fsdp=fsdp)
    sink.close()
    print(args.ckpt_dir)
    return 0


@command("infer-music")
def cmd_infer_music(argv) -> int:
    """Audio -> ABC generation (reference: music2midi/inference.py main)."""
    p = argparse.ArgumentParser(prog="audax infer-music")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--wav", help="one file (single fixed-batch generate)")
    src.add_argument("--wav-dir", help="directory of .wav files served "
                     "through the continuous-batching generator "
                     "(slot refill; infer/continuous.py)")
    p.add_argument("--tokenizer-dir", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--chunk-seconds", type=float, default=10.0)
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0,
                   help="sampling seed (per-request reproducible streams)")
    p.add_argument("--slots", type=int, default=4,
                   help="concurrent decode slots (--wav-dir mode)")
    p.add_argument("--lm-size", default="small",
                   choices=sorted(_LM_DIMS))
    p.add_argument("--lm-ckpt", default="",
                   help="pretrained decoder weights from `train-lm` — must "
                        "match what training used (trainable-only "
                        "checkpoints rebuild the frozen layers from here)")
    p.add_argument("--constrained", action="store_true",
                   help="restrict sampling to the tokenizer's added/special "
                        "ABC token set (the reference's abandoned 'mask out "
                        "non-ABC tokens' variant, model.py:346-417, working;"
                        " meaningful when a general-text vocab was extended "
                        "with ABC tokens)")
    p.add_argument("--prompt", default="",
                   help="teacher-forced ABC header after <abc_start> (e.g. "
                        "'X:1\\nK:C\\n'; reference model.py:363-366). "
                        "Single-wav mode only")
    _add_mesh_flags(p)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.core.runtime import setup as _setup
    from audax.data.audio_io import read_wav, resample, to_mono
    from audax.frontend import LogMelFrontend, pad_or_trim
    from audax.models.two_tower import build_two_tower
    from audax.symbolic.bpe import BPE
    from audax.train.two_tower import load_trainable_checkpoint

    _setup()
    tt = TwoTowerConfig.from_env()
    lm_cfg = _lm_preset(args.lm_size, 2048)
    audio_cfg = _whisper_preset(tt.whisper_size)
    bpe = BPE.load(args.tokenizer_dir)
    lm_params = None
    if args.lm_ckpt:
        from audax.train.checkpoints import load_pytree
        lm_params = load_pytree(args.lm_ckpt)
        lm_cfg = replace(lm_cfg, vocab_size=lm_params["embed"].shape[0])
    model = build_two_tower(tt, audio_cfg, lm_cfg, len(bpe),
                            jax.random.key(0), lm_params=lm_params)
    model = load_trainable_checkpoint(args.ckpt, model)
    start = bpe.vocab.get("<abc_start>", 0)
    end = bpe.vocab.get("<abc_end>", 1)
    sr = 16000

    def load(path):
        x, rate = read_wav(path)
        x = to_mono(x)
        if rate != sr:
            x = resample(x, rate, sr)
            log.warning("%s: resampled %d -> %d Hz", path, rate, sr)
        return x

    allowed = bpe.added_token_ids() if args.constrained else None
    mesh, _ = _mesh_from_args(args)
    if mesh is not None:
        # same layout as fit_two_tower's mesh path: Qwen decoder +
        # frozen encoder Megatron-sharded, adapter by the default rules
        from audax.parallel.sharding import (CAUSAL_LM_TP_RULES,
                                             WHISPER_TP_RULES, shard_params)
        model = model._replace(
            audio_params=shard_params(model.audio_params, mesh,
                                      rules=WHISPER_TP_RULES),
            params={"adapter": shard_params(model.params["adapter"], mesh),
                    "lm": shard_params(model.params["lm"], mesh,
                                       rules=CAUSAL_LM_TP_RULES)})
    if args.wav_dir:
        from audax.infer.continuous import ContinuousGenerator
        g = ContinuousGenerator(
            model, bpe=bpe, start_id=start, end_id=end, slots=args.slots,
            window_seconds=args.chunk_seconds,
            max_new_tokens=args.max_tokens - 1,
            temperature=args.temperature, allowed_ids=allowed, mesh=mesh)
        names = sorted(f for f in os.listdir(args.wav_dir)
                       if f.lower().endswith(".wav"))
        for i, name in enumerate(names):
            g.submit(name, load(os.path.join(args.wav_dir, name)),
                     seed=args.seed + i)
        results = {r.request_id: r for r in g.run()}
        for name in names:                    # stable file order
            r = results[name]
            print(f"== {r.request_id} (avg_logprob {r.avg_logprob:.3f})")
            print(r.text)
        return 0

    x = load(args.wav)
    frontend = LogMelFrontend.whisper(audio_cfg.n_mels)
    n = int(args.chunk_seconds * sr)
    mel = frontend(pad_or_trim(jnp.asarray(x[:n]), n)[None])
    enc = model.encode_audio(mel)
    prompt_ids = bpe.encode(args.prompt) if args.prompt else None
    tokens, lengths = model.generate(
        model.params, enc, start_id=start, end_id=end,
        max_len=args.max_tokens, temperature=args.temperature,
        rng=jax.random.key(0), allowed_ids=allowed, prompt_ids=prompt_ids)
    ids = np.asarray(tokens)[0, 1: int(np.asarray(lengths)[0]) - 1]
    print(bpe.decode([int(i) for i in ids], skip_specials=True))
    return 0


@command("midi2wav")
def cmd_midi2wav(argv) -> int:
    p = argparse.ArgumentParser(prog="audax midi2wav")
    p.add_argument("--midi-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--chunk-seconds", type=float, default=0.0)
    p.add_argument("--soundfont", default="")
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args(argv)
    from audax.core.config import DataGenConfig
    from audax.data.music_dataset import stage_midi2wav
    cfg = DataGenConfig.from_env()
    if args.chunk_seconds:
        cfg = replace(cfg, chunk_duration_s=args.chunk_seconds)
    if args.soundfont:
        cfg = replace(cfg, soundfont=args.soundfont)
    stage_midi2wav(args.midi_dir, args.out_dir, cfg,
                   workers=args.workers or None)
    return 0


@command("abc2wav")
def cmd_abc2wav(argv) -> int:
    """ABC notation -> rendered audio in one step — the reference's
    `--playabc` surface (.charles/music2midi/test/music21_tests.py:58-60:
    abc text -> music21 stream -> MIDI -> fluidsynth playback). Composes
    the in-framework pieces: abc_parse.abc_to_midi + synth.render_midi +
    audio_io.write_wav."""
    p = argparse.ArgumentParser(prog="audax abc2wav")
    p.add_argument("abc", nargs="?", default="",
                   help="path to an .abc file ('-' or omitted: read stdin)")
    p.add_argument("--abc-text", default="",
                   help="inline ABC string instead of a file")
    p.add_argument("--out", required=True, help="output .wav path")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--soundfont", default="",
                   help="SF2 soundfont (default: the built-in synth voice)")
    p.add_argument("--program", type=int, default=0)
    args = p.parse_args(argv)
    from audax.data.audio_io import write_wav
    from audax.data.synth import render_midi
    from audax.symbolic.abc_parse import abc_to_midi
    if args.abc_text:
        text = args.abc_text
    elif args.abc and args.abc != "-":
        text = open(args.abc).read()
    else:
        text = sys.stdin.read()
    mf = abc_to_midi(text)
    audio = render_midi(mf, args.sample_rate,
                        soundfont=args.soundfont or None,
                        program=args.program)
    write_wav(args.out, audio, args.sample_rate)
    log.success("rendered %d notes -> %s (%.2f s)", len(mf.notes), args.out,
                len(audio) / args.sample_rate)
    print(args.out)
    return 0


@command("midi2abc")
def cmd_midi2abc(argv) -> int:
    p = argparse.ArgumentParser(prog="audax midi2abc")
    p.add_argument("--midi-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args(argv)
    from audax.data.music_dataset import stage_midi2abc
    stage_midi2abc(args.midi_dir, args.out_dir, workers=args.workers or None)
    return 0


@command("gentokens-raw")
def cmd_gentokens_raw(argv) -> int:
    p = argparse.ArgumentParser(prog="audax gentokens-raw")
    p.add_argument("--abc-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    from audax.data.music_dataset import stage_gentokens_raw
    stage_gentokens_raw(args.abc_dir, args.out)
    return 0


@command("gentokens-bpe")
def cmd_gentokens_bpe(argv) -> int:
    p = argparse.ArgumentParser(prog="audax gentokens-bpe")
    p.add_argument("--abc-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--vocab-size", type=int, default=2000)
    args = p.parse_args(argv)
    from audax.data.music_dataset import stage_gentokens_bpe
    stage_gentokens_bpe(args.abc_dir, args.out_dir, args.vocab_size)
    return 0


@command("genparquet")
def cmd_genparquet(argv) -> int:
    p = argparse.ArgumentParser(prog="audax genparquet")
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--abc-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    from audax.data.music_dataset import stage_genparquet
    stage_genparquet(args.wav_dir, args.abc_dir, args.out)
    return 0


@command("make-midi-dataset")
def cmd_make_midi_dataset(argv) -> int:
    p = argparse.ArgumentParser(prog="audax make-midi-dataset")
    p.add_argument("--num-items", type=int, default=0)
    p.add_argument("--out-dir", default="")
    p.add_argument("--soundfont", default="")
    args = p.parse_args(argv)
    from audax.core.config import DataGenConfig
    from audax.data.synth import make_midi_dataset
    cfg = DataGenConfig.from_env()
    if args.num_items:
        cfg = replace(cfg, num_items=args.num_items)
    if args.out_dir:
        cfg = replace(cfg, out_dir=args.out_dir)
    if args.soundfont:
        cfg = replace(cfg, soundfont=args.soundfont)
    print(make_midi_dataset(cfg))
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    load_dotenv()
    if not argv or argv[0] in ("-h", "--help"):
        # no runtime init just to print the command list
        print("audax commands:\n  " + "\n  ".join(sorted(_COMMANDS)))
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; available: {', '.join(sorted(_COMMANDS))}",
              file=sys.stderr)
        return 2
    from audax.core.runtime import setup
    setup()
    return _COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
