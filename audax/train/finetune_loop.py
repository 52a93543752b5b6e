"""Whisper fine-tune driver: dataset build, step loop, periodic WER eval,
best-by-WER tracking, before/after artifacts.

Reference surface (AB/fineTune.py): glob wavs + transcripts into a dataset
(:66-95), Seq2SeqTrainer with eval every 10 steps computing WER (:145-183),
best-checkpoint-by-WER (:176-181), and the transcriptions.csv before/after
comparison artifacts (AB/wavToWhisper.py:85-103, transcriptions2.csv with a
"Previous" column).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.config import FineTuneConfig, MelConfig, WhisperConfig
from audax.core.logging import get_logger
from audax.data.audio_io import read_wav, resample, to_mono
from audax.eval.wer import word_error_rate
from audax.frontend import LogMelFrontend, pad_or_trim
from audax.infer.transcribe import Transcriber
from audax.symbolic.tokenizer import WhisperTokenizer
from audax.train.metrics_sink import MetricsSink
from audax.train.seq2seq import (FTState, collate_seq2seq, init_finetune,
                                 make_finetune_step)

log = get_logger("audax.finetune")

__all__ = ["build_speech_dataset", "finetune_whisper", "eval_wer",
           "midi_finetune_proof"]


def build_speech_dataset(
    audio_dir: str, tokenizer: WhisperTokenizer, mel_cfg: MelConfig,
    *, transcript: Optional[str] = None, lang: str = "en",
    chunk_seconds: float = 30.0, labels_csv: Optional[str] = None,
) -> List[Dict]:
    """Wavs + transcripts -> examples with padded audio + label ids.

    Transcript sources, in priority order (reference dataset builds):
      * ``labels_csv`` — filename,labels CSV rows (the mididataset.csv
        contract of AB/fineTuneMidi.py / synthDataset.py);
      * ``transcript`` — one shared target string (AB/fineTune.py:66-95,
        every memo shares the invented word);
      * per-file ``.txt`` sidecars.
    """
    csv_labels: Dict[str, str] = {}
    if labels_csv:
        import csv as _csv
        with open(labels_csv, newline="") as fh:
            for row in _csv.DictReader(fh):
                csv_labels[os.path.basename(row["filename"])] = row["labels"]
    frontend = LogMelFrontend(mel_cfg, whisper_frames=True)
    n_samples = int(chunk_seconds * mel_cfg.sample_rate)
    examples = []
    paths = sorted(glob.glob(os.path.join(audio_dir, "*.wav"))) if audio_dir \
        else []
    if labels_csv and not paths:
        import csv as _csv
        with open(labels_csv, newline="") as fh:
            paths = [row["filename"] for row in _csv.DictReader(fh)]
    for path in paths:
        try:
            x, rate = read_wav(path)
            x = to_mono(x)
            if rate != mel_cfg.sample_rate:
                x = resample(x, rate, mel_cfg.sample_rate)
            x = np.asarray(pad_or_trim(jnp.asarray(x), n_samples))
            sidecar = os.path.splitext(path)[0] + ".txt"
            base = os.path.basename(path)
            if base in csv_labels:
                text = csv_labels[base]
            elif transcript is not None:
                text = transcript
            elif os.path.exists(sidecar):
                text = open(sidecar).read().strip()
            else:
                log.warning("no transcript for %s; skipped", path)
                continue
            labels = (tokenizer.sot_sequence(lang=lang)
                      + tokenizer.encode(text) + [tokenizer.eot])
            examples.append({"audio": x, "text": text, "labels": labels,
                             "file": os.path.basename(path)})
        except Exception as e:
            log.warning("skip %s: %s", path, e)
    log.info("built dataset: %d examples", len(examples))
    return examples


def eval_wer(transcriber: Transcriber, examples: Sequence[Dict]) -> float:
    refs, hyps = [], []
    for ex in examples:
        refs.append(ex["text"])
        hyps.append(transcriber.transcribe(ex["audio"]).text)
    return word_error_rate(refs, hyps)


def finetune_whisper(
    params, model_cfg: WhisperConfig, tokenizer: WhisperTokenizer,
    examples: Sequence[Dict], cfg: FineTuneConfig,
    *, mel_cfg: Optional[MelConfig] = None,
    sink: Optional[MetricsSink] = None,
    eval_examples: Optional[Sequence[Dict]] = None,
    lora_targets: Tuple[str, ...] = ("attn/q", "attn/v"),
    mesh=None, fsdp: bool = False,
    sp_mesh=None,
    eval_suppress_tokens="-1",
) -> Tuple[FTState, Dict]:
    """Step-based fine-tune with periodic WER eval; returns (state, history).
    ``state.model_params()`` yields serving weights (LoRA merged).

    ``eval_suppress_tokens`` feeds the eval Transcriber: keep the "-1"
    non-speech ban for speech targets, pass [] when the label alphabet
    contains banned symbols (note names like "D#6" — the '#' is in
    whisper's default ban list and eval WER floors without this).

    ``mesh`` (a (data, model) jax.sharding.Mesh, parallel/mesh.py:make_mesh)
    runs the SAME step SPMD: params Megatron-TP-sharded over 'model'
    (WHISPER_TP_RULES), every batch sharded over 'data' (XLA inserts the
    gradient all-reduce over ICI) — the BASELINE north star ("LoRA
    fine-tuning runs as pjit data-parallel over ICI") on the product
    surface, not just the dryrun. ``fsdp=True`` additionally shards params
    + Adam moments over 'data' (ZeRO-3, parallel/fsdp.py). Losses are
    bit-comparable to the single-device run (tests/test_cli_mesh.py).
    The reference trains strictly single-process (AB/fineTune.py:162-183).

    ``sp_mesh`` (a ('data', 'seq') Mesh) instead runs the DP x SP
    ring-attention step (parallel/sp.py:make_sp_finetune_step): the mel
    SEQUENCE axis shards over 'seq' so long-audio windows whose encoder
    activations exceed one chip still train; gradients flow through the
    ppermute ring (bit-matches single-device, tests/test_sp.py).
    Mutually exclusive with ``mesh``/``fsdp``. ``accum_steps`` composes:
    the microbatch scan sits outside the shard_map ring (parallel/sp.py),
    the exact full-batch update either way.
    """
    if sp_mesh is not None:
        if mesh is not None or fsdp:
            raise ValueError("sp_mesh is mutually exclusive with mesh/fsdp")
    mel_cfg = mel_cfg or MelConfig.whisper(model_cfg.n_mels)
    frontend = LogMelFrontend(mel_cfg, whisper_frames=True)
    # the jitted step donates its input state (in-place AdamW); train a
    # COPY so the caller's params survive — a live Transcriber serving the
    # same tree would otherwise hit "Buffer has been deleted or donated"
    # on its next request (the demo UI fine-tunes next to a live server)
    params = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    if mesh is not None:
        from audax.parallel.sharding import shard_params
        # TP layout BEFORE optimizer init: Adam moments inherit it
        params = shard_params(params, mesh)
    state = init_finetune(params, cfg, lora_targets=lora_targets)
    if mesh is not None and fsdp:
        from audax.parallel.fsdp import fsdp_shard_state
        state = fsdp_shard_state(state, mesh)
    if sp_mesh is not None:
        from audax.parallel.sp import make_sp_finetune_step
        step_fn = make_sp_finetune_step(
            model_cfg, sp_mesh, cfg,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    else:
        step_fn = make_finetune_step(
            model_cfg, remat=cfg.gradient_checkpointing,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
            accum_steps=cfg.accum_steps)

    audio = np.stack([ex["audio"] for ex in examples])
    label_rows = [ex["labels"] for ex in examples]
    rng = np.random.default_rng(cfg.seed)
    aug_key = jax.random.key(cfg.seed) if cfg.spec_augment else None
    history: Dict[str, list] = {"loss": [], "wer": []}
    pending: list = []                      # (step, on-device loss scalar)
    fetch_every = max(1, int(getattr(cfg, "loss_fetch_every", 8)))
    best_wer = float("inf")
    best_params = None
    ema = None
    if getattr(cfg, "ema_decay", 0.0) > 0.0:
        from audax.train.ema import ema_init, ema_model_params, ema_update
        ema = ema_init(state.trainable)

    n = len(examples)
    data_size = mesh.shape.get("data", 1) if mesh is not None else 1
    if sp_mesh is not None:
        data_size = sp_mesh.shape.get("data", 1)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = {
            "mel": NamedSharding(mesh, P("data", None, None)),
            "decoder_input_ids": NamedSharding(mesh, P("data", None)),
            "labels": NamedSharding(mesh, P("data", None))}
    # realized batch size: capped by the dataset, rounded to a multiple of
    # accum_steps x data-axis size (each scanned microbatch must split
    # evenly over 'data'); tiny datasets round UP (sample with replacement)
    div = max(1, cfg.accum_steps) * data_size
    bsz = min(cfg.batch_size, n)
    bsz = max(div, (bsz // div) * div)
    for step in range(cfg.max_steps):
        idx = rng.choice(n, size=bsz, replace=n < bsz)
        mel = frontend(jnp.asarray(audio[idx]))
        if aug_key is not None:
            # SpecAugment on the TRAIN batch only (eval Transcriber below
            # sees clean mels); fresh masks every step via fold_in
            from audax.ops.augment import spec_augment
            mel = spec_augment(jax.random.fold_in(aug_key, step), mel,
                               time_masks=cfg.sa_time_masks,
                               freq_masks=cfg.sa_freq_masks,
                               max_time_width=cfg.sa_max_time_width,
                               max_freq_width=cfg.sa_max_freq_width)
        coll = collate_seq2seq([label_rows[i] for i in idx],
                               decoder_start_id=tokenizer.sot)
        batch = {"mel": mel,
                 "decoder_input_ids": jnp.asarray(coll["decoder_input_ids"]),
                 "labels": jnp.asarray(coll["labels"])}
        if batch_sharding is not None:
            batch = {k: jax.device_put(v, batch_sharding[k])
                     for k, v in batch.items()}
        state, m = step_fn(state, batch)
        if ema is not None:
            ema = ema_update(ema, state.trainable,
                             jnp.float32(cfg.ema_decay), state.step)
        # loss stays ON DEVICE and is fetched in chunks: a per-step
        # float(m["loss"]) is a host round trip that SERIALIZES the loop
        # (the axon tunnel adds ~0.1-1 s/step of pure network latency —
        # CLAUDE.md's "fetch once per epoch, not per step"); batching the
        # fetch keeps the step dispatch pipeline full
        pending.append((step, m["loss"]))
        do_eval = bool(eval_examples) and (step + 1) % cfg.eval_every == 0
        if (len(pending) >= fetch_every or do_eval
                or step == cfg.max_steps - 1):
            for s, loss in zip(
                    [s for s, _ in pending],
                    np.asarray(jnp.stack([d for _, d in pending]))):
                loss = float(loss)
                history["loss"].append(loss)
                if sink:
                    sink.log({"loss": loss}, step=s,
                             echo=(s + 1) % 10 == 0)
                elif (s + 1) % 10 == 0:
                    log.info("step %d loss %.4f", s, loss)
            pending.clear()
        record = {"step": step}

        if do_eval:
            # with EMA on, quality tracking (WER + best checkpoint) runs
            # on the averaged weights — the tree you would serve
            serving = (ema_model_params(state, ema) if ema is not None
                       else state.model_params())
            if mesh is not None:
                # host copy: the eval transcriber runs replicated (decode
                # TP has its own surface, infer/decode.py generate(mesh=))
                serving = jax.device_get(serving)
            # window derived from the model's (possibly shortened) encoder
            # context, not hardcoded 30 s (finetune --chunk-seconds)
            win_s = (2 * model_cfg.n_audio_ctx * mel_cfg.hop_length
                     / mel_cfg.sample_rate)
            tr = Transcriber(serving, model_cfg, tokenizer,
                             chunk_seconds=win_s,
                             suppress_tokens=eval_suppress_tokens)
            wer = eval_wer(tr, eval_examples)
            history["wer"].append({"step": step, "wer": wer})
            record["wer"] = 100.0 * wer             # reference logs 100*wer
            if wer < best_wer:
                best_wer = wer
                # deep copy: in the full-param path ``serving`` aliases
                # state.trainable, whose buffers the next (donating) step
                # consumes — a shallow tree copy would be deleted under us
                best_params = jax.tree.map(jnp.copy, serving)
            if sink:
                sink.log(record, step=step)
    history["best_wer"] = best_wer
    history["best_params"] = best_params
    if ema is not None:
        # final averaged serving weights (independent buffers: the next
        # caller may keep training and donate state.trainable)
        history["ema_params"] = jax.tree.map(jnp.copy,
                                             ema_model_params(state, ema))
    return state, history


def midi_finetune_proof(
    out_dir: str,
    *,
    num_items: int = 16,
    notes_per_item: int = 3,
    steps: int = 80,
    chunk_seconds: float = 6.0,
    d_model: int = 64,
    layers: int = 2,
    seed: int = 0,
    holdout_items: int = 6,
    augment: bool = False,
    moment_dtype: str = "float32",
) -> Dict:
    """End-to-end synthetic fine-tune proof (reference-parity evidence).

    ``augment=True`` widens the TRAIN distribution (per-note velocity
    jitter, per-item gain jitter, noise at 25 dB SNR — DataGenConfig) and
    turns on SpecAugment in the fine-tune loop; the holdout set stays the
    CLEAN velocity-100 distribution, so its WER measures generalization to
    the canonical render, not augmentation leakage.

    No real datasets or pretrained weights are reachable in this
    environment, so this is the strongest available analogue of the
    reference's committed fine-tune artifact (AB/transcriptions2.csv, a
    before/after CSV proving the single-word fine-tune worked; its MIDI
    variant collapsed to "A5 A5 A5 A5", AB/midiDatasetResults.csv:2-5):

      1. generate a note-name dataset with the framework's own datagen
         (the mididataset.csv contract, AB/synthDataset.py:43-91);
      2. train a byte-level BPE on the labels and random-init a compact
         whisper-architecture model;
      3. transcribe everything BEFORE (random weights -> garbage);
      4. fine-tune; 5. transcribe AFTER; 6. write the comparison CSV
         (file, target, previous, finetuned, split) plus a metrics JSON,
         and return {"wer_before", "wer_after", "holdout_wer_before",
         "holdout_wer_after", "csv", "metrics"}.

    ``holdout_items`` additional clips are generated from the SAME synth
    distribution with a DISJOINT seed and never trained on: their WER is
    the generalization evidence (train-set WER alone is memorization
    evidence — exactly the trap that hid the reference's mode collapse,
    AB/midiDatasetResults.csv:2-5, where a constant "A5 A5 A5 A5" output
    looked plausible until scored).

    Success = wer_after < wer_before by a wide margin on BOTH splits,
    visible row by row in the committed CSV.
    """
    import json

    from audax.core.config import DataGenConfig
    from audax.data.synth import make_midi_dataset
    from audax.ops.augment import (SHORT_CLIP_FREQ_WIDTH,
                                   SHORT_CLIP_TIME_WIDTH)
    from audax.symbolic.bpe import train_bpe

    gen = DataGenConfig(num_items=num_items, notes_per_item=notes_per_item,
                        out_dir=os.path.join(out_dir, "datagen"), seed=seed,
                        velocity_jitter=20 if augment else 0,
                        gain_jitter_db=6.0 if augment else 0.0,
                        noise_snr_db=25.0 if augment else 0.0)
    labels_csv = make_midi_dataset(gen)
    holdout_csv = None
    if holdout_items > 0:
        gen_h = DataGenConfig(num_items=holdout_items,
                              notes_per_item=notes_per_item,
                              out_dir=os.path.join(out_dir,
                                                   "datagen_holdout"),
                              seed=seed + 1)
        holdout_csv = make_midi_dataset(gen_h)

    import csv as _csv
    with open(labels_csv, newline="") as fh:
        label_texts = [row["labels"] for row in _csv.DictReader(fh)]
    # tokenizer trained on TRAIN labels only; the note-name token space is
    # shared, so holdout labels stay encodable (byte-level BPE fallback)
    tokenizer = WhisperTokenizer(
        train_bpe(label_texts, vocab_size=320,
                  special_tokens=["<|MIDI|>", "<|/MIDI|>"]))

    frames = int(chunk_seconds * 16000) // 160          # whisper hop 160
    model_cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=frames // 2, d_model=d_model,
        encoder_layers=layers, decoder_layers=layers, heads=max(2, d_model // 32),
        vocab_size=tokenizer.vocab_size, n_text_ctx=64)
    mel_cfg = MelConfig.whisper(80)
    from audax.models.whisper import init_whisper_params
    params = init_whisper_params(model_cfg, jax.random.key(seed))

    examples = build_speech_dataset("", tokenizer, mel_cfg,
                                    labels_csv=labels_csv,
                                    chunk_seconds=chunk_seconds)
    assert examples, "datagen produced no usable examples"
    holdout = build_speech_dataset("", tokenizer, mel_cfg,
                                   labels_csv=holdout_csv,
                                   chunk_seconds=chunk_seconds) \
        if holdout_csv else []

    def snapshot(p, exs, dtype=jnp.float32):
        # suppress_tokens=[]: whisper's default "-1" non-speech ban includes
        # '#', which is a third of the note-name alphabet (D#6 ...) — with
        # the default list the decoder literally cannot emit the labels it
        # was trained on (train WER floored at ~0.35 until this was found)
        tr = Transcriber(p, model_cfg, tokenizer, max_new_tokens=24,
                         temperature_fallback=False, suppress_tokens=[],
                         chunk_seconds=chunk_seconds, dtype=dtype)
        return {ex["file"]: tr.transcribe(ex["audio"]).text for ex in exs}

    def wer_of(snap, exs):
        return word_error_rate([ex["text"] for ex in exs],
                               [snap[ex["file"]] for ex in exs])

    before = snapshot(params, examples)
    wer_before = wer_of(before, examples)
    before_h = snapshot(params, holdout) if holdout else {}
    holdout_wer_before = wer_of(before_h, holdout) if holdout else None

    ft = FineTuneConfig(learning_rate=1e-3, warmup_steps=5, max_steps=steps,
                        eval_every=steps, batch_size=8,   # eval at the end
                        lora_rank=0, seed=seed,
                        moment_dtype=moment_dtype,
                        spec_augment=augment,
                        # freq masks ONLY for the pitch task: a time mask
                        # can blank an entire note of a 3-note clip, turning
                        # its label into noise (measured: time+freq masks
                        # scored holdout WER 0.38 vs the clean run's 0.32);
                        # band masks instead force harmonic redundancy
                        sa_time_masks=0,
                        sa_max_time_width=SHORT_CLIP_TIME_WIDTH,
                        sa_max_freq_width=SHORT_CLIP_FREQ_WIDTH)
    state, history = finetune_whisper(params, model_cfg, tokenizer, examples,
                                      ft, mel_cfg=mel_cfg,
                                      eval_examples=examples,
                                      eval_suppress_tokens=[])
    serving_params = state.model_params()
    after = snapshot(serving_params, examples)
    wer_after = wer_of(after, examples)
    after_h = snapshot(serving_params, holdout) if holdout else {}
    holdout_wer_after = wer_of(after_h, holdout) if holdout else None
    # bf16 serving parity: the same fine-tuned checkpoint transcribed with
    # encoder+decoder in bfloat16 (the TPU serving dtype) must reach the
    # same quality — this is the tolerance-checked WER comparison that
    # justifies bf16 as the serving default (PARITY.md perf table).
    after_bf16 = snapshot(serving_params, examples, dtype=jnp.bfloat16)
    wer_after_bf16 = wer_of(after_bf16, examples)

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "midi_finetune_comparison.csv")
    with open(csv_path, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=["file", "target", "previous",
                                            "finetuned", "finetuned_bf16",
                                            "split"])
        w.writeheader()
        for ex in examples:
            w.writerow({"file": ex["file"], "target": ex["text"],
                        "previous": before[ex["file"]],
                        "finetuned": after[ex["file"]],
                        "finetuned_bf16": after_bf16[ex["file"]],
                        "split": "train"})
        for ex in holdout:
            w.writerow({"file": ex["file"], "target": ex["text"],
                        "previous": before_h[ex["file"]],
                        "finetuned": after_h[ex["file"]],
                        "finetuned_bf16": "",
                        "split": "holdout"})
    metrics = {"wer_before": round(float(wer_before), 4),
               "wer_after": round(float(wer_after), 4),
               "wer_after_bf16": round(float(wer_after_bf16), 4),
               "steps": steps, "items": len(examples),
               "augment": augment, "moment_dtype": moment_dtype,
               "loss_first": round(history["loss"][0], 4),
               "loss_last": round(history["loss"][-1], 4)}
    if holdout:
        metrics["holdout_items"] = len(holdout)
        metrics["holdout_wer_before"] = round(float(holdout_wer_before), 4)
        metrics["holdout_wer_after"] = round(float(holdout_wer_after), 4)
    metrics_path = os.path.join(out_dir, "midi_finetune_metrics.json")
    with open(metrics_path, "w") as fh:
        json.dump(metrics, fh, indent=2)
    log.success("fine-tune proof: WER %.3f -> %.3f (bf16 %.3f; holdout "
                "%s -> %s) (%s)", wer_before, wer_after, wer_after_bf16,
                holdout_wer_before, holdout_wer_after, csv_path)
    return {"wer_before": wer_before, "wer_after": wer_after,
            "wer_after_bf16": wer_after_bf16,
            "holdout_wer_before": holdout_wer_before,
            "holdout_wer_after": holdout_wer_after,
            "csv": csv_path, "metrics": metrics_path, **metrics}
