"""audax — a TPU-native (JAX/XLA/Pallas/pjit) audio-transformer framework.

Re-designed from scratch with the capabilities of the MLX8-WS-Audio-Transformer
workshop reference (see SURVEY.md): fused log-mel audio frontend, UrbanSound8K
classifiers, Whisper-style seq2seq ASR with KV-cached decoding and LoRA
fine-tuning, two-tower audio->ABC music transcription, MIDI/soundfont synthetic
data generation, and Parquet dataset tooling — all built TPU-first.

Subpackages
-----------
core      typed config, structured logging, RNG, artifact naming
ops       Pallas + XLA compute kernels (STFT/mel, attention, resample)
parallel  device mesh / sharding / collective helpers
utils     pytree and misc utilities
frontend  public audio feature-extraction API (LogMelFrontend)
data      Parquet schemas, datasets, collators, synthetic datagen drivers
models    Flax models (CNN / transformer classifiers, Whisper, two-tower, LoRA)
train     jitted train steps, optimizer factories, checkpointing, metric sinks
infer     KV-cached decoding, chunked transcription
eval      WER, classification metrics, confusion matrices
symbolic  MIDI/ABC data model, tokenizers (raw + BPE)
native    C++ runtime modules (soundfont synth, MIDI parse/ABC emit, resample)
cli       command-line entry points mirroring the reference surface
"""

__version__ = "0.1.0"
