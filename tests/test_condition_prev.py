"""condition_on_previous_text: bucketed prompts, sequential chunk context."""

import jax
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.transcribe import Transcriber
from audax.models.whisper import init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def tr():
    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 3,
                                     vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=128)
    params = init_whisper_params(cfg, jax.random.key(0))
    return Transcriber(params, cfg, tok, max_new_tokens=8,
                       condition_on_previous=True,
                       temperature_fallback=False, backend="xla")


def test_prompt_bucketing(tr):
    tk = tr.tokenizer
    base = tk.sot_sequence(lang="en")
    assert tr._prompt(1).shape[1] == len(base)
    # fewer tokens than the smallest bucket: left-padded into bucket 16
    # (regression: short context used to be dropped entirely)
    p10 = tr._prompt(1, prev=[5] * 10)
    assert p10.shape[1] == 1 + 16 + len(base)
    assert p10[0, 0] == tk.sot_prev
    np.testing.assert_array_equal(p10[0, 1:17], [5] * 16)
    # 20 tokens -> bucket 16; 70 -> bucket 64
    p20 = tr._prompt(1, prev=list(range(100, 120)))
    assert p20.shape[1] == 1 + 16 + len(base)
    assert p20[0, 0] == tk.sot_prev
    np.testing.assert_array_equal(p20[0, 1:17], np.arange(104, 120))  # latest
    p70 = tr._prompt(1, prev=[7] * 70)
    assert p70.shape[1] == 1 + 64 + len(base)


def test_sequential_conditioning_runs(tr, rng):
    audio = (0.05 * rng.standard_normal(16000 * 65)).astype(np.float32)
    res = tr.transcribe(audio)
    assert len(res.segments) == 3             # 3 chunks, sequential
    assert res.audio_seconds == pytest.approx(65.0)


def test_initial_prompt_plumbing(tr):
    """initial_prompt seeds <|startofprev|> context: encoded ids land in
    the prompt for the batched path (every window) and seed the rolling
    context in the conditioned path."""
    tok = tr.tokenizer
    cfg = tr.cfg
    t2 = Transcriber(tr.params, cfg, tok, max_new_tokens=6,
                     temperature_fallback=False, backend="xla",
                     initial_prompt="hello world")
    assert t2.initial_prompt_ids
    row = t2._prompt(1, t2.initial_prompt_ids, "en")[0]
    assert row[0] == tok.sot_prev
    # the encoded hint appears right-aligned in the context slot
    k = len(t2.initial_prompt_ids)
    np.testing.assert_array_equal(row[17 - k:17], t2.initial_prompt_ids)
    # end-to-end: a transcribe call with the hint runs and returns a result
    res = t2.transcribe(np.zeros(16000, np.float32))
    assert res.audio_seconds == pytest.approx(1.0)


def test_task_translate_prompt(tr):
    """task='translate' swaps the task token in every prompt (whisper's
    X->English mode); invalid tasks fail fast."""
    tok = tr.tokenizer
    t2 = Transcriber(tr.params, tr.cfg, tok, task="translate",
                     temperature_fallback=False, backend="xla")
    row = t2._prompt(1, None, "en")[0]
    assert tok.translate in row and tok.transcribe not in row
    base = tr._prompt(1, None, "en")[0]
    assert tok.transcribe in base and tok.translate not in base
    with pytest.raises(ValueError, match="task"):
        Transcriber(tr.params, tr.cfg, tok, task="caption")
