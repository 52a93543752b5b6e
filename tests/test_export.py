"""HF export round-trip: export(port(sd)) == sd bit-exact, and the exported
dict strict-loads into a freshly constructed HF model (the audax->HF
direction of the porting contract; import direction in test_whisper.py /
test_causal_lm.py)."""

import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.models.export import (export_causal_lm_state_dict,
                                 export_whisper_state_dict,
                                 hf_causal_lm_config_dict,
                                 hf_whisper_config_dict)

TINY = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=2,
                     decoder_layers=2, heads=2, vocab_size=111, n_text_ctx=24)


def _hf_whisper():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, num_mel_bins=TINY.n_mels,
        encoder_layers=TINY.encoder_layers, encoder_attention_heads=TINY.heads,
        decoder_layers=TINY.decoder_layers, decoder_attention_heads=TINY.heads,
        d_model=TINY.d_model, decoder_ffn_dim=4 * TINY.d_model,
        encoder_ffn_dim=4 * TINY.d_model,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[], begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    return WhisperForConditionalGeneration(hf_cfg).eval()


def _assert_roundtrip(src_sd, exported):
    src = {k: v.detach().cpu().numpy() for k, v in src_sd.items()}
    extra = set(exported) - set(src)
    assert not extra, f"exported keys not in HF state_dict: {sorted(extra)}"
    missing = set(src) - set(exported)
    assert not missing, f"HF keys missing from export: {sorted(missing)}"
    for k, v in src.items():
        np.testing.assert_array_equal(exported[k], v, err_msg=k)


def _strict_load(hf_new, exported):
    import torch
    hf_new.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in exported.items()}, strict=True)


def test_whisper_export_roundtrip():
    pytest.importorskip("torch")
    hf = _hf_whisper()
    from audax.models.port import port_whisper_from_hf
    params = port_whisper_from_hf(hf)
    exported = export_whisper_state_dict(params, TINY)
    _assert_roundtrip(hf.state_dict(), exported)
    _strict_load(_hf_whisper(), exported)


def test_whisper_export_config_reimports():
    from transformers import WhisperConfig as HFConfig
    from audax.models.port import whisper_config_from_hf
    cfg2 = whisper_config_from_hf(HFConfig(**hf_whisper_config_dict(TINY)))
    assert cfg2 == TINY


@pytest.mark.parametrize("tie", [True, False])
def test_qwen2_export_roundtrip(tie):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    hc = Qwen2Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        rope_theta=1e4, rms_norm_eps=1e-6, tie_word_embeddings=tie,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hc).eval()
    from audax.models.causal_lm import port_causal_lm_from_hf
    params, cfg = port_causal_lm_from_hf(hf)
    exported = export_causal_lm_state_dict(params, cfg)
    _assert_roundtrip(hf.state_dict(), exported)
    _strict_load(Qwen2ForCausalLM(hc), exported)
    # config re-imports to the same family knobs
    d = hf_causal_lm_config_dict(cfg)
    assert d["model_type"] == "qwen2" and d["tie_word_embeddings"] == tie


def test_qwen3_export_roundtrip():
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3Config, Qwen3ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3")
    hc = Qwen3Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        head_dim=16, rope_theta=1e6, tie_word_embeddings=True,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = Qwen3ForCausalLM(hc).eval()
    from audax.models.causal_lm import port_causal_lm_from_hf
    params, cfg = port_causal_lm_from_hf(hf)
    exported = export_causal_lm_state_dict(params, cfg)
    _assert_roundtrip(hf.state_dict(), exported)
    _strict_load(Qwen3ForCausalLM(hc), exported)
    assert hf_causal_lm_config_dict(cfg)["head_dim"] == 16


def test_qwen3_moe_export_roundtrip():
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3-MoE")
    hc = Qwen3MoeConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        head_dim=8, rope_theta=1e6, tie_word_embeddings=True,
        max_position_embeddings=64, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=16, norm_topk_prob=True, decoder_sparse_step=1,
        mlp_only_layers=[], attn_implementation="eager",
    )
    torch.manual_seed(2)
    hf = Qwen3MoeForCausalLM(hc).eval()
    from audax.models.causal_lm import port_causal_lm_from_hf
    params, cfg = port_causal_lm_from_hf(hf)
    exported = export_causal_lm_state_dict(params, cfg)
    _assert_roundtrip(hf.state_dict(), exported)
    _strict_load(Qwen3MoeForCausalLM(hc), exported)
    assert hf_causal_lm_config_dict(cfg)["model_type"] == "qwen3_moe"


@pytest.mark.parametrize("fmt", ["safetensors", "bin"])
def test_export_hf_cli_roundtrip(tmp_path, fmt):
    """orbax ckpt + sidecar -> `export-hf` -> a directory transformers
    actually loads with from_pretrained, weights intact and proj_out
    re-tied (safetensors drops tied aliases; bin keeps them)."""
    torch = pytest.importorskip("torch")
    import dataclasses
    import json

    import jax

    from audax.cli.main import _COMMANDS
    from audax.models.whisper import init_whisper_params
    from audax.train.checkpoints import save_pytree

    params = init_whisper_params(TINY, jax.random.key(0))
    ckpt = str(tmp_path / "ckpt")
    save_pytree(ckpt, params)
    with open(ckpt + ".config.json", "w") as fh:
        json.dump(dataclasses.asdict(TINY), fh)
    out = str(tmp_path / "hf")
    assert _COMMANDS["export-hf"](["--ckpt", ckpt, "--out", out,
                                   "--format", fmt]) == 0
    fname = "model.safetensors" if fmt == "safetensors" else \
        "pytorch_model.bin"
    assert (tmp_path / "hf" / fname).exists()

    from transformers import WhisperForConditionalGeneration
    hf = WhisperForConditionalGeneration.from_pretrained(out)
    embed = np.asarray(params["decoder"]["embed"])
    np.testing.assert_array_equal(
        hf.model.decoder.embed_tokens.weight.detach().numpy(), embed)
    np.testing.assert_array_equal(
        hf.proj_out.weight.detach().numpy(), embed)   # tie survives load
    np.testing.assert_array_equal(
        hf.model.encoder.conv1.weight.detach().numpy(),
        np.asarray(params["encoder"]["conv1"]["kernel"]).transpose(2, 1, 0))


def test_export_hf_cli_merges_lora(tmp_path):
    """--lora-ckpt folds the adapter into the exported weights
    (merge_lora semantics: kernel += (B@A).T * alpha/rank)."""
    torch = pytest.importorskip("torch")
    import dataclasses
    import json

    import jax

    from audax.cli.main import _COMMANDS
    from audax.models.lora import init_lora, merge_lora
    from audax.models.whisper import init_whisper_params
    from audax.train.checkpoints import save_pytree

    params = init_whisper_params(TINY, jax.random.key(0))
    lora = init_lora(params, rank=2, targets=["attn/q", "attn/v"],
                     rng=jax.random.key(1))
    # non-zero B so the merge actually changes weights
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ckpt, lck = str(tmp_path / "ckpt"), str(tmp_path / "lora")
    save_pytree(ckpt, params)
    save_pytree(lck, lora)
    with open(ckpt + ".config.json", "w") as fh:
        json.dump(dataclasses.asdict(TINY), fh)
    out = str(tmp_path / "hf")
    assert _COMMANDS["export-hf"](["--ckpt", ckpt, "--out", out,
                                   "--lora-ckpt", lck]) == 0
    from transformers import WhisperForConditionalGeneration
    hf = WhisperForConditionalGeneration.from_pretrained(out)
    merged = merge_lora(params, lora)
    got = hf.model.encoder.layers[0].self_attn.q_proj.weight.detach().numpy()
    want = np.asarray(merged["encoder"]["layers"]["attn"]["q"]["kernel"])[0].T
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert np.abs(want.T - np.asarray(
        params["encoder"]["layers"]["attn"]["q"]["kernel"])[0]).max() > 0


def test_export_rejects_quantized_tree():
    from audax.models.quantize import quantize_tree
    from audax.models.whisper import init_whisper_params
    import jax
    params = init_whisper_params(TINY, jax.random.PRNGKey(0))
    qparams = quantize_tree(params, bits=8)
    with pytest.raises(ValueError, match="quantized"):
        export_whisper_state_dict(qparams, TINY)


def test_full_vocab_config_emits_whisper_token_ids():
    """ADVICE r2: for real vocabs the config must carry the whisper
    special-token layout (sot=50258 start, eot=50257 eos/pad) and the
    standard suppress lists — HF's GPT-2 defaults would make
    from_pretrained(dir).generate() start/stop on the wrong tokens."""
    d = hf_whisper_config_dict(WhisperConfig())          # vocab 51865
    assert d["decoder_start_token_id"] == 50258
    assert d["eos_token_id"] == d["pad_token_id"] == 50257
    assert d["begin_suppress_tokens"] == [220, 50257]
    sup = d["suppress_tokens"]
    assert 50258 in sup and 50362 in sup and 50363 not in sup
    assert sup == sorted(sup)

    d3 = hf_whisper_config_dict(WhisperConfig.large_v3())  # vocab 51866
    assert d3["decoder_start_token_id"] == 50258
    # large-v3 adds one language token: task/context specials shift by 1
    assert 50363 in d3["suppress_tokens"] and 50364 not in d3["suppress_tokens"]

    # English-only family (.en, vocab 51864): eot=50256, sot=50257 — must
    # NOT fall into the shrunken-test-vocab branch (pad=0/eos=2 garbage)
    import dataclasses
    den = hf_whisper_config_dict(
        dataclasses.replace(WhisperConfig(), vocab_size=51864))
    assert den["decoder_start_token_id"] == 50257
    assert den["eos_token_id"] == den["pad_token_id"] == 50256
    assert den["begin_suppress_tokens"] == [220, 50256]


def test_lm_config_uses_derived_ffn_widths():
    """ADVICE r2: configs that leave ffn_dim/moe_ffn_dim 0 (width derived
    via cfg.ffn) must not export intermediate_size: 0."""
    from audax.models.causal_lm import CausalLMConfig
    cfg = CausalLMConfig(vocab_size=64, d_model=96, layers=1, heads=2,
                         kv_heads=1, ffn_dim=0, num_experts=2,
                         experts_per_tok=1, moe_ffn_dim=0)
    d = hf_causal_lm_config_dict(cfg)
    assert d["intermediate_size"] == cfg.ffn > 0
    assert d["moe_intermediate_size"] == cfg.moe_ffn > 0


def test_export_hf_cli_upcasts_bf16(tmp_path):
    """ADVICE r2: bf16 checkpoint leaves (ml_dtypes) have no torch buffer
    protocol; export upcasts to f32 instead of crashing."""
    pytest.importorskip("torch")
    import dataclasses
    import json

    import jax
    import jax.numpy as jnp

    from audax.cli.main import _COMMANDS
    from audax.models.whisper import init_whisper_params
    from audax.train.checkpoints import save_pytree

    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_whisper_params(TINY, jax.random.key(0)))
    ckpt = str(tmp_path / "ckpt")
    save_pytree(ckpt, params)
    with open(ckpt + ".config.json", "w") as fh:
        json.dump(dataclasses.asdict(TINY), fh)
    out = str(tmp_path / "hf")
    assert _COMMANDS["export-hf"](["--ckpt", ckpt, "--out", out]) == 0
    from transformers import WhisperForConditionalGeneration
    hf = WhisperForConditionalGeneration.from_pretrained(out)
    np.testing.assert_array_equal(
        hf.model.decoder.embed_tokens.weight.detach().numpy(),
        np.asarray(params["decoder"]["embed"]).astype(np.float32))


def test_export_hf_cli_rejects_layer_mismatch(tmp_path):
    """ADVICE r2: a --size/config whose layer count disagrees with the
    checkpoint's stacked layer axis must error, not silently truncate."""
    import dataclasses
    import json

    import jax

    from audax.cli.main import _COMMANDS
    from audax.models.whisper import init_whisper_params
    from audax.train.checkpoints import save_pytree

    params = init_whisper_params(TINY, jax.random.key(0))
    ckpt = str(tmp_path / "ckpt")
    save_pytree(ckpt, params)
    bad = dataclasses.replace(TINY, encoder_layers=1)
    with open(ckpt + ".config.json", "w") as fh:
        json.dump(dataclasses.asdict(bad), fh)
    with pytest.raises(ValueError, match="config mismatch"):
        _COMMANDS["export-hf"](["--ckpt", ckpt,
                                "--out", str(tmp_path / "hf")])


def test_verify_parity_cli(tmp_path, rng):
    """`verify-parity`: one command from a local HF dir to a logit-parity
    verdict + transcription comparison report (the packaged reproduction
    harness for when real checkpoints/audio become reachable)."""
    pytest.importorskip("torch")
    import dataclasses
    import json

    import jax

    from audax.cli.main import _COMMANDS
    from audax.data.audio_io import write_wav
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import train_bpe
    from audax.train.checkpoints import save_pytree

    # build a loadable local HF checkpoint via the export path
    params = init_whisper_params(TINY, jax.random.key(0))
    ckpt = str(tmp_path / "ckpt")
    save_pytree(ckpt, params)
    with open(ckpt + ".config.json", "w") as fh:
        json.dump(dataclasses.asdict(TINY), fh)
    hf_dir = str(tmp_path / "hf")
    assert _COMMANDS["export-hf"](["--ckpt", ckpt, "--out", hf_dir]) == 0

    # tokenizer + audio + reference sidecars
    bpe = train_bpe(["hello world how are you"] * 4, vocab_size=90)
    tok_dir = str(tmp_path / "tok")
    bpe.save(tok_dir)
    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    for i in range(2):
        write_wav(str(audio_dir / f"c{i}.wav"),
                  (0.1 * rng.standard_normal(8000)).astype(np.float32),
                  16000)
        (audio_dir / f"c{i}.txt").write_text("hello world")

    report_path = str(tmp_path / "report.json")
    rc = _COMMANDS["verify-parity"](
        ["--hf-dir", hf_dir, "--audio-dir", str(audio_dir),
         "--tokenizer-dir", tok_dir, "--max-tokens", "6",
         "--report", report_path])
    assert rc == 0
    rep = json.load(open(report_path))
    assert rep["logit_parity"] and rep["logit_max_abs_diff"] < 1e-4
    assert len(rep["clips"]) == 2
    assert {"file", "audax", "hf", "reference"} <= set(rep["clips"][0])
    assert "cross_wer_audax_vs_hf" in rep
    assert "wer_audax_vs_reference" in rep and "wer_hf_vs_reference" in rep


def test_verify_parity_cli_causal_lm(tmp_path):
    """`verify-parity --kind causal-lm`: Qwen-family port + logit parity
    from a local HF dir in one command."""
    pytest.importorskip("torch")
    import json

    from transformers import Qwen2Config, Qwen2ForCausalLM

    from audax.cli.main import _COMMANDS

    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=80, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True)).eval()
    hf_dir = str(tmp_path / "hf")
    hf.save_pretrained(hf_dir)
    report_path = str(tmp_path / "rep.json")
    assert _COMMANDS["verify-parity"](
        ["--hf-dir", hf_dir, "--kind", "causal-lm",
         "--report", report_path]) == 0
    rep = json.load(open(report_path))
    assert rep["kind"] == "causal-lm" and rep["logit_parity"]
    assert rep["logit_max_abs_diff"] < 1e-4


def test_verify_parity_cli_classifier(tmp_path, rng, monkeypatch):
    """`verify-parity --kind classifier`: raw UrbanSound8K-layout dir ->
    Parquet -> folds 1-8 train / 9 eval / 10 test -> accuracy vs the
    published 64%/68% — the one-command classifier reproduction
    (urbansound8k_sql.md:94), driven on a synthetic stand-in."""
    import json
    import os

    import pandas as pd

    from audax.cli.main import _COMMANDS
    from audax.data.audio_io import write_wav

    root = tmp_path / "US8K"
    rows = []
    for fold in range(1, 11):
        d = root / "audio" / f"fold{fold}"
        os.makedirs(d)
        for i in range(3):
            cid = i % 3
            name = f"c{fold}_{i}.wav"
            t = np.arange(16000) / 16000
            x = 0.4 * np.sin(2 * np.pi * (220 + 300 * cid) * t)
            write_wav(str(d / name), x.astype(np.float32), 16000)
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": cid, "class": f"class{cid}"})
    os.makedirs(root / "metadata")
    pd.DataFrame(rows).to_csv(root / "metadata" / "UrbanSound8K.csv",
                              index=False)

    run = tmp_path / "run"
    run.mkdir()
    monkeypatch.chdir(run)
    report_path = str(tmp_path / "rep.json")
    assert _COMMANDS["verify-parity"](
        ["--hf-dir", "unused", "--kind", "classifier",
         "--data-dir", str(root), "--variant", "v1", "--model", "cnn",
         "--epochs", "2", "--batch-size", "8",
         "--report", report_path]) == 0
    rep = json.load(open(report_path))
    assert rep["kind"] == "classifier" and rep["variant"] == "v1"
    assert rep["train_clips"] == 24
    assert 0.0 <= rep["fold9_accuracy"] <= 1.0
    assert 0.0 <= rep["fold10_accuracy"] <= 1.0
    assert rep["published_accuracy"] == 0.64
    assert rep["delta_vs_published"] == pytest.approx(
        rep["fold10_accuracy"] - 0.64, abs=1e-6)
