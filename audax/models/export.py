"""Checkpoint export: audax param pytrees -> HF torch state_dicts.

The exact inverse of the import path (`audax/models/port.py`,
`audax/models/causal_lm.py:port_causal_lm_from_hf`): a fine-tune produced
by this framework (`finetune`, `train-lm`, `train-music`) can be handed
back to the transformers ecosystem as a standard local checkpoint
directory. The reference consumed HF checkpoints one-way
(AB/fineTune.py:131 saves with ``model.save_pretrained`` because it never
left torch); here porting is a tree transform, so both directions are.

Round-trip contract (tested): ``export(port(sd)) == sd`` bit-exact for
every tensor, including tied ``proj_out.weight`` / ``lm_head.weight``
aliases, and the exported dict strict-loads into a freshly constructed HF
model.

Quantized serving trees (``convert-hf --quantize``) are rejected: int8 /
int4 packed layouts have no HF container — export from the float
checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np

from audax.core.config import WhisperConfig

__all__ = ["export_whisper_state_dict", "export_causal_lm_state_dict",
           "hf_whisper_config_dict", "hf_causal_lm_config_dict"]


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _check_float_tree(params: Mapping) -> None:
    leaves = jax.tree.leaves(params)
    if any(np.issubdtype(np.asarray(l).dtype, np.integer) for l in leaves):
        raise ValueError(
            "quantized param tree (int leaves) cannot be exported to an HF "
            "state_dict — export from the float checkpoint instead")


def _unstack(layers, n: int):
    """Stacked-layer pytree [L, ...] -> list of n per-layer pytrees."""
    return [jax.tree.map(lambda x, i=i: _np(x)[i], layers) for i in range(n)]


def _put_ln(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _put_linear(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _put_attn(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    _put_linear(out, f"{prefix}.q_proj", p["q"])
    _put_linear(out, f"{prefix}.k_proj", p["k"])   # no bias (whisper layout)
    _put_linear(out, f"{prefix}.v_proj", p["v"])
    _put_linear(out, f"{prefix}.out_proj", p["out"])


def export_whisper_state_dict(params: Mapping, cfg: WhisperConfig
                              ) -> Dict[str, np.ndarray]:
    """audax whisper params (stacked-layer layout) -> HF
    ``WhisperForConditionalGeneration`` state_dict (numpy values; wrap with
    ``torch.from_numpy`` / ``torch.save`` to write a checkpoint)."""
    _check_float_tree(params)
    out: Dict[str, np.ndarray] = {}
    enc, dec = params["encoder"], params["decoder"]

    # torch conv1d weight [out, in, k] <- lax HIO [k, in, out]
    for name in ("conv1", "conv2"):
        out[f"model.encoder.{name}.weight"] = np.ascontiguousarray(
            _np(enc[name]["kernel"]).transpose(2, 1, 0))
        out[f"model.encoder.{name}.bias"] = _np(enc[name]["bias"])
    out["model.encoder.embed_positions.weight"] = _np(enc["pos"])
    for i, layer in enumerate(_unstack(enc["layers"], cfg.encoder_layers)):
        p = f"model.encoder.layers.{i}"
        _put_ln(out, f"{p}.self_attn_layer_norm", layer["attn_ln"])
        _put_attn(out, f"{p}.self_attn", layer["attn"])
        _put_ln(out, f"{p}.final_layer_norm", layer["mlp_ln"])
        _put_linear(out, f"{p}.fc1", layer["mlp_in"])
        _put_linear(out, f"{p}.fc2", layer["mlp_out"])
    _put_ln(out, "model.encoder.layer_norm", enc["ln"])

    embed = _np(dec["embed"])
    out["model.decoder.embed_tokens.weight"] = embed
    out["model.decoder.embed_positions.weight"] = _np(dec["pos"])
    for i, layer in enumerate(_unstack(dec["layers"], cfg.decoder_layers)):
        p = f"model.decoder.layers.{i}"
        _put_ln(out, f"{p}.self_attn_layer_norm", layer["attn_ln"])
        _put_attn(out, f"{p}.self_attn", layer["attn"])
        _put_ln(out, f"{p}.encoder_attn_layer_norm", layer["cross_ln"])
        _put_attn(out, f"{p}.encoder_attn", layer["cross_attn"])
        _put_ln(out, f"{p}.final_layer_norm", layer["mlp_ln"])
        _put_linear(out, f"{p}.fc1", layer["mlp_in"])
        _put_linear(out, f"{p}.fc2", layer["mlp_out"])
    _put_ln(out, "model.decoder.layer_norm", dec["ln"])
    out["proj_out.weight"] = embed        # tied output projection
    return out


def hf_whisper_config_dict(cfg: WhisperConfig) -> Dict[str, Any]:
    """WhisperConfig -> the HF config.json fields the port reads back
    (port.py:whisper_config_from_hf inverse)."""
    d: Dict[str, Any] = {
        "model_type": "whisper",
        "architectures": ["WhisperForConditionalGeneration"],
        "num_mel_bins": cfg.n_mels,
        "max_source_positions": cfg.n_audio_ctx,
        "d_model": cfg.d_model,
        "encoder_layers": cfg.encoder_layers,
        "decoder_layers": cfg.decoder_layers,
        "encoder_attention_heads": cfg.heads,
        "decoder_attention_heads": cfg.heads,
        "encoder_ffn_dim": 4 * cfg.d_model,
        "decoder_ffn_dim": 4 * cfg.d_model,
        "vocab_size": cfg.vocab_size,
        "max_target_positions": cfg.n_text_ctx,
    }
    if cfg.vocab_size < 51864:
        # shrunken/test vocab: HF's default special-token ids (pad 50256,
        # eos 50257, ...) would fall outside the embedding table and
        # from_pretrained refuses to construct the model — clamp them in
        d.update(pad_token_id=0, bos_token_id=1, eos_token_id=2,
                 decoder_start_token_id=1, suppress_tokens=[],
                 begin_suppress_tokens=[])
    elif cfg.vocab_size == 51864:
        # English-only family (.en): eot=50256, sot=50257 — one below the
        # multilingual layout. The .en non-speech symbol ids live in a
        # DIFFERENT base vocab and are not baked in here (an empty list
        # only costs the default symbol suppression, while wrong ids
        # would ban real words)
        d.update(pad_token_id=50256, bos_token_id=50256,
                 eos_token_id=50256, decoder_start_token_id=50257,
                 suppress_tokens=[], begin_suppress_tokens=[220, 50256])
    else:
        # real multilingual vocab: emit the standard whisper ids — HF's
        # GPT-2 defaults (decoder_start 50257, eos/pad 50256) are WRONG for
        # the whisper layout (sot=50258, eot=50257) and would make
        # ``from_pretrained(dir).generate()`` start/stop on the wrong
        # tokens. Suppress lists mirror the published openai/whisper
        # config.json: the fixed base-vocab symbol set plus <|sot|> and the
        # task/context specials, whose ids shift with the language count
        # (99 languages at 51865; large-v3 adds yue -> 51866).
        eot, sot = 50257, 50258
        translate = sot + 1 + (99 if cfg.vocab_size == 51865 else 100)
        d.update(
            pad_token_id=eot, bos_token_id=eot, eos_token_id=eot,
            decoder_start_token_id=sot,
            suppress_tokens=_WHISPER_SYMBOL_SUPPRESS + [sot] +
                            list(range(translate, translate + 5)),
            begin_suppress_tokens=[220, eot])
    return d


# openai's default non-speech suppression set over the base GPT-2-style
# vocab (annotation brackets, music symbols, speaker dashes) — identical
# across every multilingual whisper size; the published checkpoints ship
# exactly this list in config.json (consumed by the reference through
# openai-whisper's transcribe defaults, AB/wavToWhisper.py:10-13)
_WHISPER_SYMBOL_SUPPRESS = [
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254,
]


def export_causal_lm_state_dict(params: Mapping, cfg) -> Dict[str, np.ndarray]:
    """audax causal-LM params (Qwen2/Qwen3/Qwen3-MoE family) -> HF
    ``*ForCausalLM`` state_dict (numpy values)."""
    _check_float_tree(params)
    out: Dict[str, np.ndarray] = {}
    embed = _np(params["embed"])
    out["model.embed_tokens.weight"] = embed
    moe = cfg.num_experts > 0
    for i, layer in enumerate(_unstack(params["layers"], cfg.layers)):
        pr = f"model.layers.{i}"
        out[f"{pr}.input_layernorm.weight"] = _np(layer["attn_norm"]["scale"])
        for name, proj in (("q", "q_proj"), ("k", "k_proj"),
                           ("v", "v_proj"), ("o", "o_proj")):
            _put_linear(out, f"{pr}.self_attn.{proj}", layer[name])
        out[f"{pr}.post_attention_layernorm.weight"] = \
            _np(layer["mlp_norm"]["scale"])
        if moe:
            out[f"{pr}.mlp.gate.weight"] = np.ascontiguousarray(
                _np(layer["router"]["kernel"]).T)
            for name, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                               ("down", "down_proj")):
                stack = _np(layer["experts"][name]["kernel"])  # [E, in, out]
                for e in range(cfg.num_experts):
                    out[f"{pr}.mlp.experts.{e}.{proj}.weight"] = \
                        np.ascontiguousarray(stack[e].T)
        else:
            for name, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                               ("down", "down_proj")):
                _put_linear(out, f"{pr}.mlp.{proj}", layer[name])
        if cfg.qk_norm:
            out[f"{pr}.self_attn.q_norm.weight"] = _np(layer["q_norm"]["scale"])
            out[f"{pr}.self_attn.k_norm.weight"] = _np(layer["k_norm"]["scale"])
    out["model.norm.weight"] = _np(params["norm"]["scale"])
    out["lm_head.weight"] = (embed if cfg.tie_embeddings else
                             np.ascontiguousarray(
                                 _np(params["lm_head"]["kernel"]).T))
    return out


def hf_causal_lm_config_dict(cfg) -> Dict[str, Any]:
    """CausalLMConfig -> HF config.json fields (causal_lm.py:
    port_causal_lm_from_hf inverse). Qwen2 layout when qkv_bias, else
    Qwen3 (qk_norm / decoupled head_dim); MoE -> Qwen3-MoE."""
    moe = cfg.num_experts > 0
    if moe:
        model_type, arch = "qwen3_moe", "Qwen3MoeForCausalLM"
    elif cfg.qk_norm or not cfg.qkv_bias:
        model_type, arch = "qwen3", "Qwen3ForCausalLM"
    else:
        model_type, arch = "qwen2", "Qwen2ForCausalLM"
    d: Dict[str, Any] = {
        "model_type": model_type,
        "architectures": [arch],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.d_model,
        "num_hidden_layers": cfg.layers,
        "num_attention_heads": cfg.heads,
        "num_key_value_heads": cfg.kv_heads,
        # derived properties, not the raw fields: audax-native configs
        # legitimately leave ffn_dim/moe_ffn_dim 0 (width derived), and a
        # raw 0 here would make HF construct zero-width MLPs that
        # shape-mismatch the exported tensors
        "intermediate_size": cfg.ffn,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": cfg.tie_embeddings,
        "max_position_embeddings": cfg.max_seq,
    }
    if cfg.head_dim:
        d["head_dim"] = cfg.head_dim
    if moe:
        d.update(num_experts=cfg.num_experts,
                 num_experts_per_tok=cfg.experts_per_tok,
                 moe_intermediate_size=cfg.moe_ffn,
                 norm_topk_prob=cfg.norm_topk_prob,
                 decoder_sparse_step=1, mlp_only_layers=[])
    return d
