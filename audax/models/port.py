"""Checkpoint porting: HF torch Whisper -> audax param pytrees.

The reference consumes pretrained checkpoints through transformers
(AB/fineTune.py:131, AB/wavToWhisper.py) — here we port the weights once
into our functional param tree and run everything in JAX. Works from an
in-memory ``WhisperForConditionalGeneration`` (parity tests use random tiny
configs — this environment has no network egress) or from a local
``state_dict``; no network access required.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from audax.core.config import WhisperConfig

__all__ = ["whisper_config_from_hf", "port_whisper_from_hf",
           "port_whisper_state_dict"]


def whisper_config_from_hf(hf_config) -> WhisperConfig:
    return WhisperConfig(
        n_mels=hf_config.num_mel_bins,
        n_audio_ctx=hf_config.max_source_positions,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        heads=hf_config.encoder_attention_heads,
        vocab_size=hf_config.vocab_size,
        n_text_ctx=hf_config.max_target_positions,
    )


def _t(arr) -> np.ndarray:
    return np.asarray(arr.detach().cpu().numpy() if hasattr(arr, "detach") else arr)


def _ln(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _linear(sd: Mapping, prefix: str, *, bias: bool = True) -> Dict[str, Any]:
    p = {"kernel": jnp.asarray(_t(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{prefix}.bias"]))
    return p


def _attn(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "q": _linear(sd, f"{prefix}.q_proj"),
        "k": _linear(sd, f"{prefix}.k_proj", bias=False),
        "v": _linear(sd, f"{prefix}.v_proj"),
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def _stack(dicts):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)


def port_whisper_state_dict(sd: Mapping, cfg: WhisperConfig) -> Dict[str, Any]:
    """HF ``model.`` state_dict -> audax params (stacked-layer layout)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        enc_layers.append({
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
            "mlp_in": _linear(sd, f"{p}.fc1"),
            "mlp_out": _linear(sd, f"{p}.fc2"),
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        dec_layers.append({
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "cross_ln": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "cross_attn": _attn(sd, f"{p}.encoder_attn"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
            "mlp_in": _linear(sd, f"{p}.fc1"),
            "mlp_out": _linear(sd, f"{p}.fc2"),
        })

    return {
        "encoder": {
            # torch conv1d weight [out, in, k] -> lax HIO [k, in, out]
            "conv1": {"kernel": jnp.asarray(_t(sd["encoder.conv1.weight"]).transpose(2, 1, 0)),
                      "bias": jnp.asarray(_t(sd["encoder.conv1.bias"]))},
            "conv2": {"kernel": jnp.asarray(_t(sd["encoder.conv2.weight"]).transpose(2, 1, 0)),
                      "bias": jnp.asarray(_t(sd["encoder.conv2.bias"]))},
            "pos": jnp.asarray(_t(sd["encoder.embed_positions.weight"])),
            "layers": _stack(enc_layers),
            "ln": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "embed": jnp.asarray(_t(sd["decoder.embed_tokens.weight"])),
            "pos": jnp.asarray(_t(sd["decoder.embed_positions.weight"])),
            "layers": _stack(dec_layers),
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }


def port_whisper_from_hf(hf_model) -> Dict[str, Any]:
    """Port a live transformers WhisperForConditionalGeneration/WhisperModel."""
    cfg = whisper_config_from_hf(hf_model.config)
    base = getattr(hf_model, "model", hf_model)
    return port_whisper_state_dict(base.state_dict(), cfg)
