"""UrbanSound8K classifier family (Flax linen).

Capability-parity rebuilds of the reference classifiers, laid out TPU-first
(feature-last [B, T, C] tensors so convs/matmuls tile onto the MXU):

* ``CNNClassifier`` — 1D CNN over log-mel frames with mel bins as channels
  (reference: .charles/spectrogram.py:442-515 — 4 conv blocks 128/256/512/512,
  BN+ReLU+maxpool+dropout, global average pool, 512->256->128->10 MLP head).
* ``TransformerClassifier`` — encoder-only ViT-style classifier with CLS or
  mean pooling (reference: spectrogram.py:944-1057 and the mean-pool variant
  spectrogram_wo_CLS.py:943-1046). The reference created its positional
  embedding lazily at first forward — *after* the optimizer captured params,
  so it was never trained (spectrogram.py:1019-1023); here it is a proper
  init-time parameter sized to a static max sequence length.
* ``WaveformCNNClassifier`` — raw-waveform 1D CNN (reference:
  spectrogram.py:664-697; dead code there — its dataset class never existed —
  functional here).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from audax.core.config import CNNClassifierConfig, TransformerClassifierConfig

__all__ = ["CNNClassifier", "TransformerClassifier", "WaveformCNNClassifier"]


class _ConvBlock(nn.Module):
    features: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.features, kernel_size=(3,), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class CNNClassifier(nn.Module):
    """Log-mel [B, T, n_mels] -> logits [B, num_classes]."""

    cfg: CNNClassifierConfig = CNNClassifierConfig()

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for feats in self.cfg.channels:
            x = _ConvBlock(feats, self.cfg.dropout)(x, train=train)
        x = jnp.mean(x, axis=1)                       # global average pool over time
        for width in self.cfg.head_dims:
            x = nn.relu(nn.Dense(width)(x))
            x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        return nn.Dense(self.cfg.num_classes)(x)

    def embeddings(self, variables, x):
        """Pooled pre-head features (reference get_feature_embeddings,
        spectrogram.py:507-515)."""
        def run(mdl, x):
            for feats in mdl.cfg.channels:
                x = _ConvBlock(feats, mdl.cfg.dropout)(x, train=False)
            return jnp.mean(x, axis=1)
        return nn.apply(run, self)(variables, x)


class _EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (nn.TransformerEncoderLayer shape:
    MHA -> add&norm -> GELU MLP -> add&norm)."""

    dim: int
    heads: int
    mlp_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            dropout_rate=self.dropout, deterministic=not train,
        )(x, x)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        h = nn.gelu(nn.Dense(self.mlp_dim)(x))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(h))
        return x


class TransformerClassifier(nn.Module):
    """Log-mel [B, T, n_mels] -> logits [B, num_classes].

    ``cfg.pool``: "cls" prepends a learnable CLS token and classifies its
    final state; "mean" pools over time (the wo_CLS variant).
    """

    cfg: TransformerClassifierConfig = TransformerClassifierConfig()
    max_len: int = 512            # static positional-embedding capacity

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.cfg
        b, t, _ = x.shape
        use_cls = c.pool == "cls"
        x = nn.Dense(c.dim, name="input_proj")(x)    # per-frame projection
        if use_cls:
            cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, c.dim))
            x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        seq = t + int(use_cls)
        if seq > self.max_len:
            raise ValueError(f"sequence {seq} exceeds max_len {self.max_len}")
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_len, c.dim))
        x = x + pos[:, :seq]
        x = nn.Dropout(c.dropout, deterministic=not train)(x)
        for _ in range(c.layers):
            x = _EncoderLayer(c.dim, c.heads, c.mlp_dim, c.dropout)(x, train=train)
        x = nn.LayerNorm()(x)
        pooled = x[:, 0] if use_cls else jnp.mean(x, axis=1)
        h = nn.relu(nn.Dense(c.mlp_dim)(pooled))
        h = nn.Dropout(c.dropout, deterministic=not train)(h)
        return nn.Dense(c.num_classes)(h)


class WaveformCNNClassifier(nn.Module):
    """Raw audio [B, n_samples, 1] -> logits. Front conv k80 s16 mimics a
    learnable filterbank (reference: spectrogram.py:667-692)."""

    num_classes: int = 10
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.ndim == 2:
            x = x[..., None]
        x = nn.Conv(64, kernel_size=(80,), strides=(16,), use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        x = nn.max_pool(x, window_shape=(4,), strides=(4,))
        for feats in (128, 256):
            x = _ConvBlock(feats, self.dropout)(x, train=train)
        x = jnp.mean(x, axis=1)
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
