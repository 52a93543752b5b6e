"""Core config/logging/rng/mesh unit tests."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from audax.core import rng as rnglib
from audax.core.artifacts import find_latest, stamped_name
from audax.core.config import (ClassifierTrainConfig, MelConfig, MeshConfig,
                               load_dotenv, replace)
from audax.core.logging import SUCCESS, get_logger
from audax.parallel.mesh import data_sharding, local_mesh, make_mesh, shard_batch


def test_mel_config_presets():
    v2 = MelConfig.urbansound_v2()
    assert (v2.n_fft, v2.hop_length, v2.n_mels) == (1024, 128, 128)
    assert v2.frames_for(64000) == 501          # [128, 501] v2 contract
    v1 = MelConfig.urbansound_v1()
    assert v1.frames_for(64000) == 126          # [64, 126] v1 contract
    w = MelConfig.whisper()
    assert (w.n_fft, w.hop_length, w.n_mels) == (400, 160, 80)
    assert w.frames_for(480000) == 3001         # minus dropped frame -> 3000


def test_whisper_family_presets():
    """The published whisper family dims (openai model card); every name
    in the CLI size table must resolve to a preset."""
    from audax.cli.main import WHISPER_SIZES, _whisper_preset
    from audax.core.config import WhisperConfig

    dims = {s: _whisper_preset(s) for s in WHISPER_SIZES}
    assert (dims["tiny"].d_model, dims["tiny"].encoder_layers) == (384, 4)
    assert (dims["base"].d_model, dims["base"].encoder_layers) == (512, 6)
    assert (dims["small"].d_model, dims["small"].encoder_layers) == (768, 12)
    assert (dims["medium"].d_model, dims["medium"].heads) == (1024, 16)
    lv3 = dims["large-v3"]
    assert (lv3.d_model, lv3.n_mels, lv3.vocab_size) == (1280, 128, 51866)
    turbo = dims["large-v3-turbo"]
    # turbo = large-v3 encoder with a distilled 4-layer decoder
    assert turbo.encoder_layers == 32 and turbo.decoder_layers == 4
    assert (turbo.d_model, turbo.n_mels) == (lv3.d_model, lv3.n_mels)
    assert WhisperConfig.medium().vocab_size == 51865


def test_config_env_overlay(monkeypatch):
    monkeypatch.setenv("N_MELS", "64")
    monkeypatch.setenv("HOP_LENGTH", "512")
    cfg = MelConfig.from_env()
    assert cfg.n_mels == 64 and cfg.hop_length == 512
    cfg2 = replace(cfg, n_mels=128)
    assert cfg2.n_mels == 128
    hash(cfg2)  # frozen => usable as jit static arg


def test_dotenv(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text("# comment\nBATCH_SIZE=32\nNAME='quoted'\n")
    monkeypatch.delenv("BATCH_SIZE", raising=False)
    parsed = load_dotenv(str(p))
    assert parsed["BATCH_SIZE"] == "32" and parsed["NAME"] == "quoted"
    cfg = ClassifierTrainConfig.from_env()
    assert cfg.batch_size == 32


def test_stamped_name(tmp_path):
    name = stamped_name("urbansound8k_cnn_final", n_mels=128, hop_length=128,
                        batch_size=16, epochs=20, learning_rate=0.0003,
                        dropout=0.3, ext=".ckpt")
    assert name == ("urbansound8k_cnn_final_mels128_hop128_batch16_epochs20"
                    "_lr0.0003_dropout0.3.ckpt")
    (tmp_path / "a.ckpt").write_text("x")
    (tmp_path / "b.ckpt").write_text("x")
    assert find_latest(str(tmp_path), "*.ckpt") is not None
    assert find_latest(str(tmp_path), "*.nope") is None


def test_logger_success_level(capsys):
    log = get_logger("audax.test")
    log.setLevel(logging.DEBUG)
    log.success("it worked")
    assert logging.getLevelName(SUCCESS) == "SUCCESS"


def test_rng_named_split_stable():
    k = rnglib.key(0)
    d1 = rnglib.split_named(k, ["dropout", "init"])
    d2 = rnglib.split_named(k, ["init", "dropout", "extra"])
    assert jnp.array_equal(d1["init"], d2["init"])
    assert not jnp.array_equal(d1["init"], d1["dropout"])


def test_mesh_and_sharding():
    mesh = local_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(MeshConfig(model=2))
    assert mesh2.shape["model"] == 2
    assert mesh2.shape["data"] * 2 == len(jax.devices())

    batch = {"x": np.ones((9, 4), np.float32), "y": np.arange(9)}
    sharded = shard_batch(mesh, batch)
    # padded up to a multiple of the data axis (8 devices -> 16)
    assert sharded["x"].shape[0] % mesh.shape["data"] == 0
    s = data_sharding(mesh, 2)
    assert s.spec == jax.sharding.PartitionSpec("data", None)
