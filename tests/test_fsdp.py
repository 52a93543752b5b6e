"""FSDP / ZeRO-3 sharding: spec derivation, exact training parity vs the
replicated step, and the memory claim (per-device param+moment bytes shrink
by ~the data-axis size). The reference trains fully replicated
(AB/fineTune.py holds params + Adam moments per device); this is the
TPU-native capability that replaces it at scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audax.core.config import FineTuneConfig, MeshConfig, WhisperConfig
from audax.models.whisper import init_whisper_params
from audax.parallel.fsdp import fsdp_shard_state, fsdp_specs, shard_params_fsdp
from audax.parallel.mesh import make_mesh, shard_batch
from audax.train.seq2seq import (collate_seq2seq, init_finetune,
                                 make_finetune_step)

CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=2,
                    decoder_layers=2, heads=4, vocab_size=128, n_text_ctx=16)


def _params():
    return init_whisper_params(CFG, jax.random.key(0))


def test_fsdp_specs_add_data_axis():
    mesh = make_mesh(MeshConfig(model=2))              # (data=4, model=2)
    specs = fsdp_specs(_params(), mesh, min_size=256)
    # column-parallel TP kernel [L, d, d] gains 'data' on the free d dim
    assert specs["decoder"]["layers"]["attn"]["q"]["kernel"] \
        == P(None, "data", "model")
    # a replicated-by-rules kernel gets a pure FSDP dim (largest: 4d)
    assert "data" in tuple(specs["decoder"]["layers"]["mlp_in"]["kernel"])
    # tiny tensors stay replicated (gather latency > bytes)
    assert specs["encoder"]["ln"]["scale"] == P()
    # vocab 128 not divisible by model=2 at dim0? 128 % 2 == 0 -> TP holds,
    # FSDP lands on the other dim
    emb = specs["decoder"]["embed"]
    assert "model" in tuple(emb) and "data" in tuple(emb)


def test_fsdp_memory_shards(rng):
    """Every large tensor is actually split: per-device shard bytes times
    the mesh size ~= total bytes (the ZeRO-3 memory claim)."""
    mesh = make_mesh(MeshConfig(model=1))              # pure DP=8
    params = shard_params_fsdp(_params(), mesh, min_size=256)
    big = [l for l in jax.tree.leaves(params) if l.size >= 256
           and any(d % 8 == 0 and d >= 8 for d in l.shape)]
    assert big
    for leaf in big:
        shard = leaf.addressable_shards[0].data
        assert shard.size * 8 == leaf.size, (leaf.shape, shard.shape)


@pytest.mark.parametrize("model_axis", [1, 2])
def test_fsdp_training_matches_replicated(rng, model_axis):
    """3 ZeRO-3 fine-tune steps (params+moments sharded over 'data', with
    and without TP on top) reproduce the replicated losses — XLA's
    all-gather/reduce-scatter schedule is numerically exact here."""
    mesh = make_mesh(MeshConfig(model=model_axis))
    ft = FineTuneConfig(learning_rate=1e-3, warmup_steps=1, max_steps=10,
                        lora_rank=0)
    step = make_finetune_step(CFG, remat=False, donate=False)

    b = 8
    mel = rng.standard_normal((b, 2 * CFG.n_audio_ctx, CFG.n_mels)) \
        .astype(np.float32)
    lab = collate_seq2seq([[3, 4, 5, 2]] * b, decoder_start_id=1,
                          pad_multiple=4)
    batch = {"mel": jnp.asarray(mel),
             "decoder_input_ids": jnp.asarray(lab["decoder_input_ids"]),
             "labels": jnp.asarray(lab["labels"])}

    ref_state = init_finetune(_params(), ft)
    ref_losses = []
    for _ in range(3):
        ref_state, m = step(ref_state, batch)
        ref_losses.append(float(np.asarray(m["loss"])))

    state = fsdp_shard_state(init_finetune(_params(), ft), mesh,
                             min_size=256)
    # moments inherited the param layout (not just the params); opt_state
    # layout: (clip, ScaleByAdamLPState, decay, lr) since train/optim.py's
    # adamw_lp replaced the nested optax.adamw chain
    q_mu = state.opt_state[1].mu["decoder"]["layers"]["attn"]["q"]["kernel"]
    assert "data" in jax.tree.leaves(
        q_mu.sharding.spec, is_leaf=lambda x: x is not None) or \
        "data" in tuple(q_mu.sharding.spec)
    sbatch = shard_batch(mesh, batch)
    losses = []
    for _ in range(3):
        state, m = step(state, sbatch)
        losses.append(float(np.asarray(m["loss"])))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=1e-6)
    # updated params kept the ZeRO-3 layout across steps (no silent
    # gather-and-stay-replicated after the first update)
    q = state.trainable["decoder"]["layers"]["attn"]["q"]["kernel"]
    assert "data" in tuple(q.sharding.spec), q.sharding.spec
