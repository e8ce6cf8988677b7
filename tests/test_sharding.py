"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 implication (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn
from ct_diffusionmodelbench_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    param_specs,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_mesh_shapes():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(data=3)


@pytest.mark.parametrize("preset", ["llada-tiny", "llada-moe-tiny"])
def test_param_specs_cover_tree(preset):
    cfg = get_config(preset, dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    specs = param_specs(cfg)
    jax.tree.map(lambda a, s: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))  # structure must match


@pytest.mark.parametrize("preset,dp,tp", [
    ("llada-tiny", 2, 4),
    ("llada-tiny", 1, 8),
    ("llada-moe-tiny", 2, 4),
    ("dream-tiny", 2, 4),
])
def test_sharded_forward_matches_single_device(preset, dp, tp):
    """TP+DP logits == single-device logits (the collectives XLA inserts
    from the shardings must be numerically transparent)."""
    cfg = get_config(preset, dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (4, 16), 3, cfg.vocab_size - 2)

    ref, aux_ref = make_forward_fn(cfg.replace(attn_impl="reference"))(params, ids)

    mesh = make_mesh(data=dp, model=tp)
    sharded_params = shard_params(cfg, params, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    out, aux = fwd(sharded_params, ids)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(aux_ref), float(aux), rtol=1e-4, atol=1e-5)


def test_sharded_params_are_distributed():
    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(data=2, model=4)
    sp = shard_params(cfg, params, mesh)
    wq = sp["blocks"]["wq"]
    # column-parallel: sharded over last dim on the 4-way model axis
    assert len(wq.sharding.device_set) == 8
    shard_shape = wq.sharding.shard_shape(wq.shape)
    assert shard_shape[-1] == wq.shape[-1] // 4


def test_tail_batch_under_dp_sp_mesh():
    """Batch not divisible by dp under a dp2 x sp2 x tp2 mesh: the tail path
    must replicate the batch dim (not silently shard batch over 'seq' —
    ADVICE r2 medium) and still match the single-device forward."""
    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(7), (3, 16), 3, cfg.vocab_size - 2)

    ref, _ = make_forward_fn(cfg.replace(attn_impl="reference"))(params, ids)

    mesh = make_mesh(data=2, seq=2, model=2)
    sharded_params = shard_params(cfg, params, mesh)
    fwd = make_sharded_forward(cfg, mesh)
    out, _ = fwd(sharded_params, ids)

    # The batch dim of the output must not be sharded (replicated tail).
    spec = out.sharding.spec
    assert spec[0] is None, spec
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-4)


def test_sharded_sampler_end_to_end():
    """The full fused denoise loop jitted over the mesh."""
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(data=2, model=4)
    sharded_params = shard_params(cfg, params, mesh)
    fwd = make_sharded_forward(cfg, mesh)

    prompts = jax.random.randint(jax.random.key(2), (4, 8), 3, cfg.vocab_size - 2)
    out_sharded = llada_generate(
        fwd, sharded_params, prompts,
        steps=8, gen_length=8, block_length=4, mask_id=cfg.mask_token_id)

    ref_fwd = make_forward_fn(cfg.replace(attn_impl="reference"))
    out_ref = llada_generate(
        ref_fwd, params, prompts,
        steps=8, gen_length=8, block_length=4, mask_id=cfg.mask_token_id)
    np.testing.assert_array_equal(np.asarray(out_sharded), np.asarray(out_ref))
