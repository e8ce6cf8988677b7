"""Prove the FULL-SIZE model graphs compile under TP sharding without
materializing weights: abstract-lower the llada-8b (and MoE) sharded forward
on the virtual 8-device mesh and check XLA inserted collectives.

This is the single-chip-environment stand-in for 'llada-8b needs TP>=2 on
v5e' (SURVEY.md §7 hard-part 7)."""

import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ct_diffusionmodelbench_tpu.models import get_config
from ct_diffusionmodelbench_tpu.models.transformer import forward, init_params
from ct_diffusionmodelbench_tpu.parallel import make_mesh, param_specs
from ct_diffusionmodelbench_tpu.parallel.mesh import DATA_AXIS

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _abstract_params(cfg, mesh):
    """ShapeDtypeStructs with TP shardings — no memory allocated."""
    shapes = jax.eval_shape(lambda k: init_params(cfg, k), jax.random.key(0))
    specs = param_specs(cfg)
    return jax.tree.map(
        lambda s, spec: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec)),
        shapes, specs, is_leaf=lambda x: isinstance(x, P))


@pytest.mark.parametrize("preset", ["llada-8b", "llada-moe-7b", "dream-7b"])
def test_full_size_tp_forward_lowers_with_collectives(preset):
    cfg = get_config(preset).replace(attn_impl="reference")
    mesh = make_mesh(data=2, model=4)
    params_abs = _abstract_params(cfg, mesh)
    ids_abs = jax.ShapeDtypeStruct(
        (2, 384), jax.numpy.int32,
        sharding=NamedSharding(mesh, P(DATA_AXIS, None)))

    fn = jax.jit(lambda p, ids: forward(cfg, p, ids))
    lowered = fn.lower(params_abs, ids_abs)
    # full-size dims survived into the graph
    assert str(cfg.vocab_size) in lowered.as_text()
    # SPMD partitioning (which inserts the collectives) happens in compile;
    # a successful compile of the abstract full-size graph is the proof that
    # the TP sharding layout is consistent end to end.
    compiled = lowered.compile()
    hlo = compiled.as_text()
    assert ("all-reduce" in hlo or "all-gather" in hlo
            or "collective" in hlo or "reduce-scatter" in hlo), \
        "expected XLA collectives from the TP shardings"


def test_executed_sharded_generate_beyond_toy_scale():
    """Round-2 upgrade (VERDICT item 2): actually EXECUTE a TP+DP-sharded
    generate, not just abstract-lower it.  Uses the llada-8b architecture
    (same vocab/rope/head_dim, full 126k vocab sharded 4-way) shrunk to
    ~70M params — executing the true 8B needs ~32 GB of f32 activations on
    this single-core CPU host and adds nothing to the graph being proved;
    the per-op partitioning is identical modulo dimension sizes."""
    import numpy as np

    from ct_diffusionmodelbench_tpu.parallel import make_sharded_forward, shard_params
    from ct_diffusionmodelbench_tpu.models import make_forward_fn
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    cfg = get_config("llada-8b").replace(
        hidden_size=256, num_layers=4, num_heads=8, num_kv_heads=8,
        head_dim=32, intermediate_size=512, dtype="float32",
        attn_impl="reference")
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(cfg, params, mesh)
    fwd = make_sharded_forward(cfg, mesh)

    prompts = jax.random.randint(jax.random.key(1), (2, 16), 10,
                                 cfg.vocab_size - 10)
    kw = dict(steps=4, gen_length=8, block_length=4,
              mask_id=cfg.mask_token_id)
    out = np.asarray(llada_generate(fwd, sharded, prompts, **kw))
    assert not (out == cfg.mask_token_id).any()

    ref_fwd = make_forward_fn(cfg)
    ref = np.asarray(llada_generate(ref_fwd, params, prompts, **kw))
    np.testing.assert_array_equal(out, ref)
