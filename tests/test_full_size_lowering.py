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
