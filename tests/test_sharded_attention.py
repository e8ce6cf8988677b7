"""shard_map-wrapped Pallas attention on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.ops.attention import attention, attention_reference
from ct_diffusionmodelbench_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    shard_params,
    use_mesh,
)
from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _qkv(h, kv):
    ks = jax.random.split(jax.random.key(0), 3)
    return (jax.random.normal(ks[0], (2, 96, h, 32)),
            jax.random.normal(ks[1], (2, 96, kv, 32)),
            jax.random.normal(ks[2], (2, 96, kv, 32)))


def test_sharded_pallas_matches_reference():
    mesh = make_mesh(data=2, model=4)
    q, k, v = _qkv(8, 4)
    mask = jnp.ones((2, 96), jnp.int32).at[0, :10].set(0)
    ref = attention_reference(q, k, v, mask)
    with use_mesh(mesh):
        out = attention(q, k, v, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


def test_indivisible_heads_fall_back():
    mesh = make_mesh(data=2, model=4)
    q, k, v = _qkv(8, 2)  # kv=2 doesn't divide model axis 4
    with use_mesh(mesh):
        out = attention(q, k, v, None, impl="pallas")
    np.testing.assert_allclose(np.asarray(attention_reference(q, k, v, None)),
                               np.asarray(out), rtol=2e-5, atol=2e-5)


def test_sharded_forward_pallas_matches_reference_forward():
    """Full model forward over the mesh with the shard_map pallas attention
    == single-device reference forward."""
    cfg = get_config("llada-tiny", dtype="float32")  # 4 heads, kv 4
    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (2, 24), 3, cfg.vocab_size - 2)
    ref, _ = make_forward_fn(cfg.replace(attn_impl="reference"))(params, ids)

    mesh = make_mesh(data=2, model=4)
    fwd = make_sharded_forward(cfg, mesh, attn_impl="pallas")
    out, _ = fwd(shard_params(cfg, params, mesh), ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-4)
