"""Ring attention (sequence/context parallelism) vs the dense reference.

The reference repo has no SP at all (SURVEY.md §2.4 P5); these tests pin the
TPU-native ring implementation (ops/ring_attention.py) to the dense jnp
oracle on the virtual 8-device mesh: forward equality (with and without a
padding mask), gradient equality (the path trains), and composition with
DP x TP on a 3-axis mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.ops.attention import attention, attention_reference
from ct_diffusionmodelbench_tpu.ops.ring_attention import ring_attention
from ct_diffusionmodelbench_tpu.parallel.mesh import make_mesh, use_mesh


def _qkv(key, b=2, s=128, h=4, kv=2, dh=32, dtype=jnp.float32):
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, dh), dtype)
    k = jax.random.normal(kk, (b, s, kv, dh), dtype)
    v = jax.random.normal(kv_, (b, s, kv, dh), dtype)
    return q, k, v


@pytest.mark.parametrize("seq", [2, 4, 8])
def test_ring_matches_reference(seq):
    mesh = make_mesh(data=1, seq=seq, model=1)
    q, k, v = _qkv(jax.random.key(0))
    want = attention_reference(q, k, v)
    got = ring_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_with_padding_mask():
    mesh = make_mesh(data=2, seq=2, model=2)
    q, k, v = _qkv(jax.random.key(1))
    # Left-padded rows: ragged real-token prefixes per batch row.
    mask = (jnp.arange(q.shape[1])[None, :]
            >= jnp.array([5, 37])[:, None]).astype(jnp.int32)
    want = attention_reference(q, k, v, mask=mask)
    got = ring_attention(q, k, v, mask=mask, mesh=mesh)
    # Padded *query* rows are unspecified garbage in both impls; compare
    # only the real rows.
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=2e-5, atol=2e-5)


def test_ring_grad_matches_reference():
    mesh = make_mesh(data=1, seq=4, model=2)
    q, k, v = _qkv(jax.random.key(2), s=64, dh=16)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.tanh(ring_attention(q, k, v, mesh=mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(attention_reference(q, k, v)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_dispatcher_takes_ring_path_under_seq_mesh():
    mesh = make_mesh(data=2, seq=2, model=2)
    q, k, v = _qkv(jax.random.key(3))
    want = attention_reference(q, k, v)
    with use_mesh(mesh):
        got = attention(q, k, v, impl="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dispatcher_falls_back_on_indivisible_seq():
    mesh = make_mesh(data=1, seq=8, model=1)
    q, k, v = _qkv(jax.random.key(4), s=100)  # 100 % 8 != 0
    want = attention_reference(q, k, v)
    with use_mesh(mesh):
        got = attention(q, k, v, impl="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_explicit_impl_wins_under_seq_mesh(monkeypatch):
    """impl="reference" (the numerics oracle) must stay forceable under an
    SP mesh — the ring path only fires on impl="auto" (ADVICE r2)."""
    import ct_diffusionmodelbench_tpu.ops.ring_attention as ra

    mesh = make_mesh(data=1, seq=2, model=1)
    q, k, v = _qkv(jax.random.key(6), s=64)

    def _boom(*a, **kw):
        raise AssertionError("ring path taken despite explicit impl")

    monkeypatch.setattr(ra, "ring_attention", _boom)
    want = attention_reference(q, k, v)
    with use_mesh(mesh):
        got = attention(q, k, v, impl="reference")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_full_forward_under_seq_mesh():
    """End-to-end model forward with activations sharded over (data, seq)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)
    from ct_diffusionmodelbench_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    fwd = make_forward_fn(cfg)
    ids = jax.random.randint(jax.random.key(5), (2, 64), 0, cfg.vocab_size)

    want, _ = fwd(params, ids)

    mesh = make_mesh(data=2, seq=2, model=2)
    ids_sharded = jax.device_put(
        ids, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS)))

    @jax.jit
    def run(params, ids):
        with use_mesh(mesh):
            logits, aux = fwd(params, ids)
        return logits, aux

    got, _ = run(params, ids_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
