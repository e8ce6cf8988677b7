import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.models.moe import _experts_dense, router_probs
from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
    grouped_expert_ffn_pallas,
    padded_layout,
)


def _setup(N=48, D=128, E=6, Fm=128, K=2, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(ks[0], (N, D))
    wg = jax.random.normal(ks[1], (E, D, Fm)) / np.sqrt(D)
    wu = jax.random.normal(ks[2], (E, D, Fm)) / np.sqrt(D)
    wd = jax.random.normal(ks[3], (E, Fm, D)) / np.sqrt(Fm)
    wr = jax.random.normal(ks[4], (D, E)) / np.sqrt(D)
    tp, ti, _ = router_probs(x, wr, K, True)
    return x, tp, ti, wg, wu, wd


def test_matches_dense_oracle():
    x, tp, ti, wg, wu, wd = _setup()
    dense = _experts_dense(x, tp, ti, wg, wu, wd)
    pallas = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(pallas),
                               rtol=1e-4, atol=1e-5)


def test_skewed_routing():
    """All tokens routed to one expert (worst-case ragged layout)."""
    x, tp, ti, wg, wu, wd = _setup()
    ti = jnp.zeros_like(ti).at[:, 1].set(3)  # experts {0, 3} only
    dense = _experts_dense(x, tp, ti, wg, wu, wd)
    pallas = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(pallas),
                               rtol=1e-4, atol=1e-5)


def test_padded_layout_invariants():
    sizes = jnp.array([5, 0, 17, 2], jnp.int32)
    m = int(sizes.sum())
    dest, tile_expert, m_pad = padded_layout(sizes, m, tile_m=8)
    dest = np.asarray(dest)
    te = np.asarray(tile_expert)
    # destinations unique and within bounds
    assert len(set(dest.tolist())) == m
    assert dest.max() < m_pad
    # each row's tile is owned by its own expert
    groups = np.repeat(np.arange(4), np.asarray(sizes))
    for row, g in zip(dest, groups):
        assert te[row // 8] == g, (row, g)


def test_manual_dma_pair_matches_dense_oracle():
    """The manual weight-pipelined pair (round-3 default on aligned shapes)
    against the dense oracle, including a skewed routing."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        counting_layout, grouped_gateup_manual, grouped_matmul_manual)

    x, tp, ti, wg, wu, wd = _setup()
    dense = _experts_dense(x, tp, ti, wg, wu, wd)
    got = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    ti2 = jnp.zeros_like(ti).at[:, 1].set(3)
    dense2 = _experts_dense(x, tp, ti2, wg, wu, wd)
    got2 = grouped_expert_ffn_pallas(x, tp, ti2, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense2), np.asarray(got2),
                               rtol=1e-4, atol=1e-5)

    # manual pair vs auto pair on the padded layout directly
    n, k = ti.shape
    e = wg.shape[0]
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_gateup_padded, grouped_matmul_padded)
    dest, tile_expert, _, m_pad = counting_layout(ti, e, 8)
    src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
        jnp.arange(n * k, dtype=jnp.int32) // k)
    xp = jnp.take(x, src, axis=0, mode="clip")
    h_auto = grouped_gateup_padded(xp, wg, wu, tile_expert, 8)
    h_man = grouped_gateup_manual(xp, wg, wu, tile_expert, 8)
    np.testing.assert_allclose(np.asarray(h_man), np.asarray(h_auto),
                               rtol=1e-5, atol=1e-6)
    o_auto = grouped_matmul_padded(h_auto, wd, tile_expert, 8)
    o_man = grouped_matmul_manual(h_auto, wd, tile_expert, 8)
    np.testing.assert_allclose(np.asarray(o_man), np.asarray(o_auto),
                               rtol=1e-5, atol=1e-6)


def test_manual_pair_nsub_matches_nsub1():
    """nsub>1 (multiple layout tiles per grid step, grouped_gemm_pallas
    _gateup_manual_kernel) is a pure scheduling change: identical outputs
    to the nsub=1 kernels, including with a skewed routing whose expert
    runs straddle grid-step boundaries."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        counting_layout, grouped_gateup_manual, grouped_matmul_manual)

    for skew in (False, True):
        x, tp, ti, wg, wu, wd = _setup()
        if skew:
            ti = jnp.zeros_like(ti).at[:, 1].set(3)
        n, k = ti.shape
        e = wg.shape[0]
        dest, tile_expert, _, m_pad = counting_layout(ti, e, 8)
        src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
            jnp.arange(n * k, dtype=jnp.int32) // k)
        xp = jnp.take(x, src, axis=0, mode="clip")
        h1 = grouped_gateup_manual(xp, wg, wu, tile_expert, 8)
        h2 = grouped_gateup_manual(xp, wg, wu, tile_expert, 8, nsub=2)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        o1 = grouped_matmul_manual(h1, wd, tile_expert, 8)
        o2 = grouped_matmul_manual(h1, wd, tile_expert, 8, nsub=2)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        # non-dividing nsub falls back to 1 (no error, same numbers)
        ntiles = m_pad // 8
        bad = 3 if ntiles % 3 else 7
        o3 = grouped_matmul_manual(h1, wd, tile_expert, 8, nsub=bad)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o3))


def test_stacked_weights_require_layer_index():
    """4-D [L, E, D, Fm] stacks without layer_index must fail loudly instead
    of silently computing with layer 0's experts (ADVICE r2)."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import grouped_expert_ffn

    x, tp, ti, wg, wu, wd = _setup(N=16, D=64, E=4, Fm=64, K=2)
    wg4, wu4, wd4 = (jnp.stack([w, w]) for w in (wg, wu, wd))
    with pytest.raises(ValueError, match="layer_index"):
        grouped_expert_ffn(x, tp, ti, wg4, wu4, wd4)


def test_jit_and_grad_compatible():
    """The kernel path must trace under jit (used inside the MoE block)."""
    x, tp, ti, wg, wu, wd = _setup(N=16, D=64, E=4, Fm=64, K=2)
    f = jax.jit(lambda *a: grouped_expert_ffn_pallas(*a, tile_m=8))
    out = f(x, tp, ti, wg, wu, wd)
    assert out.shape == x.shape


def test_stacked_layer_index_matches_dense():
    """4-D [L, E, D, Fm] stacks + scalar-prefetched layer id == per-layer
    dense oracle (the slice-copy-free path transformer.forward scans)."""
    L = 3
    stacks = [_setup(seed=s) for s in range(L)]
    wg = jnp.stack([s[3] for s in stacks])
    wu = jnp.stack([s[4] for s in stacks])
    wd = jnp.stack([s[5] for s in stacks])
    x, tp, ti = stacks[1][:3]
    for li in range(L):
        want = _experts_dense(x, tp, ti, wg[li], wu[li], wd[li])
        got = grouped_expert_ffn_pallas(
            x, tp, ti, wg, wu, wd, tile_m=8,
            layer_index=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_stacked_forward_matches_scanned(monkeypatch):
    """Full model forward with CTDB_MOE_STACKED=1 (stacks as loop
    invariants, layer-indexed kernels) == the default scanned forward."""
    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)

    cfg = get_config("llada-moe-tiny", dtype="float32").replace(
        hidden_size=128, moe_intermediate_size=128, head_dim=32)
    params = init_params(cfg, jax.random.key(7))
    ids = jax.random.randint(jax.random.key(8), (2, 24), 3,
                             cfg.vocab_size - 2)
    fwd = make_forward_fn(cfg)
    want, aux_want = fwd(params, ids)

    monkeypatch.setenv("CTDB_MOE_STACKED", "1")
    monkeypatch.setenv("CTDB_GROUPED_GEMM", "pallas")
    got, aux_got = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(aux_got), float(aux_want),
                               rtol=1e-4, atol=1e-5)


def test_grad_matches_dense_oracle(monkeypatch):
    """Single-chip MoE training differentiates the grouped path: the
    custom_vjp (grouped_gemm._pallas_ffn_ad — Pallas fwd, ragged-vjp bwd)
    must match grads of the dense one-hot oracle."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import grouped_expert_ffn

    monkeypatch.setenv("CTDB_GROUPED_GEMM", "pallas")
    x, tp, ti, wg, wu, wd = _setup()

    def loss_grouped(x, tp, wg, wu, wd):
        return (grouped_expert_ffn(x, tp, ti, wg, wu, wd) ** 2).sum()

    def loss_dense(x, tp, wg, wu, wd):
        return (_experts_dense(x, tp, ti, wg, wu, wd) ** 2).sum()

    got = jax.grad(loss_grouped, argnums=(0, 1, 2, 3, 4))(x, tp, wg, wu, wd)
    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(x, tp, wg, wu, wd)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-4)


def test_grad_stacked_layer_index(monkeypatch):
    """Grad w.r.t. a stacked [L, E, D, Fm] weight lands only in its layer's
    slice and matches the per-layer dense grad."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import grouped_expert_ffn

    monkeypatch.setenv("CTDB_GROUPED_GEMM", "pallas")
    L, li = 3, 1
    stacks = [_setup(seed=s) for s in range(L)]
    wg = jnp.stack([s[3] for s in stacks])
    wu = jnp.stack([s[4] for s in stacks])
    wd = jnp.stack([s[5] for s in stacks])
    x, tp, ti = stacks[1][:3]

    def loss_grouped(wg):
        return (grouped_expert_ffn(x, tp, ti, wg, wu, wd,
                                   layer_index=jnp.int32(li)) ** 2).sum()

    def loss_dense(wg3):
        return (_experts_dense(x, tp, ti, wg3, wu[li], wd[li]) ** 2).sum()

    got = jax.grad(loss_grouped)(wg)
    want = jax.grad(loss_dense)(wg[li])
    np.testing.assert_allclose(np.asarray(got[li]), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    others = np.delete(np.asarray(got), li, axis=0)
    assert np.all(others == 0)


def test_fused_megakernel_matches_dense(monkeypatch):
    """CTDB_GROUPED_FUSED=1 routes through the single-pass megakernel
    (manual expert-run double buffering); must equal the dense oracle."""
    monkeypatch.setenv("CTDB_GROUPED_FUSED", "1")
    x, tp, ti, wg, wu, wd = _setup()
    dense = _experts_dense(x, tp, ti, wg, wu, wd)
    fused = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(fused),
                               rtol=1e-4, atol=1e-5)


def test_fused_megakernel_stacked(monkeypatch):
    monkeypatch.setenv("CTDB_GROUPED_FUSED", "1")
    L = 2
    stacks = [_setup(seed=s) for s in range(L)]
    wg = jnp.stack([s[3] for s in stacks])
    wu = jnp.stack([s[4] for s in stacks])
    wd = jnp.stack([s[5] for s in stacks])
    x, tp, ti = stacks[0][:3]
    for li in range(L):
        want = _experts_dense(x, tp, ti, wg[li], wu[li], wd[li])
        got = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8,
                                        layer_index=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_counting_layout_matches_numpy_reference():
    """The sort-free layout's index math (one-hot cumsum ranks + comparison-
    sum tile owners — optimized away from searchsorted) vs a plain NumPy
    counting sort."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        counting_layout)

    rng = np.random.default_rng(3)
    for e, n, k, tile_m in ((8, 40, 2, 8), (5, 17, 3, 4), (3, 64, 1, 16)):
        idx = rng.integers(0, e, size=(n, k)).astype(np.int32)
        dest, tile_expert, sizes, m_pad = counting_layout(
            jnp.asarray(idx), e, tile_m)
        dest, tile_expert, sizes = (np.asarray(dest), np.asarray(tile_expert),
                                    np.asarray(sizes))
        flat = idx.reshape(-1)
        want_sizes = np.bincount(flat, minlength=e)
        np.testing.assert_array_equal(sizes, want_sizes)
        padded = ((want_sizes + tile_m - 1) // tile_m) * tile_m
        pstarts = np.concatenate([[0], np.cumsum(padded)[:-1]])
        # rank of each slot within its expert, stable in slot order
        seen = np.zeros(e, np.int64)
        want_dest = np.empty_like(flat)
        for s, ex in enumerate(flat):
            want_dest[s] = pstarts[ex] + seen[ex]
            seen[ex] += 1
        np.testing.assert_array_equal(dest, want_dest)
        # every tile's rows belong to exactly the expert it claims
        pend = np.cumsum(padded)
        for t in range(m_pad // tile_m):
            owner = int(np.searchsorted(pend, t * tile_m, side="right"))
            assert tile_expert[t] == min(owner, e - 1)


def test_expert_rank_chunked_matches_cumsum():
    """The MXU-friendly chunked (triangular-matmul) rank formulation is
    integer-exact against the direct one-hot cumsum at sizes that exercise
    the chunk path (M > 256), including a ragged final chunk and a
    single-expert degenerate routing."""
    import os

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import expert_rank

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 64, size=2048).astype(np.int32),      # multiple of 512
        rng.integers(0, 7, size=1300).astype(np.int32),       # ragged chunk
        np.full(777, 3, np.int32),                            # one expert
        rng.integers(0, 64, size=300).astype(np.int32),       # barely chunked
    ]
    for flat in cases:
        e = int(flat.max()) + 1 if flat.size else 1
        e = max(e, 5)
        os.environ["CTDB_ROUTING_RANK"] = "cumsum"
        try:
            want_rank, want_sizes = expert_rank(jnp.asarray(flat), e)
            os.environ["CTDB_ROUTING_RANK"] = "chunked"
            got_rank, got_sizes = expert_rank(jnp.asarray(flat), e)
        finally:
            os.environ.pop("CTDB_ROUTING_RANK", None)
        np.testing.assert_array_equal(np.asarray(got_rank),
                                      np.asarray(want_rank))
        np.testing.assert_array_equal(np.asarray(got_sizes),
                                      np.asarray(want_sizes))


def test_pad_skip_mode_matches_dense_oracle(monkeypatch):
    """CTDB_GROUPED_SKIP_PAD=1 (all-padding tiles zero-filled via the
    _run_schedule sentinel slot) must be output-identical to the default:
    skipped rows are never gathered by the combine.  Off by default — the
    on-chip A/B showed conditional output writes cost more than the skipped
    MXU work (see grouped_expert_ffn_pallas) — but the mechanism stays
    oracle-tested.  Includes a zero-row expert and a skewed routing."""
    monkeypatch.setenv("CTDB_GROUPED_SKIP_PAD", "1")
    x, tp, ti, wg, wu, wd = _setup()
    dense = _experts_dense(x, tp, ti, wg, wu, wd)
    got = grouped_expert_ffn_pallas(x, tp, ti, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(got),
                               rtol=1e-4, atol=1e-5)

    ti2 = jnp.zeros_like(ti).at[:, 1].set(3)  # experts {0, 3}; 1/2/4/5 empty
    dense2 = _experts_dense(x, tp, ti2, wg, wu, wd)
    got2 = grouped_expert_ffn_pallas(x, tp, ti2, wg, wu, wd, tile_m=8)
    np.testing.assert_allclose(np.asarray(dense2), np.asarray(got2),
                               rtol=1e-4, atol=1e-5)


def test_nt_backward_matches_standard(monkeypatch):
    """CTDB_RAGGED_NT=1 swaps the ragged matmuls' backward for the
    non-transposing ragged_dot_general form (memory saver for max-size
    single-chip MoE training, grouped_gemm._ragged_dot_nt).  Grads must
    match the standard transpose-rule backward."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import _ffn_ragged

    x, tp, ti, wg, wu, wd = _setup()

    def loss(x, tp, wg, wu, wd):
        return (_ffn_ragged(x, tp, ti, wg, wu, wd) ** 2).sum()

    monkeypatch.setenv("CTDB_RAGGED_NT", "0")
    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, tp, wg, wu, wd)
    monkeypatch.setenv("CTDB_RAGGED_NT", "1")
    got = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, tp, wg, wu, wd)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)
