"""Pallas grouped (ragged) GEMM for MoE expert FFNs.

Megablocks-style layout: tokens are already sorted by expert
(ops/grouped_gemm.py); each expert's rows are padded up to a multiple of the
row-tile so **every row tile belongs to exactly one expert**.  A
scalar-prefetched ``tile_expert`` vector then routes each grid step's weight
DMA (PrefetchScalarGridSpec — the index map reads the expert id before the
kernel body runs), so only routed experts' weights ever cross HBM→VMEM and
the MXU never multiplies one token by two experts' weights.

Padding cost: < num_experts * tile_m pad rows (duplicates of token 0's row —
the gather-based layout never writes zeros), which multiply against real
weights but whose outputs are dropped on the unsort gather.

Used when ``CTDB_GROUPED_GEMM=pallas``; the default grouped path is
``jax.lax.ragged_dot`` (XLA's own grouped GEMM) — bench.py-style
measurements pick the winner per shape.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 64
TILE_N = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def padded_layout(group_sizes: jnp.ndarray, m: int, tile_m: int = TILE_M):
    """Compute the expert-aligned padded row layout.

    group_sizes: [E] int32 (sums to m).  Returns
      dest:        [m]        padded destination row for each sorted row,
      tile_expert: [m_pad/tile_m] expert id owning each row tile,
      m_pad:       static padded row count.
    """
    e = group_sizes.shape[0]
    m_pad = _round_up(m, tile_m) + e * tile_m  # static worst case

    sizes = group_sizes.astype(jnp.int32)
    offsets = jnp.cumsum(sizes) - sizes                       # [E] source starts
    padded_sizes = _round_up_arr(sizes, tile_m)
    pstarts = jnp.cumsum(padded_sizes) - padded_sizes         # [E] padded starts

    row = jnp.arange(m, dtype=jnp.int32)
    # group of each sorted row — comparison-sum in place of searchsorted
    # (one VPU fusion vs a binary-search while-loop; see counting_layout)
    g = jnp.sum((jnp.cumsum(sizes)[None, :] <= row[:, None]).astype(jnp.int32),
                axis=1)
    g = jnp.minimum(g, e - 1)
    dest = pstarts[g] + (row - offsets[g])

    tile_start = jnp.arange(m_pad // tile_m, dtype=jnp.int32) * tile_m
    pend = jnp.cumsum(padded_sizes)
    tile_expert = jnp.sum(
        (pend[None, :] <= tile_start[:, None]).astype(jnp.int32), axis=1)
    tile_expert = jnp.minimum(tile_expert, e - 1)
    return dest, tile_expert, m_pad


def _round_up_arr(x, m):
    return (x + m - 1) // m * m


def expert_rank(flat: jnp.ndarray, e: int):
    """(rank-within-expert, per-expert counts) for a flat [M] expert-id
    vector — the core of the counting-sort routing layout.

    Two exact formulations (``CTDB_ROUTING_RANK`` selects; both
    integer-exact, oracle-tested against each other):

    - ``chunked`` (default): reshape to [C, R] chunks; the within-chunk
      prefix count is a strictly-lower-triangular [R, R] x [R, E] MATMUL
      per chunk (0/1 bf16 operands, f32 accumulation — exact for any R),
      so the long-axis scan runs on the MXU; only the tiny [C, E]
      chunk-offset table needs a sequential cumsum.
    - ``cumsum``: the direct jnp.cumsum over [M, E] — a log2(M)-pass
      shift-add ladder over the full one-hot matrix on TPU.
    """
    m = flat.shape[0]
    flat = flat.astype(jnp.int32)
    if os.environ.get("CTDB_ROUTING_RANK", "chunked") == "cumsum" or m <= 256:
        onehot = flat[:, None] == jnp.arange(e, dtype=jnp.int32)[None, :]
        csum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        rank = jnp.sum(jnp.where(onehot, csum - 1, 0), axis=1)
        return rank, csum[-1]

    r = 512
    c = (m + r - 1) // r
    pad = c * r - m
    flat_p = jnp.pad(flat, (0, pad), constant_values=-1)      # -1: no expert
    oh = (flat_p[:, None] == jnp.arange(e, dtype=jnp.int32)[None, :])
    ohf = oh.astype(jnp.bfloat16).reshape(c, r, e)
    # #{j < i in chunk with the same expert}: strict lower-triangular ones.
    ltri = jnp.tril(jnp.ones((r, r), jnp.bfloat16), k=-1)
    intra = jax.lax.dot_general(
        ltri, ohf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [R, C, E]
    intra = jnp.swapaxes(intra, 0, 1)                         # [C, R, E]
    counts = jnp.sum(ohf.astype(jnp.float32), axis=1)         # [C, E]
    offsets = jnp.cumsum(counts, axis=0) - counts             # [C, E] exclusive
    rank_f = jnp.sum(
        jnp.where(oh.reshape(c, r, e), intra + offsets[:, None, :], 0.0),
        axis=-1)                                              # [C, R]
    rank = rank_f.reshape(-1)[:m].astype(jnp.int32)
    sizes = jnp.sum(counts, axis=0).astype(jnp.int32)
    return rank, sizes


def counting_layout(topk_idx: jnp.ndarray, e: int, tile_m: int = TILE_M):
    """Expert-aligned padded row layout WITHOUT a sort.

    ``jnp.argsort`` over the N*K routing slots is a bitonic sort on TPU —
    measured as the dominant per-layer cost of the grouped path at the MoE
    bench shape (M=20480: the sort alone outweighs the expert matmuls).
    Routing doesn't need a sort: a one-hot cumsum gives every slot its rank
    within its expert (stable counting sort), which IS its padded-row offset.

    topk_idx: [N, K] int32 → returns
      dest:        [N*K]  padded destination row of each routing slot
                          (slot order = the natural (token, k) order),
      tile_expert: [m_pad/tile_m] expert id owning each row tile,
      group_sizes: [E] int32,
      m_pad:       static padded row count.
    """
    flat = topk_idx.reshape(-1).astype(jnp.int32)            # [M]
    m = flat.shape[0]
    m_pad = _round_up(m, tile_m) + e * tile_m                # static worst case

    rank, sizes = expert_rank(flat, e)                       # [M], [E]

    padded_sizes = _round_up_arr(sizes, tile_m)
    pstarts = jnp.cumsum(padded_sizes) - padded_sizes        # [E]
    dest = jnp.take(pstarts, flat) + rank                    # [M]

    tile_start = jnp.arange(m_pad // tile_m, dtype=jnp.int32) * tile_m
    pend = jnp.cumsum(padded_sizes)
    # searchsorted(pend, v, "right") == #{i: pend[i] <= v}; the comparison-
    # sum is ONE VPU fusion, whereas jnp.searchsorted lowers to a binary-
    # search while-loop + select fusions (~0.33 ms/layer on-chip at E=64,
    # tools/xprof_generate.py).
    tile_expert = jnp.sum(
        (pend[None, :] <= tile_start[:, None]).astype(jnp.int32), axis=1)
    tile_expert = jnp.minimum(tile_expert, e - 1)
    return dest, tile_expert, sizes, m_pad


def _gmm_kernel(*refs):
    # (te_ref[, li_ref], x_ref, w_ref, o_ref) — w block is [1, D, TN] or
    # [1, 1, D, TN] when layer-stacked.
    x_ref, w_ref, o_ref = refs[-3:]
    o_ref[:, :] = jax.lax.dot_general(
        x_ref[:, :], w_ref[0] if w_ref.ndim == 3 else w_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _gmm_gateup_kernel(*refs):
    """Fused gate/up/SiLU: one x tile feeds two expert matmuls and the
    activation runs on the f32 accumulators in VMEM — the gate and up
    intermediates never round-trip HBM."""
    x_ref, wg_ref, wu_ref, h_ref = refs[-4:]
    wg = wg_ref[0] if wg_ref.ndim == 3 else wg_ref[0, 0]
    wu = wu_ref[0] if wu_ref.ndim == 3 else wu_ref[0, 0]
    gate = jax.lax.dot_general(
        x_ref[:, :], wg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    up = jax.lax.dot_general(
        x_ref[:, :], wu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h_ref[:, :] = (jax.nn.silu(gate) * up).astype(h_ref.dtype)


def _weight_specs(w_ndim: int, d: int, tile_n: int):
    """BlockSpec + scalar-prefetch count for a weight operand.

    3-D [E, D, F]: expert routed via the prefetched ``tile_expert``.
    4-D [L, E, D, F] (the models' stacked-layer pytree): the layer index
    arrives as a SECOND prefetched scalar and feeds the index map — the
    kernel reads its layer's expert blocks straight out of the full stack,
    so the forward's lax.scan never materializes a per-layer slice (an
    HBM->HBM copy of the whole expert stack, measured +3.96 ms/layer at the
    bench shape — tools/probe_slice_copy.py)."""
    if w_ndim == 3:
        return 1, pl.BlockSpec((1, d, tile_n), lambda j, i, te: (te[i], 0, j),
                               memory_space=pltpu.VMEM)
    return 2, pl.BlockSpec((1, 1, d, tile_n),
                           lambda j, i, te, li: (li[0], te[i], 0, j),
                           memory_space=pltpu.VMEM)


def grouped_gateup_padded(
    x_padded: jnp.ndarray,     # [M_pad, D]
    we_gate: jnp.ndarray,      # [E, D, F] or [L, E, D, F] with layer_index
    we_up: jnp.ndarray,
    tile_expert: jnp.ndarray,  # [M_pad / tile_m] int32
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,  # [] or [1] int32
) -> jnp.ndarray:
    """silu(x @ we_gate[e]) * (x @ we_up[e]) on the padded grouped layout."""
    m_pad, d = x_padded.shape
    e, _, f = we_gate.shape[-3:]
    stacked = we_gate.ndim == 4
    f_pad = _round_up(f, TILE_N)
    if f_pad != f:
        if stacked:
            # Padding a [L, E, D, F] stack would copy the whole thing;
            # stacked mode requires lane-aligned F (true for every preset).
            raise ValueError(f"stacked gate/up needs F % {TILE_N} == 0, got {f}")
        we_gate = jnp.pad(we_gate, ((0, 0), (0, 0), (0, f_pad - f)))
        we_up = jnp.pad(we_up, ((0, 0), (0, 0), (0, f_pad - f)))
    # Two weight blocks live at once.
    tile_n = _pick_tile_n(f_pad, d, we_gate.dtype.itemsize, tile_m,
                          n_weights=2)

    nsp, w_spec = _weight_specs(we_gate.ndim, d, tile_n)
    x_spec = pl.BlockSpec((tile_m, d), lambda j, i, *s: (i, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tile_m, tile_n), lambda j, i, *s: (i, j),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(f_pad // tile_n, m_pad // tile_m),
        in_specs=[x_spec, w_spec, w_spec],
        out_specs=o_spec,
    )
    scalars = (tile_expert,) if not stacked else (
        tile_expert, jnp.asarray(layer_index, jnp.int32).reshape(1))
    out = pl.pallas_call(
        _gmm_gateup_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, f_pad), x_padded.dtype),
        compiler_params=_pair_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * f_pad,
            bytes_accessed=(x_padded.size + m_pad * f_pad) * x_padded.dtype.itemsize
            + 2 * e * d * f_pad * we_gate.dtype.itemsize,
            transcendentals=m_pad * f_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, we_gate, we_up)
    return out[:, :f]


def _vmem_budget_bytes() -> int:
    """Scoped-VMEM budget for the two-kernel pipeline's working set.

    Default stays just under Mosaic's 16 MB default scoped window (the
    calibrated anchors below).  ``CTDB_GROUPED_VMEM_MB`` raises it — v5e has
    128 MB of physical VMEM and pallas_call forwards the budget via
    ``CompilerParams(vmem_limit_bytes=...)``, enabling wider row tiles at
    full-width n-tiles (the tile_m=128 configuration that the default
    window rejects)."""
    mb = os.environ.get("CTDB_GROUPED_VMEM_MB")
    if mb:
        return int(float(mb) * (1 << 20))
    return (15 << 20) + (256 << 10)


def _pick_tile_n(f_pad: int, d: int, itemsize: int, tile_m: int = TILE_M,
                 n_weights: int = 1,
                 limit_bytes: Optional[int] = None) -> int:
    """Widest 128-multiple n-tile whose whole working set fits scoped VMEM.

    Wider tiles mean fewer n passes over the rows (each re-streams every x
    row tile) and fewer weight re-fetches per expert, but every block is
    double-buffered by Mosaic against the scoped-VMEM budget
    (:func:`_vmem_budget_bytes`).  Working set per grid step: ``n_weights``
    weight blocks [D, tile_n] ×2, the x row tile [tile_m, D] ×2, the out
    tile ×2.  The default limit is calibrated against two measured anchors
    at (D=2048, tile_n=896, 2 weights): tile_m=64 (model 15.44 MB) compiles
    under the 16 MB default window, tile_m=128 (model 16.19 MB) overflows
    it by 332 KB — so the cutoff sits between them; Mosaic's true stack
    bookkeeping adds overhead this model intentionally absorbs into the
    margin."""
    if limit_bytes is None:
        limit_bytes = _vmem_budget_bytes()
    fixed = 2 * tile_m * d * itemsize
    best = 128
    tile_n = 128
    while tile_n <= f_pad:
        need = (n_weights * 2 * d * tile_n * itemsize + fixed
                + 2 * tile_m * tile_n * itemsize)
        if need <= limit_bytes and f_pad % tile_n == 0:
            best = tile_n
        tile_n += 128
    return best


def _pair_compiler_params():
    """Forward a raised scoped-VMEM budget to Mosaic when the env knob asks
    for one; None keeps the default 16 MB window."""
    budget = _vmem_budget_bytes()
    if budget <= (16 << 20):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=budget + (2 << 20))


def grouped_matmul_padded(
    x_padded: jnp.ndarray,    # [M_pad, D], rows tile-aligned per expert
    w: jnp.ndarray,           # [E, D, F] or [L, E, D, F] with layer_index
    tile_expert: jnp.ndarray,  # [M_pad / tile_m] int32
    tile_m: int = TILE_M,
    tile_n: int | None = None,
    layer_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    m_pad, d = x_padded.shape
    e, _, f = w.shape[-3:]
    stacked = w.ndim == 4
    if tile_n is None:
        f_pad = _round_up(f, TILE_N)
        tile_n = _pick_tile_n(f_pad, d, w.dtype.itemsize, tile_m)  # divides f_pad
    else:
        f_pad = _round_up(f, tile_n)  # explicit tile_n: pad up to it
    if f_pad != f:
        if stacked:
            raise ValueError(f"stacked matmul needs F % {TILE_N} == 0, got {f}")
        w = jnp.pad(w, ((0, 0), (0, 0), (0, f_pad - f)))

    # Grid order (n, m) with m innermost: consecutive steps walk row tiles
    # of the SAME n-tile, so while the expert id is unchanged the weight
    # block's index-map output repeats and Pallas skips its HBM→VMEM DMA.
    # (The previous row-major (m, n) order re-fetched the expert weight tile
    # once per row tile — ~70 GB of redundant DMA per denoise step at the
    # llada-moe-7b bench shape, the dominant cost behind its 11% MFU.)
    nsp, w_spec = _weight_specs(w.ndim, d, tile_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(f_pad // tile_n, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda j, i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda j, i, *s: (i, j),
                               memory_space=pltpu.VMEM),
    )
    scalars = (tile_expert,) if not stacked else (
        tile_expert, jnp.asarray(layer_index, jnp.int32).reshape(1))
    out = pl.pallas_call(
        _gmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, f_pad), x_padded.dtype),
        compiler_params=_pair_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * d * f_pad,
            bytes_accessed=(x_padded.size + m_pad * f_pad) * x_padded.dtype.itemsize
            + e * d * f_pad * w.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, w)
    return out[:, :f]


def grouped_expert_ffn_pallas(
    x: jnp.ndarray,            # [N, D]
    topk_probs: jnp.ndarray,   # [N, K] f32
    topk_idx: jnp.ndarray,     # [N, K] i32
    we_gate: jnp.ndarray,      # [E, D, Fm] or [L, E, D, Fm] + layer_index
    we_up: jnp.ndarray,
    we_down: jnp.ndarray,      # [E, Fm, D] or [L, E, Fm, D]
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full expert FFN on the padded grouped layout: one scatter in, three
    grouped GEMMs, one weighted gather out.

    With 4-D weights + ``layer_index``, the kernels index the full stacked-
    layer tensors directly (scalar-prefetched layer id) — the caller's
    lax.scan over layers never slices the expert stack (an HBM->HBM copy,
    +3.96 ms/layer at the bench shape — tools/probe_slice_copy.py)."""
    from ct_diffusionmodelbench_tpu.ops.quant import is_quantized

    quantized = is_quantized(we_gate)
    wg_arr = we_gate["q"] if quantized else we_gate
    n, d = x.shape
    k = topk_idx.shape[1]
    e = wg_arr.shape[-3]
    m = n * k

    env_tm = os.environ.get("CTDB_GROUPED_TILE_M")
    if env_tm:
        tile_m = int(env_tm)
    elif tile_m == TILE_M and m >= 65536:
        # Large-M row tiles: at batch 32 (M=81920) tile 128 measures 10.91
        # vs tile 64's 11.24 ms/layer on-chip (fewer expert-run boundaries
        # per row; the extra e*64 worst-case pad rows amortize), while at
        # batch 8 (M=20480) tile 64 wins 2.52 vs 2.86
        # (tools/xprof_sweep_r3.py, CTDB_SWEEP_ROUTING=1).
        tile_m = 128

    # Sort-free layout: counting_layout maps every routing slot straight to
    # its padded row (argsort was the dominant per-layer cost at M=20480).
    dest, tile_expert, sizes, m_pad = counting_layout(topk_idx, e, tile_m)

    # All row movement is GATHERS — TPU scatters of wide rows are orders of
    # magnitude slower (measured ~25 ms vs ~1 ms at [16k, 2048] bf16 on
    # v5e).  Only one tiny 1-D int scatter builds the index map.
    token_of_slot = (jnp.arange(m, dtype=jnp.int32) // k)
    src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
        token_of_slot)                                  # padded row → token
    # mode="clip": indices are in-bounds by construction; the default
    # mode="fill" materializes an extra full-size select pass against the
    # fill value (profiled at ~0.15 ms/layer, tools/xprof_generate.py).
    xs_padded = jnp.take(x, src, axis=0, mode="clip")  # pad rows: dup of a
    #                                                     real row, weight 0
    # Measured on v5e (tools/xprof_ffn.py + fused-vs-pair sweeps): the
    # single-pass megakernel runs 2.12 ms/layer vs the pair's 2.31 inside
    # the kernel, but loses the epilogue fusion and nets ~0.1-0.2 ms/layer
    # SLOWER at both the batched (3.54 vs 3.36) and single-sample (1.19 vs
    # 1.13) bench shapes — the pair stays the default; the megakernel is
    # kept as a tested alternative for shapes where h-round-trip dominates.
    fm = wg_arr.shape[-1]
    aligned = d % 128 == 0 and fm % 128 == 0
    # Pad-skip (OFF by default — measured a net LOSS): the static m_pad
    # reserves a worst-case e*tile_m of padding (~8% all-padding tiles at
    # the bench shape); CTDB_GROUPED_SKIP_PAD=1 marks tiles holding no real
    # row so the manual kernels zero-fill them instead of running the expert
    # matmul (_run_schedule sentinel).  On-chip A/B at the batch-8 bench
    # shape (tools/xprof_sweep_r3.py, CTDB_SWEEP_ROUTING=1): down kernel
    # 0.746 -> 0.706 ms but gate/up 1.115 -> 1.400 — once the output write
    # becomes conditional Mosaic loses its unconditional-writer pipelining
    # and the whole layer nets 2.52 -> 2.81 ms.  Kept (oracle-tested) as the
    # measured record of why tile skipping does not pay on this hardware.
    tile_valid = None
    if os.environ.get("CTDB_GROUPED_SKIP_PAD", "0") == "1":
        padded_sizes = _round_up_arr(sizes, tile_m)
        pend_real = jnp.cumsum(padded_sizes) - padded_sizes + sizes  # [E]
        tile_start = jnp.arange(m_pad // tile_m, dtype=jnp.int32) * tile_m
        tile_valid = (tile_start
                      < jnp.take(pend_real, tile_expert)).astype(jnp.int32)
    if quantized:
        # int8 serving path: the manual-DMA pair kernels with in-kernel
        # dequant (run-start cast + accumulator-epilogue scale).  Quantized
        # presets are all lane-aligned; unaligned tiny configs dequantize in
        # moe_block before reaching here.
        if not aligned:
            raise ValueError(
                f"int8 grouped FFN needs D, F % 128 == 0, got {d}, {fm}")
        h = grouped_gateup_manual_q(xs_padded, we_gate, we_up, tile_expert,
                                    tile_m, layer_index=layer_index,
                                    tile_valid=tile_valid)
        out_padded = grouped_matmul_manual_q(h, we_down, tile_expert, tile_m,
                                             layer_index=layer_index,
                                             tile_valid=tile_valid)
        return _combine(out_padded, dest, topk_probs, n, k, d, x.dtype)
    fused = os.environ.get("CTDB_GROUPED_FUSED", "0") == "1" and aligned
    # CTDB_GROUPED_MANUAL: "1" = manual-DMA pair (gate/up + down both with
    # NSLOTS weight pipelining), "gateup" = manual gate/up + auto down,
    # "0" = auto-pipelined pair.  Default measured on-chip at the batch-8
    # bench shape (tools/xprof_sweep_r3.py, inclusive loop ms/layer):
    # auto+gather 2.78, manual-both+kloop 2.35 — with the kloop combine the
    # down output no longer needs XLA's VMEM-prefetched unsort gather, so
    # manual-down's tighter VMEM budget stopped costing anything.
    manual = os.environ.get("CTDB_GROUPED_MANUAL", "1")
    if not aligned:
        manual = "0"
    # Sub-tiles per grid step in the manual kernels (the layout and
    # weight-DMA schedule stay at tile_m granularity — only the per-
    # grid-step pipeline overhead amortizes; see _gateup_manual_kernel).
    # Default 2: the round-5 on-chip A/B measured 4.758 -> 4.485 ms/layer
    # standalone AND 265.5 -> 277.3 onchip tok/s/chip (+4.4%, MFU 0.491 ->
    # 0.513) on the full llada-moe-7b headline (PERF.json, /tmp/r5q3 logs);
    # nsub=4 ties standalone, nsub=8 regresses.  A non-dividing nsub falls
    # back to 1 inside the kernels (tested).
    try:
        nsub = int(os.environ.get("CTDB_GROUPED_NSUB", "2"))
    except ValueError:
        nsub = 2
    if fused:
        out_padded = grouped_ffn_fused_padded(
            xs_padded, we_gate, we_up, we_down, tile_expert, tile_m,
            layer_index=layer_index, tile_valid=tile_valid)
    else:
        if manual in ("1", "gateup"):
            h = grouped_gateup_manual(xs_padded, we_gate, we_up, tile_expert,
                                      tile_m, layer_index=layer_index,
                                      tile_valid=tile_valid, nsub=nsub)
        else:
            h = grouped_gateup_padded(xs_padded, we_gate, we_up, tile_expert,
                                      tile_m, layer_index=layer_index)
        if manual == "1":
            out_padded = grouped_matmul_manual(h, we_down, tile_expert,
                                               tile_m,
                                               layer_index=layer_index,
                                               tile_valid=tile_valid,
                                               nsub=nsub)
        else:
            out_padded = grouped_matmul_padded(h, we_down, tile_expert,
                                               tile_m,
                                               layer_index=layer_index)

    return _combine(out_padded, dest, topk_probs, n, k, d, x.dtype)


def _combine(out_padded, dest, topk_probs, n, k, d, dtype):
    """Weighted unsort: padded expert-run rows → [N, D].  Two formulations:

    - "kloop" (default): K accumulated gathers of [N, D] — XLA fuses each
      take+scale+add, so the [M, D] slot matrix is never materialized
      (saves its write + re-read, ~170 MB/layer at the batch-8 bench shape)
    - "gather": one [M, D] gather + reshape-sum (the round-2 formulation)
    """
    if os.environ.get("CTDB_GROUPED_COMBINE", "kloop") == "kloop":
        dest_k = dest.reshape(n, k)
        out = jnp.zeros((n, d), jnp.float32)
        for kk in range(k):
            rows = jnp.take(out_padded, dest_k[:, kk], axis=0, mode="clip")
            out = out + rows.astype(jnp.float32) * topk_probs[:, kk][:, None]
        return out.astype(dtype)
    out_slots = jnp.take(out_padded, dest, axis=0, mode="clip")
    contrib = out_slots.astype(jnp.float32).reshape(n, k, d) \
        * topk_probs[..., None]
    return contrib.sum(axis=1).astype(dtype)


# ---------------------------------------------------------------------------
# Fused single-pass FFN megakernel (gate + up + SiLU + down in one kernel)
# ---------------------------------------------------------------------------
# Device profiling (tools/xprof_ffn.py, v5e, 20480 slots) showed the
# two-kernel pipeline losing ~35% to expert-boundary weight-DMA stalls:
# Mosaic's automatic pipelining only looks ONE grid step ahead, so an 11 MB
# expert-weight fetch (9 us) can't hide behind a 2.4 us row-tile matmul at
# every expert transition — and it pays that stall twice (gate/up kernel,
# then down kernel), plus an HBM round-trip for h.
#
# This kernel instead keeps the weights in HBM (memory_space=ANY) and
# manages its own double buffer: at the FIRST tile of each expert's run it
# waits for that expert's three weight matrices (issued one full run
# earlier) and immediately starts the DMA for the *next* run's expert into
# the alternate buffer slot — giving the whole run's compute (~5-6 tiles,
# 13-22 us) to hide the 11 MB transfer, and saturating the DMA engine when
# runs are short (single-sample decode: weight-DMA-bound at the HBM floor).
# h never leaves VMEM.


NSLOTS = 3  # weight buffer slots: two-run DMA lookahead


def _fused_ffn_kernel(*refs, stacked: bool):
    if stacked:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref, li_ref,
         x_ref, wg_hbm, wu_hbm, wd_hbm, o_ref,
         wg_buf, wu_buf, wd_buf, sems) = refs
    else:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref,
         x_ref, wg_hbm, wu_hbm, wd_hbm, o_ref,
         wg_buf, wu_buf, wd_buf, sems) = refs
        li_ref = None

    i = pl.program_id(0)
    slot = slot_ref[i]

    def copies(e, s):
        def src(w_hbm):
            return w_hbm.at[li_ref[0], e] if stacked else w_hbm.at[e]
        return (
            pltpu.make_async_copy(src(wg_hbm), wg_buf.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(src(wu_hbm), wu_buf.at[s], sems.at[s, 1]),
            pltpu.make_async_copy(src(wd_hbm), wd_buf.at[s], sems.at[s, 2]),
        )

    @pl.when(i == 0)
    def _():  # bootstrap: runs 0 and 1 have no earlier run-start to issue them
        for c in copies(te_ref[0], slot):
            c.start()
        nxt = nxt_ref[0]

        @pl.when(nxt >= 0)
        def _():
            for c in copies(nxt, (slot + 1) % NSLOTS):
                c.start()

    @pl.when(start_ref[i] == 1)
    def _():
        for c in copies(te_ref[i], slot):
            c.wait()
        nxt2 = nxt2_ref[i]

        @pl.when(nxt2 >= 0)
        def _():  # two-run lookahead: issue run r+2 while r and r+1 stream
            for c in copies(nxt2, jax.lax.rem(slot + 2, NSLOTS)):
                c.start()

    x = x_ref[...]                                     # [tile_m, D]

    def compute(s: int):
        # STATIC buffer index: wg_buf[slot] with a traced index makes
        # Mosaic materialize a VMEM->VMEM copy of the whole 3.67 MB buffer
        # per tile — predicated static branches read in place.
        def _():
            gate = jax.lax.dot_general(
                x, wg_buf[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            up = jax.lax.dot_general(
                x, wu_buf[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = (jax.nn.silu(gate) * up).astype(x.dtype)  # stays in VMEM
            out = jax.lax.dot_general(
                h, wd_buf[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[...] = out.astype(o_ref.dtype)
        return _

    for s in range(NSLOTS):
        pl.when(slot == s)(compute(s))

    @pl.when(slot == NSLOTS)  # pad-skip sentinel (_run_schedule): no dots
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)


def _run_schedule(tile_expert: jnp.ndarray, e: int,
                  tile_valid: Optional[jnp.ndarray] = None):
    """Per-tile (start, slot, next, next-next expert) for the manual
    NSLOTS-deep weight pipeline.

    ``tile_expert`` is non-decreasing (counting layout), so the next run's
    expert is the suffix-min of the change-point values, and the run after
    that is ``nxt`` evaluated at the first tile of the next run.

    ``tile_valid`` (pad-skip): tiles with no real rows get the out-of-range
    sentinel slot NSLOTS — the kernels' per-slot ``pl.when`` dispatch then
    zero-fills the output block instead of running the expert matmul.  The
    static m_pad reserves a full worst-case ``e * tile_m`` of padding
    (counting_layout), so ~8% of the grid is all-padding at the bench shape.
    Run-START tiles keep their slot even when invalid: a trailing phantom
    run must still WAIT its prefetched weight DMA to keep the semaphores
    balanced."""
    t = tile_expert.astype(jnp.int32)
    n = t.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), t[:-1]])
    start = (t != prev).astype(jnp.int32)
    slot = ((jnp.cumsum(start) - 1) % NSLOTS).astype(jnp.int32)

    big = jnp.int32(e + 1)
    change = t[1:] != t[:-1]
    change_val = jnp.where(change, t[1:], big)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(change_val)))
    nxt = jnp.where(nxt == big, jnp.int32(-1), nxt)
    nxt = jnp.concatenate([nxt, jnp.full((1,), -1, jnp.int32)])

    # Position of the first change at or after i → the next run starts at
    # pos+1; nxt there is the run-after-next's expert.
    bigp = jnp.int32(n)
    pos = jnp.where(change, jnp.arange(n - 1, dtype=jnp.int32), bigp)
    pos = jnp.flip(jax.lax.cummin(jnp.flip(pos)))
    pos = jnp.concatenate([pos, jnp.full((1,), bigp, jnp.int32)])
    nxt2 = jnp.where(pos < n - 1,
                     jnp.take(nxt, jnp.minimum(pos + 1, n - 1)),
                     jnp.int32(-1))
    if tile_valid is not None:
        slot = jnp.where((start == 1) | (tile_valid == 1), slot,
                         jnp.int32(NSLOTS))
    return start, slot, nxt, nxt2


def grouped_ffn_fused_padded(
    xs_padded: jnp.ndarray,    # [M_pad, D]
    we_gate: jnp.ndarray,      # [E, D, F] or [L, E, D, F] with layer_index
    we_up: jnp.ndarray,
    we_down: jnp.ndarray,      # [E, F, D] or [L, E, F, D]
    tile_expert: jnp.ndarray,  # [M_pad / tile_m] int32, non-decreasing
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
    tile_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """silu(x@wg[e]) * (x@wu[e]) @ wd[e] in ONE pallas_call on the padded
    grouped layout.  Requires lane-aligned dims (D % 128 == 0,
    F % 128 == 0) — callers fall back to the two-kernel pipeline otherwise."""
    m_pad, d = xs_padded.shape
    e, _, f = we_gate.shape[-3:]
    stacked = we_gate.ndim == 4
    if d % 128 or f % 128:
        raise ValueError(f"fused FFN needs D, F % 128 == 0, got {d}, {f}")

    start, slot, nxt, nxt2 = _run_schedule(tile_expert, e, tile_valid)

    wdt = we_gate.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if stacked else 5,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_m, d), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, d, f), wdt),
            pltpu.VMEM((NSLOTS, d, f), wdt),
            pltpu.VMEM((NSLOTS, f, d), wdt),
            pltpu.SemaphoreType.DMA((NSLOTS, 3)),
        ],
    )
    scalars = [tile_expert, nxt, nxt2, start, slot]
    if stacked:
        scalars.append(jnp.asarray(layer_index, jnp.int32).reshape(1))
    return pl.pallas_call(
        functools.partial(_fused_ffn_kernel, stacked=stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), xs_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            # NSLOTS buffered expert weights (~33 MB at the llada-moe-7b
            # shape) exceed the default 16 MB scoped window; v5e has 128 MB
            # of physical VMEM.
            vmem_limit_bytes=64 << 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m_pad * d * f,
            bytes_accessed=2 * xs_padded.size * xs_padded.dtype.itemsize
            + 3 * e * d * f * wdt.itemsize,
            transcendentals=m_pad * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, xs_padded, we_gate, we_up, we_down)


# ---------------------------------------------------------------------------
# Manual-DMA pair kernels (gate/up and down with NSLOTS weight pipelining)
# ---------------------------------------------------------------------------
# Round-3 on-chip attribution (tools/xprof_unrolled_r3.py, batch 8): the
# auto-pipelined pair kernels spend gate/up 1.52 ms vs a 0.76 ms compute
# floor and down 0.79 vs 0.38 — ~1.2 ms/layer of expert-boundary weight-DMA
# stall, because Mosaic's one-step lookahead can't hide a 7.3 MB expert
# fetch behind one 2.4 us row tile.  These variants keep the TWO-kernel
# structure (whose XLA epilogue fusions the megakernel measurably loses)
# but adopt its NSLOTS manual weight double-buffer: each expert's weights
# are requested two runs ahead, so a whole run's compute hides the fetch.


def _gateup_manual_kernel(*refs, stacked: bool, nsub: int = 1):
    # ``nsub``: layout tiles processed per grid step.  The run schedule,
    # weight DMA, and pad reserve all stay at tile_m granularity (each
    # sub-tile keeps its own slot/start/wait logic); only the grid-step
    # count — and with it the per-step pipeline overhead Mosaic charges for
    # the x/h block orchestration — shrinks by nsub.  Motivation: single-
    # expert routing (zero run boundaries) still measures 1.113 ms vs the
    # 0.916 padded-compute floor at the bench shape, i.e. ~0.5 us of
    # steady-state per-tile cost that is NOT weight-DMA stalls
    # (docs/STATUS.md round-3 decomposition).
    if stacked:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref, li_ref,
         x_ref, wg_hbm, wu_hbm, h_ref, wg_buf, wu_buf, sems) = refs
    else:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref,
         x_ref, wg_hbm, wu_hbm, h_ref, wg_buf, wu_buf, sems) = refs
        li_ref = None

    i = pl.program_id(0)

    def copies(e, s):
        def src(w_hbm):
            return w_hbm.at[li_ref[0], e] if stacked else w_hbm.at[e]
        return (
            pltpu.make_async_copy(src(wg_hbm), wg_buf.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(src(wu_hbm), wu_buf.at[s], sems.at[s, 1]),
        )

    x_all = x_ref[...]
    tm = x_all.shape[0] // nsub

    for j in range(nsub):
        t = i * nsub + j if nsub > 1 else i
        slot = slot_ref[t]

        if j == 0:
            @pl.when(i == 0)
            def _(slot=slot):  # bootstrap runs 0 and 1
                for c in copies(te_ref[0], slot):
                    c.start()
                nxt = nxt_ref[0]

                @pl.when(nxt >= 0)
                def _():
                    for c in copies(nxt, (slot + 1) % NSLOTS):
                        c.start()

        @pl.when(start_ref[t] == 1)
        def _(t=t, slot=slot):
            for c in copies(te_ref[t], slot):
                c.wait()
            nxt2 = nxt2_ref[t]

            @pl.when(nxt2 >= 0)
            def _():  # two-run lookahead
                for c in copies(nxt2, jax.lax.rem(slot + 2, NSLOTS)):
                    c.start()

        x = x_all[j * tm:(j + 1) * tm] if nsub > 1 else x_all

        def compute(s: int, j=j, x=x):
            def _():  # static buffer index (see _fused_ffn_kernel note)
                gate = jax.lax.dot_general(
                    x, wg_buf[s], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                up = jax.lax.dot_general(
                    x, wu_buf[s], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                val = (jax.nn.silu(gate) * up).astype(h_ref.dtype)
                if nsub > 1:
                    h_ref[j * tm:(j + 1) * tm, :] = val
                else:
                    h_ref[...] = val
            return _

        for s in range(NSLOTS):
            pl.when(slot == s)(compute(s))

        @pl.when(slot == NSLOTS)  # pad-skip sentinel (_run_schedule): no dot
        def _(j=j):
            z = jnp.zeros((tm, h_ref.shape[1]), h_ref.dtype)
            if nsub > 1:
                h_ref[j * tm:(j + 1) * tm, :] = z
            else:
                h_ref[...] = z


def _matmul_manual_kernel(*refs, stacked: bool, nsub: int = 1):
    # ``nsub``: see _gateup_manual_kernel — layout tiles per grid step.
    if stacked:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref, li_ref,
         x_ref, w_hbm, o_ref, w_buf, sems) = refs
    else:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref,
         x_ref, w_hbm, o_ref, w_buf, sems) = refs
        li_ref = None

    i = pl.program_id(0)

    def copy(e, s):
        src = w_hbm.at[li_ref[0], e] if stacked else w_hbm.at[e]
        return pltpu.make_async_copy(src, w_buf.at[s], sems.at[s])

    x_all = x_ref[...]
    tm = x_all.shape[0] // nsub

    for j in range(nsub):
        t = i * nsub + j if nsub > 1 else i
        slot = slot_ref[t]

        if j == 0:
            @pl.when(i == 0)
            def _(slot=slot):
                copy(te_ref[0], slot).start()
                nxt = nxt_ref[0]

                @pl.when(nxt >= 0)
                def _():
                    copy(nxt, (slot + 1) % NSLOTS).start()

        @pl.when(start_ref[t] == 1)
        def _(t=t, slot=slot):
            copy(te_ref[t], slot).wait()
            nxt2 = nxt2_ref[t]

            @pl.when(nxt2 >= 0)
            def _():
                copy(nxt2, jax.lax.rem(slot + 2, NSLOTS)).start()

        x = x_all[j * tm:(j + 1) * tm] if nsub > 1 else x_all

        def compute(s: int, j=j, x=x):
            def _():
                val = jax.lax.dot_general(
                    x, w_buf[s], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
                if nsub > 1:
                    o_ref[j * tm:(j + 1) * tm, :] = val
                else:
                    o_ref[...] = val
            return _

        for s in range(NSLOTS):
            pl.when(slot == s)(compute(s))

        @pl.when(slot == NSLOTS)  # pad-skip sentinel (_run_schedule): no dot
        def _(j=j):
            z = jnp.zeros((tm, o_ref.shape[1]), o_ref.dtype)
            if nsub > 1:
                o_ref[j * tm:(j + 1) * tm, :] = z
            else:
                o_ref[...] = z


def grouped_gateup_manual(
    x_padded: jnp.ndarray,     # [M_pad, D]
    we_gate: jnp.ndarray,      # [E, D, F] or [L, E, D, F] with layer_index
    we_up: jnp.ndarray,
    tile_expert: jnp.ndarray,  # [M_pad / tile_m] int32, non-decreasing
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
    tile_valid: Optional[jnp.ndarray] = None,
    nsub: int = 1,
) -> jnp.ndarray:
    """silu(x@wg[e]) * (x@wu[e]) with manual NSLOTS weight pipelining.
    Requires lane-aligned D and F (every full-size preset qualifies).

    ``nsub``: layout tiles per grid step (see _gateup_manual_kernel);
    falls back to 1 when the tile count doesn't divide."""
    m_pad, d = x_padded.shape
    e, _, f = we_gate.shape[-3:]
    stacked = we_gate.ndim == 4
    if d % 128 or f % 128:
        raise ValueError(f"manual gate/up needs D, F % 128 == 0, got {d}, {f}")
    if (m_pad // tile_m) % nsub:
        nsub = 1

    start, slot, nxt, nxt2 = _run_schedule(tile_expert, e, tile_valid)
    wdt = we_gate.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if stacked else 5,
        grid=(m_pad // (tile_m * nsub),),
        in_specs=[
            pl.BlockSpec((tile_m * nsub, d), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_m * nsub, f), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, d, f), wdt),
            pltpu.VMEM((NSLOTS, d, f), wdt),
            pltpu.SemaphoreType.DMA((NSLOTS, 2)),
        ],
    )
    scalars = [tile_expert, nxt, nxt2, start, slot]
    if stacked:
        scalars.append(jnp.asarray(layer_index, jnp.int32).reshape(1))
    # Budget exactly what the kernel needs: over-reserving VMEM starves
    # XLA's memory-space-assignment pass of alternate-memory headroom for
    # the SURROUNDING ops — measured: a 48 MB limit here makes the
    # downstream unsort gather 4x slower (it loses its VMEM prefetch).
    scratch_bytes = 2 * NSLOTS * d * f * wdt.itemsize
    blocks_bytes = 2 * tile_m * nsub * (d + f) * x_padded.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_gateup_manual_kernel, stacked=stacked, nsub=nsub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, f), x_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scratch_bytes + 3 * blocks_bytes + (5 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * f,
            bytes_accessed=(x_padded.size + m_pad * f) * x_padded.dtype.itemsize
            + 2 * e * d * f * wdt.itemsize,
            transcendentals=m_pad * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, we_gate, we_up)


def grouped_matmul_manual(
    x_padded: jnp.ndarray,     # [M_pad, F]
    w: jnp.ndarray,            # [E, F, D] or [L, E, F, D] with layer_index
    tile_expert: jnp.ndarray,
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
    tile_valid: Optional[jnp.ndarray] = None,
    nsub: int = 1,
) -> jnp.ndarray:
    m_pad, f = x_padded.shape
    e, _, d = w.shape[-3:]
    stacked = w.ndim == 4
    if d % 128 or f % 128:
        raise ValueError(f"manual matmul needs dims % 128 == 0, got {f}, {d}")
    if (m_pad // tile_m) % nsub:
        nsub = 1

    start, slot, nxt, nxt2 = _run_schedule(tile_expert, e, tile_valid)
    wdt = w.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if stacked else 5,
        grid=(m_pad // (tile_m * nsub),),
        in_specs=[
            pl.BlockSpec((tile_m * nsub, f), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_m * nsub, d), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, f, d), wdt),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )
    scalars = [tile_expert, nxt, nxt2, start, slot]
    if stacked:
        scalars.append(jnp.asarray(layer_index, jnp.int32).reshape(1))
    scratch_bytes = NSLOTS * f * d * wdt.itemsize
    blocks_bytes = 2 * tile_m * nsub * (d + f) * x_padded.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_matmul_manual_kernel, stacked=stacked, nsub=nsub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scratch_bytes + 3 * blocks_bytes + (5 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * f * d,
            bytes_accessed=(x_padded.size + m_pad * d) * x_padded.dtype.itemsize
            + e * f * d * wdt.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, w)


# ---------------------------------------------------------------------------
# int8 weight-only manual-DMA pair kernels
# ---------------------------------------------------------------------------
# Serving quantization (ops/quant.py): expert weights arrive as
# {"q": int8 [E, D, F] or [L, E, D, F], "s": f32 [E, F] / [L, E, F]}.  The
# manual weight pipeline DMAs the int8 tensors (HALF the HBM stream that
# bounds single-sample decode) into NSLOTS int8 slots; at each expert-run
# start the current slot is cast once into a single bf16 working buffer
# (int8 values are exact in bf16) and the per-output-channel scale is applied
# to the f32 accumulator in the tile epilogue — mathematically the same
# ``(x @ q) * s`` as ops/quant.py qdot.


def _gateup_manual_q_kernel(*refs, stacked: bool):
    # Scales arrive as auto-pipelined [1, 1, F] VMEM blocks indexed by the
    # scalar-prefetched tile_expert (sg_ref/su_ref) — NOT via manual DMA:
    # Mosaic cannot memref_slice one row of a (8, 128)-tiled f32 tensor
    # ("Slice shape along dimension 1 must be aligned to tiling"), a
    # TPU-compile-only failure that interpret mode never sees.
    if stacked:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref, li_ref,
         x_ref, wgq_hbm, wuq_hbm, sg_ref, su_ref, h_ref,
         wgq_buf, wuq_buf, wg_bf, wu_bf, sems) = refs
    else:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref,
         x_ref, wgq_hbm, wuq_hbm, sg_ref, su_ref, h_ref,
         wgq_buf, wuq_buf, wg_bf, wu_bf, sems) = refs
        li_ref = None

    i = pl.program_id(0)
    slot = slot_ref[i]

    def copies(e, s):
        def src(hbm):
            return hbm.at[li_ref[0], e] if stacked else hbm.at[e]
        return (
            pltpu.make_async_copy(src(wgq_hbm), wgq_buf.at[s], sems.at[s, 0]),
            pltpu.make_async_copy(src(wuq_hbm), wuq_buf.at[s], sems.at[s, 1]),
        )

    @pl.when(i == 0)
    def _():  # bootstrap runs 0 and 1
        for c in copies(te_ref[0], slot):
            c.start()
        nxt = nxt_ref[0]

        @pl.when(nxt >= 0)
        def _():
            for c in copies(nxt, (slot + 1) % NSLOTS):
                c.start()

    @pl.when(start_ref[i] == 1)
    def _():
        for c in copies(te_ref[i], slot):
            c.wait()
        nxt2 = nxt2_ref[i]

        @pl.when(nxt2 >= 0)
        def _():  # two-run lookahead
            for c in copies(nxt2, jax.lax.rem(slot + 2, NSLOTS)):
                c.start()

        # One cast per expert RUN (not per row tile): int8 -> bf16 working
        # copies; the scale stays out of the weights (applied to the f32
        # accumulator below, like qdot).
        def dequant(s: int):
            def _():
                wg_bf[...] = wgq_buf[s].astype(wg_bf.dtype)
                wu_bf[...] = wuq_buf[s].astype(wu_bf.dtype)
            return _

        for s in range(NSLOTS):
            pl.when(slot == s)(dequant(s))

    @pl.when(slot != NSLOTS)
    def _():
        x = x_ref[...]
        gate = jax.lax.dot_general(
            x, wg_bf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        up = jax.lax.dot_general(
            x, wu_bf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = gate * sg_ref[0, 0][None, :]
        u = up * su_ref[0, 0][None, :]
        h_ref[...] = (jax.nn.silu(g) * u).astype(h_ref.dtype)

    @pl.when(slot == NSLOTS)  # pad-skip sentinel (_run_schedule): no dot
    def _():
        h_ref[...] = jnp.zeros(h_ref.shape, h_ref.dtype)


def _matmul_manual_q_kernel(*refs, stacked: bool):
    # Scale: auto-pipelined [1, 1, D] VMEM block (see _gateup_manual_q_kernel
    # on why scales must not ride the manual DMA path).
    if stacked:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref, li_ref,
         x_ref, wq_hbm, s_ref, o_ref, wq_buf, w_bf, sems) = refs
    else:
        (te_ref, nxt_ref, nxt2_ref, start_ref, slot_ref,
         x_ref, wq_hbm, s_ref, o_ref, wq_buf, w_bf, sems) = refs
        li_ref = None

    i = pl.program_id(0)
    slot = slot_ref[i]

    def copy(e, s):
        src = wq_hbm.at[li_ref[0], e] if stacked else wq_hbm.at[e]
        return pltpu.make_async_copy(src, wq_buf.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        copy(te_ref[0], slot).start()
        nxt = nxt_ref[0]

        @pl.when(nxt >= 0)
        def _():
            copy(nxt, (slot + 1) % NSLOTS).start()

    @pl.when(start_ref[i] == 1)
    def _():
        copy(te_ref[i], slot).wait()
        nxt2 = nxt2_ref[i]

        @pl.when(nxt2 >= 0)
        def _():
            copy(nxt2, jax.lax.rem(slot + 2, NSLOTS)).start()

        def dequant(s: int):
            def _():
                w_bf[...] = wq_buf[s].astype(w_bf.dtype)
            return _

        for s in range(NSLOTS):
            pl.when(slot == s)(dequant(s))

    @pl.when(slot != NSLOTS)
    def _():
        acc = jax.lax.dot_general(
            x_ref[...], w_bf[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = (acc * s_ref[0, 0][None, :]).astype(o_ref.dtype)

    @pl.when(slot == NSLOTS)  # pad-skip sentinel (_run_schedule): no dot
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)


def grouped_gateup_manual_q(
    x_padded: jnp.ndarray,     # [M_pad, D]
    we_gate: dict,             # {"q": [E, D, F] i8 (+L), "s": [E, F] f32}
    we_up: dict,
    tile_expert: jnp.ndarray,
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
    tile_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    m_pad, d = x_padded.shape
    qg, sg = we_gate["q"], we_gate["s"].astype(jnp.float32)
    qu, su = we_up["q"], we_up["s"].astype(jnp.float32)
    e, _, f = qg.shape[-3:]
    stacked = qg.ndim == 4
    if d % 128 or f % 128:
        raise ValueError(f"manual gate/up needs D, F % 128 == 0, got {d}, {f}")

    start, slot, nxt, nxt2 = _run_schedule(tile_expert, e, tile_valid)
    # Scales ride the AUTO pipeline as [1, 1, F] blocks of a [(L*)E, 1, F]
    # view, indexed by the prefetched tile_expert — one uniform 3-D path for
    # stacked and flat (see _gateup_manual_q_kernel).
    sg3 = sg.reshape(-1, 1, f)
    su3 = su.reshape(-1, 1, f)
    if stacked:
        scale_ix = lambda i, te, n1, n2, st, sl, li: (li[0] * e + te[i], 0, 0)
    else:
        scale_ix = lambda i, te, n1, n2, st, sl: (te[i], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if stacked else 5,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, f), scale_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), scale_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, f), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, d, f), jnp.int8),
            pltpu.VMEM((NSLOTS, d, f), jnp.int8),
            pltpu.VMEM((d, f), x_padded.dtype),
            pltpu.VMEM((d, f), x_padded.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS, 2)),
        ],
    )
    scalars = [tile_expert, nxt, nxt2, start, slot]
    if stacked:
        scalars.append(jnp.asarray(layer_index, jnp.int32).reshape(1))
    scratch_bytes = (2 * NSLOTS + 4) * d * f
    blocks_bytes = 2 * tile_m * (d + f) * x_padded.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_gateup_manual_q_kernel, stacked=stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, f), x_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scratch_bytes + 3 * blocks_bytes + (5 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * f,
            bytes_accessed=(x_padded.size + m_pad * f) * x_padded.dtype.itemsize
            + 2 * e * d * f,
            transcendentals=m_pad * f,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, qg, qu, sg3, su3)


def grouped_matmul_manual_q(
    x_padded: jnp.ndarray,     # [M_pad, F]
    w: dict,                   # {"q": [E, F, D] i8 (+L), "s": [E, D] f32}
    tile_expert: jnp.ndarray,
    tile_m: int = TILE_M,
    layer_index: Optional[jnp.ndarray] = None,
    tile_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    m_pad, f = x_padded.shape
    qw, sw = w["q"], w["s"].astype(jnp.float32)
    e, _, d = qw.shape[-3:]
    stacked = qw.ndim == 4
    if d % 128 or f % 128:
        raise ValueError(f"manual matmul needs dims % 128 == 0, got {f}, {d}")

    start, slot, nxt, nxt2 = _run_schedule(tile_expert, e, tile_valid)
    sw3 = sw.reshape(-1, 1, d)  # [(L*)E, 1, D] — see gate/up wrapper
    if stacked:
        scale_ix = lambda i, te, n1, n2, st, sl, li: (li[0] * e + te[i], 0, 0)
    else:
        scale_ix = lambda i, te, n1, n2, st, sl: (te[i], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if stacked else 5,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, f), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, d), scale_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, d), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, f, d), jnp.int8),
            pltpu.VMEM((f, d), x_padded.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )
    scalars = [tile_expert, nxt, nxt2, start, slot]
    if stacked:
        scalars.append(jnp.asarray(layer_index, jnp.int32).reshape(1))
    scratch_bytes = (NSLOTS + 2) * f * d
    blocks_bytes = 2 * tile_m * (d + f) * x_padded.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_matmul_manual_q_kernel, stacked=stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x_padded.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scratch_bytes + 3 * blocks_bytes + (5 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * f * d,
            bytes_accessed=(x_padded.size + m_pad * d) * x_padded.dtype.itemsize
            + e * f * d,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*scalars, x_padded, qw, sw3)


def ragged_matmul(xs_sorted, w, group_sizes, tile_m: int = TILE_M):
    """Standalone ragged matmul over expert-sorted rows — the single-matmul
    building block (grouped_expert_ffn_pallas fuses the three-FFN case with
    one scatter/gather pair instead)."""
    m = xs_sorted.shape[0]
    dest, tile_expert, m_pad = padded_layout(group_sizes, m, tile_m)
    src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
        jnp.arange(m, dtype=jnp.int32))
    xp = jnp.take(xs_sorted, src, axis=0, mode="clip")  # gather, not scatter
    out = grouped_matmul_padded(xp, w, tile_expert, tile_m)
    return jnp.take(out, dest, axis=0, mode="clip")
