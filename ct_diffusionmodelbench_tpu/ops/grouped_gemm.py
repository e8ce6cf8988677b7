"""Grouped (ragged) expert GEMM for MoE FFNs.

The reference runs LLaDA-MoE's experts inside opaque HF remote code on CUDA
(SURVEY.md §2.4 row P4/P7).  TPU-native equivalent: sort the token→expert
assignments so each expert's tokens are contiguous, then run ragged matmuls
that only spend MXU FLOPs on routed tokens.

Two backends:
- :func:`grouped_expert_ffn` — ``jax.lax.ragged_dot`` based; XLA lowers this
  to a tiled grouped GEMM on TPU and it is the default grouped path.
- ops/grouped_gemm_pallas.py — hand-written Pallas kernel with scalar
  prefetch of per-group offsets (used when ``CTDB_GROUPED_GEMM=pallas``).

Numerics oracle: models/moe.py ``_experts_dense`` (one-hot einsum); tests
assert grouped == dense.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _sort_by_expert(topk_idx: jnp.ndarray, num_experts: int):
    """Flatten [N, K] assignments → stable-sorted order by expert id.

    Sort-free: a one-hot cumsum ranks each slot within its expert (counting
    sort) — jnp.argsort is a bitonic sort on TPU and was measured at ~2-4 ms
    per layer at M=20480 vs <1 ms for the cumsum (tools/profile_moe.py).
    Returns (dest [M] sorted position per natural slot, token_of [M] source
    token per *sorted* row, group_sizes [E]).
    """
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import expert_rank

    n, k = topk_idx.shape
    m = n * k
    flat = topk_idx.reshape(-1).astype(jnp.int32)
    rank, group_sizes = expert_rank(flat, num_experts)
    starts = jnp.cumsum(group_sizes) - group_sizes
    dest = jnp.take(starts, flat) + rank                   # slot → sorted row
    token_of = jnp.zeros((m,), jnp.int32).at[dest].set(
        jnp.arange(m, dtype=jnp.int32) // k)               # 1-D scatter: cheap
    return dest, token_of, group_sizes.astype(jnp.int32)


def grouped_expert_ffn(
    x: jnp.ndarray,          # [N, D]
    topk_probs: jnp.ndarray,  # [N, K] f32
    topk_idx: jnp.ndarray,    # [N, K] i32
    we_gate: jnp.ndarray,     # [E, D, Fm] (or [L, E, D, Fm] + layer_index)
    we_up: jnp.ndarray,
    we_down: jnp.ndarray,     # [E, Fm, D] (or [L, E, Fm, D])
    layer_index: jnp.ndarray = None,
) -> jnp.ndarray:
    # Default on TPU: the Pallas kernel at every size — measured faster than
    # ragged_dot at both the batched bench shape (3.2 vs 7.7 ms/layer at
    # 20480 slots) and the single-sample shape (1.1 vs 3.7 ms at 2560 slots,
    # tools/profile_moe.py), and it is the only backend that can consume the
    # stacked [L, E, D, Fm] weights without a per-layer slice copy.
    # CTDB_GROUPED_GEMM=pallas|ragged forces a backend.
    from ct_diffusionmodelbench_tpu.ops.quant import (
        dequantize_tensor, is_quantized)

    quantized = is_quantized(we_gate)
    wg_arr = we_gate["q"] if quantized else we_gate
    if wg_arr.ndim == 4 and layer_index is None:
        raise ValueError(
            "stacked [L, E, D, Fm] expert weights require layer_index "
            "(defaulting to layer 0 would silently compute with the wrong "
            "layer's experts)")
    choice = os.environ.get("CTDB_GROUPED_GEMM")
    if choice is None:
        choice = "pallas" if jax.default_backend() == "tpu" else "ragged"
    if quantized and choice == "pallas":
        # int8 serving path: straight to the kernels (no custom_vjp —
        # quantized weights are inference-only).
        from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
            grouped_expert_ffn_pallas)

        li = None if wg_arr.ndim == 3 else jnp.asarray(layer_index, jnp.int32)
        return grouped_expert_ffn_pallas(x, topk_probs, topk_idx,
                                         we_gate, we_up, we_down,
                                         layer_index=li)
    if quantized:
        # ragged backend has no int8 form — dequantize (slicing the stack
        # first keeps the copy per-layer-sized).
        we = [we_gate, we_up, we_down]
        if layer_index is not None and wg_arr.ndim == 4:
            we = [{"q": jax.lax.dynamic_index_in_dim(w["q"], layer_index, 0,
                                                     keepdims=False),
                   "s": jax.lax.dynamic_index_in_dim(w["s"], layer_index, 0,
                                                     keepdims=False)}
                  for w in we]
            layer_index = None
        we_gate, we_up, we_down = (dequantize_tensor(w, x.dtype) for w in we)
    if choice == "pallas":
        li = jnp.asarray(
            0 if layer_index is None else layer_index, jnp.int32)
        return _pallas_ffn_ad(x, topk_probs, topk_idx,
                              we_gate, we_up, we_down, li)

    if layer_index is not None and we_gate.ndim == 4:
        # ragged_dot has no layer-indexed form — slice (costs the stack
        # copy the Pallas path avoids; only the small-token regime).
        we_gate, we_up, we_down = (
            jax.lax.dynamic_index_in_dim(w, layer_index, 0, keepdims=False)
            for w in (we_gate, we_up, we_down))

    return _ffn_ragged(x, topk_probs, topk_idx, we_gate, we_up, we_down)


def _use_nt_backward() -> bool:
    """Opt-in memory-saver backward for the ragged expert matmuls.

    On-chip A/B at the 2-layer llada-moe-7b train config (bench_sweep
    ``sft_train_step_moe``, effective batch 4, seq 2048): the nt backward
    costs **0.725 → 1.324 s/step on-chip** (~1.8x) but frees the ~2 GB of
    hoisted full-stack weight transposes, which is what lets the 3-layer
    (1.75B) config train on one 16 GB chip at all.  Speed default: off.
    """
    return os.environ.get("CTDB_RAGGED_NT", "0") == "1"


@jax.custom_vjp
def _ragged_dot_nt(x, w, group_sizes):
    """``jax.lax.ragged_dot`` with a non-transposing backward.

    JAX's built-in transpose rule computes dx against ``transpose(w,
    (0, 2, 1))`` — under a layer scan XLA hoists that into ONE full-stack
    layout copy of every expert weight (672 MB per [3, 64, 2048, 896] bf16
    stack, the largest allocations in the 3-layer MoE train step's OOM
    breakdown).  The backward here instead issues ``ragged_dot_general``
    contracting ``w``'s output dim directly: bit-identical dx (verified),
    no second weight layout — but measurably slower per step (see
    :func:`_use_nt_backward`), so it is opt-in via ``CTDB_RAGGED_NT=1``.
    """
    return jax.lax.ragged_dot(x, w, group_sizes,
                              preferred_element_type=jnp.float32)


def _ragged_dot_nt_fwd(x, w, group_sizes):
    return _ragged_dot_nt(x, w, group_sizes), (x, w, group_sizes)


def _ragged_dot_nt_bwd(res, g):
    import numpy as np

    x, w, group_sizes = res
    dims_dx = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=(0,), rhs_group_dimensions=(0,))
    dims_dw = jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((0,), (0,)), ((), ())),
        lhs_ragged_dimensions=(0,), rhs_group_dimensions=())
    dx = jax.lax.ragged_dot_general(
        g, w, group_sizes, dims_dx,
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jax.lax.ragged_dot_general(
        x, g, group_sizes, dims_dw,
        preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw, np.zeros(group_sizes.shape, jax.dtypes.float0)


_ragged_dot_nt.defvjp(_ragged_dot_nt_fwd, _ragged_dot_nt_bwd)


def _ffn_ragged(x, topk_probs, topk_idx, we_gate, we_up, we_down):
    """lax.ragged_dot formulation (3-D weights) — fully differentiable;
    serves as the Pallas path's backward (custom_vjp below)."""
    num_experts = we_gate.shape[0]
    dest, token_of, group_sizes = _sort_by_expert(topk_idx, num_experts)

    xs = jnp.take(x, token_of, axis=0, mode="clip")       # [N*K, D] sorted by expert

    if _use_nt_backward():
        rd = _ragged_dot_nt
    else:
        def rd(a, w, gs):
            return jax.lax.ragged_dot(a, w, gs,
                                      preferred_element_type=jnp.float32)
    gate = rd(xs, we_gate, group_sizes)
    up = rd(xs, we_up, group_sizes)
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    out_sorted = rd(h, we_down, group_sizes)

    # Un-sort with a row GATHER + reshape-sum instead of a row scatter-add:
    # TPU scatters of wide rows are orders of magnitude slower than gathers
    # (measured ~25 ms vs ~1 ms at [16k, 2048] bf16 on v5e), and each
    # token's K contributions are contiguous after the reshape so the
    # combine is a plain axis-sum.  ``dest`` maps the natural (token, k)
    # slot order straight to sorted rows — no inverse permutation needed.
    n, k = topk_idx.shape
    out_slots = jnp.take(out_sorted, dest, axis=0, mode="clip")  # [M, D] slot order
    contrib = out_slots.astype(jnp.float32).reshape(n, k, -1) \
        * topk_probs[..., None]
    return contrib.sum(axis=1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Differentiable Pallas wrapper
# ---------------------------------------------------------------------------
# pallas_call has no autodiff rule, but single-chip MoE *training* (no mesh)
# routes through this grouped path (models/moe.py impl="auto"), so the
# kernel needs a VJP: forward = the Pallas kernels, backward = jax.vjp of
# the ragged_dot formulation above (rematerializes gate/up — standard
# flash-style trade).  ``li`` is always a traced int32 scalar (0 when the
# weights are per-layer 3-D and it is unused).

@jax.custom_vjp
def _pallas_ffn_ad(x, probs, idx, wg, wu, wd, li):
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas,
    )

    return grouped_expert_ffn_pallas(
        x, probs, idx, wg, wu, wd,
        layer_index=li if wg.ndim == 4 else None)


def _pallas_ffn_fwd(x, probs, idx, wg, wu, wd, li):
    return (_pallas_ffn_ad(x, probs, idx, wg, wu, wd, li),
            (x, probs, idx, wg, wu, wd, li))


def _pallas_ffn_bwd(res, g):
    import numpy as np

    x, probs, idx, wg, wu, wd, li = res
    stacked = wg.ndim == 4
    if stacked:
        wg3, wu3, wd3 = (
            jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
            for w in (wg, wu, wd))
    else:
        wg3, wu3, wd3 = wg, wu, wd
    _, vjp = jax.vjp(
        lambda x_, p_, a, b, c: _ffn_ragged(x_, p_, idx, a, b, c),
        x, probs, wg3, wu3, wd3)
    dx, dp, dwg3, dwu3, dwd3 = vjp(g)
    if stacked:
        # Scatter the per-layer weight grads back into zero stacks (the
        # cotangent of slicing).  Note: this materializes full-stack-sized
        # grads — fine for the tiny/test models that train single-chip;
        # full-size training runs under a mesh and never takes this path.
        dwg, dwu, dwd = (
            jnp.zeros(w.shape, d3.dtype).at[li].set(d3)
            for w, d3 in ((wg, dwg3), (wu, dwu3), (wd, dwd3)))
    else:
        dwg, dwu, dwd = dwg3, dwu3, dwd3
    f0 = jax.dtypes.float0
    return (dx, dp, np.zeros(idx.shape, f0), dwg, dwu, dwd,
            np.zeros(li.shape, f0))


_pallas_ffn_ad.defvjp(_pallas_ffn_fwd, _pallas_ffn_bwd)
