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
    n, k = topk_idx.shape
    m = n * k
    flat = topk_idx.reshape(-1).astype(jnp.int32)
    onehot = flat[:, None] == jnp.arange(num_experts, dtype=jnp.int32)[None, :]
    csum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    rank = jnp.sum(jnp.where(onehot, csum - 1, 0), axis=1)
    group_sizes = csum[-1]
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
    choice = os.environ.get("CTDB_GROUPED_GEMM")
    if choice is None:
        choice = "pallas" if jax.default_backend() == "tpu" else "ragged"
    if choice == "pallas":
        from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
            grouped_expert_ffn_pallas,
        )

        return grouped_expert_ffn_pallas(x, topk_probs, topk_idx,
                                         we_gate, we_up, we_down,
                                         layer_index=layer_index)

    if layer_index is not None and we_gate.ndim == 4:
        # ragged_dot has no layer-indexed form — slice (costs the stack
        # copy the Pallas path avoids; only the small-token regime).
        we_gate, we_up, we_down = (
            jax.lax.dynamic_index_in_dim(w, layer_index, 0, keepdims=False)
            for w in (we_gate, we_up, we_down))

    num_experts = we_gate.shape[0]
    dest, token_of, group_sizes = _sort_by_expert(topk_idx, num_experts)

    xs = jnp.take(x, token_of, axis=0)                     # [N*K, D] sorted by expert

    gate = jax.lax.ragged_dot(xs, we_gate, group_sizes,
                              preferred_element_type=jnp.float32)
    up = jax.lax.ragged_dot(xs, we_up, group_sizes,
                            preferred_element_type=jnp.float32)
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    out_sorted = jax.lax.ragged_dot(h, we_down, group_sizes,
                                    preferred_element_type=jnp.float32)

    # Un-sort with a row GATHER + reshape-sum instead of a row scatter-add:
    # TPU scatters of wide rows are orders of magnitude slower than gathers
    # (measured ~25 ms vs ~1 ms at [16k, 2048] bf16 on v5e), and each
    # token's K contributions are contiguous after the reshape so the
    # combine is a plain axis-sum.  ``dest`` maps the natural (token, k)
    # slot order straight to sorted rows — no inverse permutation needed.
    n, k = topk_idx.shape
    out_slots = jnp.take(out_sorted, dest, axis=0)         # [M, D] slot order
    contrib = out_slots.astype(jnp.float32).reshape(n, k, -1) \
        * topk_probs[..., None]
    return contrib.sum(axis=1).astype(x.dtype)
