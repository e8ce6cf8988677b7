"""Mixture-of-experts FFN block (LLaDA-MoE).

The reference never implements MoE — it runs the HF remote-code module as a
dense black box and only consumes ``outputs.aux_loss`` and the
``num_experts``/``num_experts_per_tok`` config fields
(Training/Training_0to1k/train.py:129,283,309-310).  Here routing is
first-class:

- softmax router → top-k expert probs (optionally renormalized),
- expert FFNs evaluated either by a dense one-hot einsum (`dense` path — the
  numerics oracle, runs anywhere) or a Pallas grouped-GEMM (`grouped` path,
  ops/grouped_gemm.py) that only spends MXU FLOPs on routed tokens,
- optional always-on shared expert(s) added to the routed output,
- the standard switch-style load-balancing aux loss, surfaced to the trainer
  which weights it 0.01 like the reference (train.py:310).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from ct_diffusionmodelbench_tpu.models.layers import swiglu


def router_probs(x: jnp.ndarray, w_router: jnp.ndarray, top_k: int, norm_topk: bool):
    """Route tokens: returns (topk_probs [N,K] f32, topk_idx [N,K] i32, full_probs [N,E] f32)."""
    logits = jnp.dot(x.astype(jnp.float32), w_router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    topk_probs, topk_idx = jax.lax.top_k(probs, top_k)
    if norm_topk:
        topk_probs = topk_probs / jnp.sum(topk_probs, axis=-1, keepdims=True)
    return topk_probs, topk_idx, probs


def load_balancing_loss(full_probs: jnp.ndarray, topk_idx: jnp.ndarray, num_experts: int) -> jnp.ndarray:
    """Switch-transformer aux loss: E * sum_e f_e * P_e (f32 scalar)."""
    counts = jnp.zeros((num_experts,), jnp.float32).at[topk_idx.reshape(-1)].add(1.0)
    frac_tokens = counts / jnp.maximum(counts.sum(), 1.0)
    frac_probs = jnp.mean(full_probs, axis=0)
    return num_experts * jnp.sum(frac_tokens * frac_probs)


def _experts_dense(x, topk_probs, topk_idx, we_gate, we_up, we_down):
    """One-hot dense evaluation: every expert sees every token, masked combine.

    O(N * E * D * Fm) FLOPs — correct everywhere, used on CPU and as the
    grouped-GEMM oracle in tests.
    """
    num_experts = we_gate.shape[0]
    # [N, E] combine weights.
    combine = jnp.zeros((x.shape[0], num_experts), jnp.float32)
    combine = jax.vmap(lambda c, idx, p: c.at[idx].add(p))(combine, topk_idx, topk_probs)
    gate = jnp.einsum("nd,edf->nef", x, we_gate, preferred_element_type=jnp.float32)
    up = jnp.einsum("nd,edf->nef", x, we_up, preferred_element_type=jnp.float32)
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jnp.einsum("nef,efd->ned", h, we_down, preferred_element_type=jnp.float32)
    return jnp.einsum("ned,ne->nd", out, combine.astype(out.dtype)).astype(x.dtype)


def _experts_grouped(x, topk_probs, topk_idx, we_gate, we_up, we_down,
                     layer_index=None):
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import grouped_expert_ffn

    return grouped_expert_ffn(x, topk_probs, topk_idx, we_gate, we_up,
                              we_down, layer_index=layer_index)


def moe_block(
    x: jnp.ndarray,
    params: dict,
    *,
    top_k: int,
    norm_topk: bool,
    impl: Literal["dense", "grouped", "auto"] = "auto",
    layer_index: jnp.ndarray = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the MoE FFN to x: [N, D] → ([N, D], aux_loss scalar).

    ``layer_index`` (with 4-D ``we_*`` stacks in params) keeps the full
    stacked-layer expert tensors intact: the grouped Pallas kernels index
    them directly via a prefetched layer id, avoiding a per-layer HBM slice
    copy under the forward's lax.scan (transformer.py)."""
    topk_probs, topk_idx, full_probs = router_probs(
        x, params["router"], top_k, norm_topk
    )
    if impl == "auto":
        from ct_diffusionmodelbench_tpu.parallel.mesh import current_mesh

        # Under a mesh, the one-hot einsum path partitions cleanly over the
        # expert axis (GSPMD psums the combine); the ragged grouped GEMM is
        # the single-chip fast path.
        if current_mesh() is not None:
            impl = "dense"
        else:
            impl = "grouped" if jax.default_backend() == "tpu" else "dense"
    from ct_diffusionmodelbench_tpu.ops.quant import (
        dequantize_tensor, is_quantized)

    we = [params["we_gate"], params["we_up"], params["we_down"]]
    li = layer_index
    quantized = is_quantized(we[0])
    if quantized:
        # Weight-only int8 serving (ops/quant.py).  Lane-aligned shapes ride
        # the int8 manual-DMA grouped kernels (half the expert weight
        # stream); everything else dequantizes this layer's experts here
        # and proceeds on bf16.
        shp = we[0]["q"].shape
        aligned = shp[-2] % 128 == 0 and shp[-1] % 128 == 0
        if impl != "grouped" or not aligned:
            if li is not None and we[0]["q"].ndim == 4:
                we = [{"q": jax.lax.dynamic_index_in_dim(w["q"], li, 0,
                                                         keepdims=False),
                       "s": jax.lax.dynamic_index_in_dim(w["s"], li, 0,
                                                         keepdims=False)}
                      for w in we]
                li = None
            we = [dequantize_tensor(w, x.dtype) for w in we]
            quantized = False
    if not quantized and li is not None and we[0].ndim == 4 and impl == "dense":
        # The one-hot einsum oracle needs per-layer 3-D tensors.
        we = [jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
              for w in we]
        li = None
    if impl == "grouped":
        out = _experts_grouped(x, topk_probs, topk_idx, *we, layer_index=li)
    else:
        out = _experts_dense(x, topk_probs, topk_idx, *we)
    if "ws_gate" in params:
        out = out + swiglu(x, params["ws_gate"], params["ws_up"], params["ws_down"])
    aux = load_balancing_loss(full_probs, topk_idx, params["router"].shape[-1])
    return out, aux
