"""Dual KV-cache accelerated block decoding (opt-in, beyond the reference).

The reference's hot loop recomputes the FULL sequence every denoising step
(Inference/chat_finetuned.py:67-77): at gen 256 / block 32 / 128 steps each
step forwards prompt+256 tokens to update at most one 32-token block.  But
within a block, every position OUTSIDE the block is frozen — prompt and
previously-decoded blocks hold their final tokens and future blocks stay all
mask — so their K/V change only through *indirect* attention paths.

This module implements the Fast-dLLM "DualCache" approximation (Wu et al.,
arXiv:2505.22618): at each block start, one full forward refreshes a
per-layer K/V cache for the whole sequence (prefix AND suffix); the
remaining steps of the block forward ONLY the active block's tokens, whose
queries attend over [cached prefix K/V ‖ fresh block K/V ‖ cached suffix
K/V].  Per-step compute drops from O(S) to O(block_length) rows through
every matmul and the FFN/MoE.

Approximation contract:
- For a 1-LAYER model the cache is mathematically EXACT (layer-0 K/V depend
  only on each position's own embedding), and with steps_per_block == 1
  every step is a refresh, so the mode degrades to the exact sampler —
  both are pinned by tests (tests/test_block_cache.py).
- For deep models the frozen positions' K/V are stale by up to
  steps_per_block-1 steps of indirect context drift; Fast-dLLM measures
  ≤1-point accuracy deltas at these settings.  The exact sampler remains
  the default everywhere; this mode is reached only via ``--accel
  block-cache`` / ``LLaDASamplerConfig(block_cache=True)``.

Not supported (exact path covers them): CFG batch-doubling, shifted-logit
families (Dream/DiffuCoder), causal AR models, sharded meshes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ct_diffusionmodelbench_tpu.models.config import ModelConfig
from ct_diffusionmodelbench_tpu.models.layers import (
    apply_rope,
    rms_norm,
    rope_angles,
)
from ct_diffusionmodelbench_tpu.models.transformer import (
    EXPERT_STACK_KEYS,
    _attn_project,
    _ffn_block,
    lm_head_logits,
    moe_stacked_mode,
    token_positions,
)
from ct_diffusionmodelbench_tpu.ops.attention import attention, attention_reference
from ct_diffusionmodelbench_tpu.ops.quant import qdot


def _check_supported(cfg: ModelConfig) -> None:
    if cfg.logit_shift:
        raise NotImplementedError(
            "block-cache decode does not support shifted-logit families "
            "(Dream/DiffuCoder) — use the exact sampler")
    if cfg.causal:
        raise NotImplementedError("block-cache decode is for diffusion "
                                  "(bidirectional) models only")


def _split_params(cfg, params):
    """(scanned per-layer params, loop-invariant expert stacks or None)."""
    if moe_stacked_mode(cfg, params):
        stacks = {k: params["blocks"][k] for k in EXPERT_STACK_KEYS}
        scanned = {k: v for k, v in params["blocks"].items()
                   if k not in EXPERT_STACK_KEYS}
        return scanned, stacks
    return params["blocks"], None


# Position ids and LM head come from transformer.py so the cached and exact
# forwards can never diverge on either convention.
_positions = token_positions


def _lm_head(cfg, params, x):
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return lm_head_logits(params, x)


def forward_refresh(cfg: ModelConfig, params: dict, input_ids: jnp.ndarray,
                    attn_mask: Optional[jnp.ndarray], block_start,
                    block_length: int):
    """Full-sequence forward that (a) returns the active block's logits and
    (b) rebuilds the per-layer rotated K/V cache for every position.

    input_ids: [B, S]; block_start: traced scalar; block_length: static.
    Returns (logits [B, bl, V] f32, k_cache, v_cache [L, B, S, KV, Dh])."""
    B, S = input_ids.shape
    x = jnp.take(params["embed"], input_ids, axis=0, mode="clip")
    cos, sin = rope_angles(_positions(attn_mask, B, S), cfg.head_dim,
                           cfg.rope_theta)
    scanned, stacks = _split_params(cfg, params)
    H, Dh = cfg.num_heads, cfg.head_dim

    def body(x, xs):
        lp, li = xs
        h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        q, k, v = _attn_project(cfg, h, lp)
        # The cache stores ROTATED k: positions are absolute and fixed, so
        # the rotation never needs re-applying on cached-step reads.
        qr = apply_rope(q, cos, sin)
        kr = apply_rope(k, cos, sin)
        attn = attention(qr, kr, v, mask=attn_mask, impl=cfg.attn_impl,
                         causal=False)
        attn = attn.reshape(B, S, H * Dh)
        x = x + qdot(attn, lp["wo"]).astype(x.dtype)
        ffn, _ = _ffn_block(cfg, x, lp, stacks, li)
        return x + ffn, (kr, v)

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    x, (k_cache, v_cache) = lax.scan(body, x, (scanned, layer_ids))

    xb = lax.dynamic_slice_in_dim(x, block_start, block_length, axis=1)
    return _lm_head(cfg, params, xb), k_cache, v_cache


def forward_cached_step(cfg: ModelConfig, params: dict,
                        block_ids: jnp.ndarray, block_start,
                        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                        attn_mask: Optional[jnp.ndarray]):
    """Block-only forward against the dual cache.

    block_ids: [B, bl] current tokens of the active block; k/v_cache:
    [L, B, S, KV, Dh] rotated K / V from the last refresh.  Queries are the
    block's positions; keys/values are the cache with the block's slice
    overwritten by this step's fresh projections (the cache itself is NOT
    updated — every cached step recomputes the block's K/V from its current
    tokens, and the next refresh rebuilds everything).
    Returns logits [B, bl, V] f32."""
    B, bl = block_ids.shape
    S = k_cache.shape[2]
    H, Dh = cfg.num_heads, cfg.head_dim

    x = jnp.take(params["embed"], block_ids, axis=0, mode="clip")
    pos_full = _positions(attn_mask, B, S)
    pos_blk = lax.dynamic_slice_in_dim(pos_full, block_start, bl, axis=1)
    cos_b, sin_b = rope_angles(pos_blk, cfg.head_dim, cfg.rope_theta)
    scanned, stacks = _split_params(cfg, params)

    def body(x, xs):
        lp, li, kc_l, vc_l = xs
        h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
        q, k, v = _attn_project(cfg, h, lp)
        qr = apply_rope(q, cos_b, sin_b)
        kr = apply_rope(k, cos_b, sin_b)
        k_full = lax.dynamic_update_slice_in_dim(kc_l, kr, block_start, axis=1)
        v_full = lax.dynamic_update_slice_in_dim(vc_l, v, block_start, axis=1)
        # Rectangular attention (bl queries x S keys): the jnp reference
        # path handles it directly and at bl=32 the O(bl*S) logits are tiny
        # — the flash kernel would gain nothing here.
        attn = attention_reference(qr, k_full, v_full, mask=attn_mask)
        attn = attn.reshape(B, bl, H * Dh)
        x = x + qdot(attn, lp["wo"]).astype(x.dtype)
        ffn, _ = _ffn_block(cfg, x, lp, stacks, li)
        return x + ffn, None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    x, _ = lax.scan(body, x, (scanned, layer_ids, k_cache, v_cache))
    return _lm_head(cfg, params, x)


@functools.lru_cache(maxsize=None)
def make_cached_fns(cfg: ModelConfig):
    """Bundle the two passes for the sampler.  Returns (refresh_fn, step_fn,
    init_cache_fn):

    Memoized per (frozen, hashable) config: repeated calls return the
    IDENTICAL tuple, so the sampler cache in sampling/llada.py (keyed on the
    tuple's element identities) hits instead of retracing — callers may call
    this per generate() without a retrace penalty.

    - refresh_fn(params, x, attn_mask, block_start, block_length)
        -> (block logits, k_cache, v_cache)
    - step_fn(params, block_ids, block_start, k_cache, v_cache, attn_mask)
        -> block logits
    - init_cache_fn(params, B, S) -> zeroed (k_cache, v_cache) carry
      (shapes for the fori_loop carry; step 0 is always a refresh, so the
      zeros are never read)
    """
    _check_supported(cfg)

    def refresh_fn(params, x, attn_mask, block_start, block_length):
        return forward_refresh(cfg, params, x, attn_mask, block_start,
                               block_length)

    def step_fn(params, block_ids, block_start, k_cache, v_cache, attn_mask):
        return forward_cached_step(cfg, params, block_ids, block_start,
                                   k_cache, v_cache, attn_mask)

    def init_cache_fn(params, B, S):
        dt = params["embed"].dtype
        shape = (cfg.num_layers, B, S, cfg.num_kv_heads, cfg.head_dim)
        return jnp.zeros(shape, dt), jnp.zeros(shape, dt)

    return refresh_fn, step_fn, init_cache_fn
