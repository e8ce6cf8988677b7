"""Config-driven masked-diffusion transformer (pure functional JAX).

One implementation serves all four checkpoint families the reference loads
via HF remote code (SURVEY.md §2.5): pre-norm residual blocks with RMSNorm,
RoPE, GQA **bidirectional cache-less** attention, and a SwiGLU FFN that is
dense or mixture-of-experts per config.

Design choices (TPU-first):
- Layer parameters are *stacked* along a leading axis and the forward is a
  single ``lax.scan`` over layers → one compiled layer body regardless of
  depth (fast compiles, uniform per-layer sharding for pjit).
- All matmuls carry ``preferred_element_type=f32`` so the MXU accumulates in
  f32 from bf16 operands; norms/rope/softmax run in f32.
- No KV cache and no causal mask anywhere: every denoise step is a full
  bidirectional forward (the reference's hot loop, chat_finetuned.py:67-77).
- ``logit_shift`` reproduces Dream/DiffuCoder's AR-initialized convention
  where position i-1 predicts token i.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ct_diffusionmodelbench_tpu.models.config import ModelConfig
from ct_diffusionmodelbench_tpu.models.layers import (
    apply_rope,
    rms_norm,
    rope_angles,
    swiglu,
)
from ct_diffusionmodelbench_tpu.models.moe import moe_block
from ct_diffusionmodelbench_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype: Optional[str] = None) -> dict:
    """Random-init parameter pytree (truncated-normal-ish scaled normals)."""
    dt = jnp.dtype(dtype or cfg.dtype)
    keys = iter(jax.random.split(key, 64))

    def dense(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32) / math.sqrt(fan_in)).astype(dt)

    L, D, V = cfg.num_layers, cfg.hidden_size, cfg.vocab_size
    Hq, Hkv, Dh = cfg.q_size, cfg.kv_size, cfg.head_dim

    blocks = {
        "attn_norm": jnp.ones((L, D), dt),
        "wq": dense((L, D, Hq), D),
        "wk": dense((L, D, Hkv), D),
        "wv": dense((L, D, Hkv), D),
        "wo": dense((L, Hq, D), Hq),
        "ffn_norm": jnp.ones((L, D), dt),
    }
    if cfg.attention_bias:
        blocks["bq"] = jnp.zeros((L, Hq), dt)
        blocks["bk"] = jnp.zeros((L, Hkv), dt)
        blocks["bv"] = jnp.zeros((L, Hkv), dt)
    if cfg.qk_norm:
        blocks["q_norm"] = jnp.ones((L, Dh), dt)
        blocks["k_norm"] = jnp.ones((L, Dh), dt)
    if cfg.is_moe:
        E, Fm = cfg.num_experts, cfg.moe_intermediate_size
        blocks["router"] = dense((L, D, E), D)
        blocks["we_gate"] = dense((L, E, D, Fm), D)
        blocks["we_up"] = dense((L, E, D, Fm), D)
        blocks["we_down"] = dense((L, E, Fm, D), Fm)
        if cfg.num_shared_experts:
            Fs = Fm * cfg.num_shared_experts
            blocks["ws_gate"] = dense((L, D, Fs), D)
            blocks["ws_up"] = dense((L, D, Fs), D)
            blocks["ws_down"] = dense((L, Fs, D), Fs)
    else:
        F = cfg.intermediate_size
        blocks["w_gate"] = dense((L, D, F), D)
        blocks["w_up"] = dense((L, D, F), D)
        blocks["w_down"] = dense((L, F, D), F)

    params = {
        "embed": dense((V, D), D),
        "blocks": blocks,
        "final_norm": jnp.ones((D,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense((D, V), D)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _block_forward(cfg: ModelConfig, x, lp, cos, sin, mask):
    """One transformer block. x: [B, S, D]; lp: this layer's params."""
    B, S, D = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["attn_norm"], cfg.norm_eps)
    q = jnp.dot(h, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(h, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(h, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if cfg.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(B, S, H, Dh)
    k = k.reshape(B, S, KV, Dh)
    v = v.reshape(B, S, KV, Dh)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    attn_out = attention(q, k, v, mask=mask, impl=cfg.attn_impl, causal=cfg.causal)
    attn_out = attn_out.reshape(B, S, H * Dh)
    x = x + jnp.dot(attn_out, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)

    h = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
    if cfg.is_moe:
        flat = h.reshape(B * S, D)
        moe_params = {k2: lp[k2] for k2 in
                      ("router", "we_gate", "we_up", "we_down", "ws_gate", "ws_up", "ws_down")
                      if k2 in lp}
        out, aux = moe_block(
            flat, moe_params,
            top_k=cfg.num_experts_per_tok, norm_topk=cfg.norm_topk_prob,
        )
        ffn_out = out.reshape(B, S, D)
    else:
        ffn_out = swiglu(h, lp["w_gate"], lp["w_up"], lp["w_down"])
        aux = jnp.zeros((), jnp.float32)
    return x + ffn_out, aux


def forward(
    cfg: ModelConfig,
    params: dict,
    input_ids: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logit_start: Optional[jnp.ndarray] = None,
    logit_length: Optional[int] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full forward: input_ids [B, S] → (logits [B, S, V] f32, aux_loss scalar).

    ``attn_mask`` ([B, S], 1 = real) enables batched eval with left-padded
    prompts; position ids restart at the first real token so RoPE matches the
    unpadded single-prompt run.

    ``logit_start``/``logit_length`` (traced scalar / static int): compute the
    LM head only for positions [start, start+length).  The block sampler uses
    this — only the active block's logits are ever consumed per denoise step,
    and the [S, D] @ [D, V] head matmul plus the downstream [S, V] softmax /
    argmax are the largest non-attention costs at V≈126k.
    """
    B, S = input_ids.shape
    x = jnp.take(params["embed"], input_ids, axis=0)

    if attn_mask is not None:
        positions = jnp.cumsum(attn_mask.astype(jnp.int32), axis=-1) - 1
        positions = jnp.maximum(positions, 0)
    else:
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)

    block_fn = partial(_block_forward, cfg)
    if remat:
        block_fn = jax.checkpoint(block_fn, static_argnums=())

    def scan_body(carry, lp):
        x, aux = carry
        x, aux_l = block_fn(x, lp, cos, sin, attn_mask)
        return (x, aux + aux_l), None

    (x, aux), _ = jax.lax.scan(scan_body, (x, jnp.zeros((), jnp.float32)), params["blocks"])

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)

    if logit_start is not None:
        if cfg.logit_shift:
            # Shifted-logit families read position i's prediction from hidden
            # state i-1: slice one position earlier (block starts are always
            # > 0 — they sit after the prompt).
            x = jax.lax.dynamic_slice_in_dim(x, logit_start - 1, logit_length, axis=1)
        else:
            x = jax.lax.dynamic_slice_in_dim(x, logit_start, logit_length, axis=1)

    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.dot(x, head, preferred_element_type=jnp.float32)

    if cfg.logit_shift and logit_start is None:
        # Dream/DiffuCoder convention: position i-1 predicts token i
        # (AR-initialized diffusion; the HF remote code shifts logits right by
        # one before sampling).  Position 0 keeps its own logits.
        logits = jnp.concatenate([logits[:, :1], logits[:, :-1]], axis=1)

    # Average aux loss over layers (scan summed over L).
    aux = aux / max(cfg.num_layers, 1)
    return logits, aux


def make_forward_fn(cfg: ModelConfig, remat: bool = False):
    """Return ``f(params, input_ids, attn_mask=None, logit_start=None,
    logit_length=None) -> (logits, aux)``."""

    def fn(params, input_ids, attn_mask=None, logit_start=None, logit_length=None):
        return forward(cfg, params, input_ids, attn_mask=attn_mask, remat=remat,
                       logit_start=logit_start, logit_length=logit_length)

    return fn
