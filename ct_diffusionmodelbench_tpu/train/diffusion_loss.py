"""Masked-diffusion SFT objective.

Reference semantics, reproduced exactly (SURVEY.md §2.1 C10/C11):

- forward (noising) process (Training/Training_0to1k/train.py:90-99):
  ``t ~ U(0,1)`` per row, ``p_mask = (1-eps)·t + eps`` broadcast over length,
  Bernoulli-mask tokens to ``mask_id``.
- loss (train.py:255-317): prompt region un-masked after noising; per-masked-
  token CE weighted by ``1/p_mask`` and ``1/answer_length``; summed and
  divided by batch size; ``+ aux_coef * aux_loss`` for MoE (0.01 at
  train.py:310); NaN/inf guards (token-level nan_to_num with posinf→10.0 at
  :304, whole-loss fallback to 1.0 at :312-313).

TPU-native formulation: no boolean fancy indexing — everything is computed
full-width [B, L] under a weight mask, so the step stays a single static
jitted graph.

Mask-variant note: the two reference training scripts disagree on which mask
feeds the CE.  Training_0to1k/train.py:294-295 *recomputes* the mask from the
noised batch after the prompt restore (so prompt positions never contribute),
while Training_1kto21k/train.py:331-339 reuses the pre-restore
``masked_indices`` — which silently includes prompt positions that were noised
and then restored, i.e. it trains on un-noised prompt tokens with a 1/p_mask
weight.  This module deliberately implements the recomputed-mask (0to1k)
variant: it is the self-consistent masked-diffusion objective (CE only where
the model actually sees ``mask_id``), and the 1kto21k behavior is best read as
a reference bug.  Consequence: loss curves from checkpoints trained by the
1kto21k script will not reproduce exactly (ADVICE round-1 #4).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def forward_process(
    input_ids: jnp.ndarray,
    mask_id: int,
    key: jax.Array,
    eps: float = 1e-3,
):
    """Noising: returns (noisy_batch, masked_indices, p_mask), all [B, L]."""
    b, l = input_ids.shape
    k_t, k_mask = jax.random.split(key)
    t = jax.random.uniform(k_t, (b,), jnp.float32)
    p_mask = (1.0 - eps) * t + eps
    p_mask = jnp.broadcast_to(p_mask[:, None], (b, l))
    masked_indices = jax.random.uniform(k_mask, (b, l), jnp.float32) < p_mask
    noisy_batch = jnp.where(masked_indices, mask_id, input_ids)
    return noisy_batch, masked_indices, p_mask


def _chunked_ce(head_fn, params, hidden, input_ids, chunk):
    """(lse, target_logit), both [B, L] f32, computed ``chunk`` sequence
    positions at a time.

    At V≈157k the full [B, L, V] f32 logits tensor plus its backward
    cotangent (~2.6 GB at B=1, L=2048) are the train step's largest live
    buffers; per-token CE only ever needs two scalars, so the head matmul +
    logsumexp run under ``jax.checkpoint`` inside a serial ``lax.map`` —
    live logits shrink to [B, chunk, V] in both passes.  Per-token math is
    IDENTICAL to the unchunked path (same f32 head matmul and row-wise
    logsumexp), so losses and gradients match to float round-off."""
    b, l, d = hidden.shape
    nc = l // chunk

    # Chunks are carved with dynamic_slice inside the mapped body instead of
    # pre-stacking a [nc, B, C, D] operand: the swapaxes stack materialized a
    # transposed copy of the WHOLE hidden tensor (measured ~28 ms/step in the
    # round-5 train decomposition), while slicing along L reads hidden in its
    # native layout (the slice VJP accumulates d_hidden chunk by chunk).
    @jax.checkpoint
    def one(start):
        h_c = jax.lax.dynamic_slice_in_dim(hidden, start, chunk, axis=1)
        id_c = jax.lax.dynamic_slice_in_dim(input_ids, start, chunk, axis=1)
        logits = head_fn(params, h_c).astype(jnp.float32)      # [B,C,V]
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, id_c[..., None], axis=-1)[..., 0]
        return lse, tl

    lse, tl = jax.lax.map(one, jnp.arange(nc) * chunk)         # [nc,B,C]
    return (jnp.swapaxes(lse, 0, 1).reshape(b, l),
            jnp.swapaxes(tl, 0, 1).reshape(b, l))


def diffusion_sft_loss(
    forward_fn: Callable,
    params,
    input_ids: jnp.ndarray,      # [B, L] int32
    prompt_lengths: jnp.ndarray,  # [B] int32
    mask_id: int,
    key: jax.Array,
    aux_coef: float = 0.01,
    eps: float = 1e-3,
    attn_mask: Optional[jnp.ndarray] = None,
    mask_variant: str = "recompute",
    row_mask: Optional[jnp.ndarray] = None,
    head_fn: Optional[Callable] = None,
    ce_chunk: int = 0,
):
    """Scalar loss + metrics dict.

    ``mask_variant``: 'recompute' (default, the 0to1k semantics — CE only
    where the model actually sees mask_id) or 'pre_restore' (the 1kto21k
    script's behavior: reuse the pre-prompt-restore mask, i.e. also train on
    restored prompt tokens with 1/p_mask weight) — provided so loss curves
    from 1kto21k-trained checkpoints can be reproduced exactly.

    ``row_mask`` ([B] f32, 1 = real row): eval tail batches are padded to a
    fixed batch size so mesh placement stays deterministic and the jitted
    step never recompiles per tail shape; pad rows carry 0 and drop out of
    the loss exactly (the divisor becomes sum(row_mask), which equals B for
    an all-real batch — bit-identical to the unpadded computation).

    ``head_fn`` + ``ce_chunk``: chunked cross-entropy.  ``forward_fn`` must
    then accept a KEYWORD ``return_hidden`` flag and return FINAL
    HIDDEN STATES when it is True (make_forward_fn's ``return_hidden``,
    keyword-only there so a positional True cannot silently bind
    ``logit_start``);
    ``head_fn(params, hidden_chunk)`` maps a chunk to its logits; per-token
    math is unchanged (see :func:`_chunked_ce`).  Used automatically by the
    trainer; a ce_chunk that doesn't divide L shrinks to L's largest
    divisor >= 64 (unchunked only below that)."""
    if mask_variant not in ("recompute", "pre_restore"):
        raise ValueError(f"unknown mask_variant {mask_variant!r}")
    b, l = input_ids.shape
    noisy, pre_restore_mask, p_mask = forward_process(input_ids, mask_id, key, eps)
    p_mask = jnp.clip(p_mask, 1e-6, 1.0)

    positions = jnp.arange(l, dtype=jnp.int32)[None, :]
    prompt_region = positions < prompt_lengths[:, None]
    # Never noise the prompt (train.py:264-267).
    noisy = jnp.where(prompt_region, input_ids, noisy)

    answer_lengths = jnp.maximum(l - prompt_lengths, 1).astype(jnp.float32)  # [B]

    # When ce_chunk doesn't divide L, shrink to the largest divisor >= 64
    # instead of silently falling back to full [B, L, V] logits (the memory
    # cliff chunking exists to avoid — e.g. L=320 under the 512 default).
    if head_fn is not None and ce_chunk and l % ce_chunk:
        ce_chunk = next((c for c in range(min(ce_chunk, l), 63, -1)
                         if l % c == 0), 0)
    if head_fn is not None and ce_chunk and l % ce_chunk == 0:
        hidden, aux = forward_fn(params, noisy, attn_mask, return_hidden=True)
        lse, target_logit = _chunked_ce(head_fn, params, hidden,
                                        input_ids, ce_chunk)
    else:
        logits, aux = forward_fn(params, noisy, attn_mask)
        logits = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        target_logit = jnp.take_along_axis(
            logits, input_ids[..., None], axis=-1)[..., 0]

    if mask_variant == "pre_restore":
        # Training_1kto21k/train.py:331-339 semantics (see module docstring).
        masked = pre_restore_mask
    else:
        # Recompute the mask from the noised batch (train.py:294-295) —
        # positions whose original token *is* mask_id drop out identically.
        masked = (noisy == mask_id) & (input_ids != mask_id)
    token_loss = lse - target_logit                                   # CE, [B, L]
    token_loss = jnp.nan_to_num(token_loss, nan=0.0, posinf=10.0, neginf=0.0)
    token_loss = token_loss / p_mask / answer_lengths[:, None]

    w = masked.astype(jnp.float32)
    denom = jnp.float32(b)
    if row_mask is not None:
        w = w * row_mask.astype(jnp.float32)[:, None]
        denom = jnp.maximum(jnp.sum(row_mask.astype(jnp.float32)), 1.0)
    loss = jnp.sum(token_loss * w) / denom
    n_masked = jnp.sum(w)

    if aux_coef:
        loss = loss + aux_coef * aux

    # Whole-loss NaN/inf guard (train.py:312-313); zero loss when nothing was
    # masked (:314-315).
    loss = jnp.where(jnp.isnan(loss) | jnp.isinf(loss), 1.0, loss)
    loss = jnp.where(n_masked > 0, loss, 0.0)

    metrics = {
        "loss": loss,
        "aux_loss": aux,
        "masked_tokens": n_masked,
        "masked_ce": jnp.sum((lse - target_logit) * w) / jnp.maximum(n_masked, 1.0),
    }
    return loss, metrics
