"""Debug / baseline samplers.

- :func:`simple_generate` — the reference's greedy left-to-right fallback
  sampler (Inference/Llada_MoE/test_simple.py:35-88, SURVEY.md §2.1 C8):
  one mask position filled per full forward, argmax with the mask token
  banned, stop at the first EOS.  A diffusion-model smoke test, not a
  performance path — but still one jitted ``lax.fori_loop`` here instead of
  the reference's Python loop with per-step host syncs.

- :func:`ar_generate` — the autoregressive baseline interface the reference
  gets from HF ``model.generate`` (Inference/Llada_MoE/chat_base_model.py:9-165
  H9 and the LLaDOU probe, chat_with_models/lladou.py): greedy or
  temperature/top-p sampling over a causal model (``ModelConfig.causal``),
  cache-less (full-prefix recompute per token — baselines only).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def simple_generate(
    forward_fn: Callable,
    params,
    prompt_ids: jnp.ndarray,      # [1, P] or [P]
    *,
    mask_id: int,
    max_tokens: int = 100,
    eos_token_id: Optional[int] = None,
) -> jnp.ndarray:
    """Greedy L2R mask filling. Returns [1, P + max_tokens]; positions after
    the first EOS remain mask_id (the reference stops there and the caller
    truncates at the first remaining mask, test_simple.py:78-88)."""
    prompt = jnp.atleast_2d(jnp.asarray(prompt_ids))
    b, p = prompt.shape
    x0 = jnp.concatenate(
        [prompt, jnp.full((b, max_tokens), mask_id, prompt.dtype)], axis=1)

    def step(i, carry):
        x, done = carry
        pos = p + i
        logits, _ = forward_fn(params, x, None)
        row = logits[:, pos, :].at[:, mask_id].set(NEG_INF)
        tok = jnp.argmax(row, axis=-1).astype(x.dtype)
        keep_mask = done  # already hit EOS → leave position masked
        new_tok = jnp.where(keep_mask, jnp.asarray(mask_id, x.dtype), tok)
        x = jax.lax.dynamic_update_slice_in_dim(x, new_tok[:, None], pos, axis=1)
        if eos_token_id is not None:
            done = done | (tok == eos_token_id)
        return x, done

    x, _ = jax.lax.fori_loop(0, max_tokens, step,
                             (x0, jnp.zeros((b,), bool)))
    return x


def ar_generate(
    forward_fn: Callable,
    params,
    prompt_ids: jnp.ndarray,
    *,
    max_new_tokens: int = 256,
    temperature: float = 0.0,
    top_p: Optional[float] = None,
    eos_token_id: Optional[int] = None,
    pad_token_id: int = 0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Cache-less autoregressive decoding on a causal model.

    Returns [B, P + max_new_tokens]; positions after EOS hold pad_token_id.
    """
    prompt = jnp.atleast_2d(jnp.asarray(prompt_ids))
    b, p = prompt.shape
    if key is None:
        key = jax.random.key(0)
    x0 = jnp.concatenate(
        [prompt, jnp.full((b, max_new_tokens), pad_token_id, prompt.dtype)],
        axis=1)

    def sample_row(logits, k):
        if temperature <= 0:
            return jnp.argmax(logits, axis=-1)
        work = logits / temperature
        if top_p is not None and top_p < 1.0:
            kk = min(1024, work.shape[-1])
            vals, idx = jax.lax.top_k(work, kk)
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            vals = jnp.where((cum - probs) > top_p, NEG_INF, vals)
            g = -jnp.log(-jnp.log(jax.random.uniform(
                k, vals.shape, minval=1e-20, maxval=1.0)))
            choice = jnp.argmax(vals + g, axis=-1)
            return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]
        g = -jnp.log(-jnp.log(jax.random.uniform(
            k, work.shape, minval=1e-20, maxval=1.0)))
        return jnp.argmax(work + g, axis=-1)

    def step(i, carry):
        x, done, key = carry
        pos = p + i
        key, sub = jax.random.split(key)
        logits, _ = forward_fn(params, x, None)
        row = logits[:, pos - 1, :]
        tok = sample_row(row, sub).astype(x.dtype)
        tok = jnp.where(done, jnp.asarray(pad_token_id, x.dtype), tok)
        x = jax.lax.dynamic_update_slice_in_dim(x, tok[:, None], pos, axis=1)
        if eos_token_id is not None:
            done = done | (tok == eos_token_id)
        return x, done, key

    x, _, _ = jax.lax.fori_loop(0, max_new_tokens, step,
                                (x0, jnp.zeros((b,), bool), key))
    return x
