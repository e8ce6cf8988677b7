"""LLaDA block-diffusion sampler as one jitted fused on-device loop.

Reference algorithm (canonical copy Inference/chat_finetuned.py:35-106,
duplicated 6x across the repo — SURVEY.md §2.1 C1):

    x = [prompt ‖ mask_id × gen_length]
    for each semi-autoregressive block:
        counts = evenly-distributed transfer schedule over the block's masks
        for each step in the block:
            full-sequence forward (optionally CFG batch-doubling)
            avoid_eos: logits[..., eos] = -inf
            gumbel-noise argmax → x0
            confidence = softmax prob of x0 ('low_confidence') or uniform
            confidence beyond the current block = -inf; non-mask = -inf
            unmask exactly counts[row, step] top-confidence positions

The reference dispatches ``steps`` separate torch forwards from Python with
per-step CPU↔GPU sync; here the *entire* loop — all blocks, all steps — is a
single ``lax.fori_loop`` inside one jit: no host round-trips, static shapes,
the block index derived from the step counter.  Per-step transfer counts are
recomputed on-device at block starts (``lax.cond``), exactly matching the
reference even when the prompt itself contains mask tokens.

Parity notes (SURVEY.md §7 hard-part 1):
- greedy (temperature 0) is the reference's benchmark configuration and
  needs no RNG: token equality requires only matching logits + argmax/topk
  tie order (stable lowest-index, same as torch on contiguous tensors).
- temperature > 0 uses JAX RNG; the reference uses torch RNG
  (chat_finetuned.py:20 ``torch.rand_like``), so only distributional
  equivalence is possible there.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ct_diffusionmodelbench_tpu.ops.sampling_ops import (
    gumbel_rescore,
    rank_topk_mask,
    token_confidence,
)
from ct_diffusionmodelbench_tpu.sampling.schedule import get_num_transfer_tokens

NEG_INF = -jnp.inf


@dataclass(frozen=True)
class LLaDASamplerConfig:
    steps: int = 128
    gen_length: int = 128
    block_length: int = 32
    temperature: float = 0.0
    cfg_scale: float = 0.0
    remasking: str = "low_confidence"   # low_confidence | random
    mask_id: int = 156895
    avoid_eos: bool = False
    eos_token_id: Optional[int] = None
    confidence_dtype: str = "float32"   # parity knob: "bfloat16" rounds the
                                        # softmax confidence like a bf16
                                        # reference run before ranking
                                        # (docs/PARITY.md §5)

    def __post_init__(self):
        if self.gen_length % self.block_length != 0:
            raise ValueError("gen_length must be divisible by block_length "
                             "(reference asserts this, chat_finetuned.py:58)")
        num_blocks = self.gen_length // self.block_length
        if self.steps % num_blocks != 0:
            raise ValueError("steps must be divisible by num_blocks "
                             "(reference asserts this, chat_finetuned.py:60)")
        if self.remasking not in ("low_confidence", "random"):
            raise NotImplementedError(self.remasking)

    @property
    def num_blocks(self) -> int:
        return self.gen_length // self.block_length

    @property
    def steps_per_block(self) -> int:
        return self.steps // self.num_blocks


def _supports_logit_slice(forward_fn) -> bool:
    import inspect

    try:
        return "logit_start" in inspect.signature(forward_fn).parameters
    except (TypeError, ValueError):
        return False


def _denoise_loop(forward_fn, sc: LLaDASamplerConfig, x, prompt_len, attn_mask,
                  key, supports_slice=None):
    """The fused loop body. x: [B, P+G] int32; prompt_len: static int.

    Works block-sliced when the model forward supports ``logit_start``: only
    the active block's [B, block_length, V] logits are computed and scored
    each step.  Equivalent to the reference's full-width math — positions
    outside the block all carry -inf confidence there
    (chat_finetuned.py:95-98), so they can never be selected — while skipping
    ~(S/block_length)x of the LM-head matmul and the entire full-width
    softmax/argmax.

    Known (pathological) divergence: if the *prompt itself* contains mask_id
    tokens, the reference lets them compete for unmask slots in every block
    whose end lies after them (it only -infs positions *beyond* the block);
    the block-sliced loop never revisits positions before the block.  Real
    prompts never contain the mask token.
    """
    B, S = x.shape
    bl = sc.block_length
    spb = sc.steps_per_block
    prompt_index = x != sc.mask_id
    sliced = supports_slice if supports_slice is not None \
        else _supports_logit_slice(forward_fn)

    def block_logits(x, block_start):
        """[B, bl, V] logits for the active block (CFG + avoid-EOS applied)."""
        kw = dict(logit_start=block_start, logit_length=bl) if sliced else {}
        if sc.cfg_scale > 0.0:
            # CFG: second half of the doubled batch sees the prompt re-masked
            # (chat_finetuned.py:69-75).
            un_x = jnp.where(prompt_index, sc.mask_id, x)
            both = jnp.concatenate([x, un_x], axis=0)
            m = None if attn_mask is None else jnp.concatenate([attn_mask, attn_mask], axis=0)
            logits, _ = forward_fn(both, m, **kw)
            cond, uncond = jnp.split(logits, 2, axis=0)
            logits = uncond + (sc.cfg_scale + 1.0) * (cond - uncond)
        else:
            logits, _ = forward_fn(x, attn_mask, **kw)
        if not sliced:
            logits = jax.lax.dynamic_slice_in_dim(logits, block_start, bl, axis=1)
        if sc.avoid_eos and sc.eos_token_id is not None:
            logits = logits.at[..., sc.eos_token_id].set(NEG_INF)
        return logits

    def compute_counts(x, block_start):
        block_ids = jax.lax.dynamic_slice_in_dim(x, block_start, bl, axis=1)
        return get_num_transfer_tokens(block_ids == sc.mask_id, spb)

    def step(s, carry):
        x, counts, key = carry
        block = s // spb
        i = s % spb
        block_start = prompt_len + block * bl

        counts = jax.lax.cond(
            i == 0, lambda: compute_counts(x, block_start), lambda: counts
        )
        k = jnp.take(counts, i, axis=1)  # [B]

        key, k_gumbel, k_rand = jax.random.split(key, 3)
        x_blk = jax.lax.dynamic_slice_in_dim(x, block_start, bl, axis=1)
        mask_blk = x_blk == sc.mask_id
        logits = block_logits(x, block_start)

        scores = gumbel_rescore(logits, sc.temperature, k_gumbel)
        x0 = jnp.argmax(scores, axis=-1).astype(x.dtype)

        if sc.remasking == "low_confidence":
            x0_p = token_confidence(logits, x0)
            if sc.confidence_dtype == "bfloat16":
                x0_p = x0_p.astype(jnp.bfloat16).astype(jnp.float32)
        else:  # random
            x0_p = jax.random.uniform(k_rand, x_blk.shape, jnp.float32)

        x0 = jnp.where(mask_blk, x0, x_blk)
        confidence = jnp.where(mask_blk, x0_p, NEG_INF)

        transfer = rank_topk_mask(confidence, k)
        new_blk = jnp.where(transfer, x0, x_blk)
        x = jax.lax.dynamic_update_slice_in_dim(x, new_blk, block_start, axis=1)
        return (x, counts, key)

    counts0 = jnp.zeros((B, spb), jnp.int32)
    x, _, _ = jax.lax.fori_loop(0, sc.steps, step, (x, counts0, key))
    return x


def make_llada_sampler(
    forward_fn: Callable,
    sampler_config: LLaDASamplerConfig,
    prompt_len: int,
) -> Callable:
    """Build the jitted sampler for a fixed (prompt_len, config) shape class.

    ``forward_fn(params, input_ids, attn_mask) -> (logits, aux)`` is the
    model forward (models.make_forward_fn output).  Returns
    ``sample(params, prompt_ids, attn_mask=None, key=None) -> [B, P+G]``.
    """
    sc = sampler_config
    # Detect logit-slice support on the *model* forward before it is wrapped
    # — the closure below forwards kwargs, so the capability carries through.
    supports_slice = _supports_logit_slice(forward_fn)

    @partial(jax.jit, static_argnames=())
    def sample(params, prompt_ids, attn_mask=None, key=None):
        if key is None:
            key = jax.random.key(0)
        B = prompt_ids.shape[0]
        gen = jnp.full((B, sc.gen_length), sc.mask_id, prompt_ids.dtype)
        x = jnp.concatenate([prompt_ids, gen], axis=1)
        full_mask = None
        if attn_mask is not None:
            ones = jnp.ones((B, sc.gen_length), attn_mask.dtype)
            full_mask = jnp.concatenate([attn_mask, ones], axis=1)
        fwd = lambda ids, m, **kw: forward_fn(params, ids, m, **kw)
        return _denoise_loop(fwd, sc, x, prompt_len, full_mask, key,
                             supports_slice=supports_slice)

    return sample


# Convenience one-shot API with a small compile cache keyed on shape class.
_SAMPLER_CACHE: dict = {}


def llada_generate(
    forward_fn: Callable,
    params,
    prompt_ids: jnp.ndarray,
    *,
    steps: int = 128,
    gen_length: int = 128,
    block_length: int = 32,
    temperature: float = 0.0,
    cfg_scale: float = 0.0,
    remasking: str = "low_confidence",
    mask_id: int = 156895,
    avoid_eos: bool = False,
    eos_token_id: Optional[int] = None,
    confidence_dtype: str = "float32",
    attn_mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Drop-in equivalent of the reference ``llada_generate``.

    Same signature semantics as Inference/chat_finetuned.py:35-106, returning
    [B, prompt_len + gen_length] token ids.
    """
    sc = LLaDASamplerConfig(
        steps=steps, gen_length=gen_length, block_length=block_length,
        temperature=temperature, cfg_scale=cfg_scale, remasking=remasking,
        mask_id=mask_id, avoid_eos=avoid_eos, eos_token_id=eos_token_id,
        confidence_dtype=confidence_dtype,
    )
    prompt_len = int(prompt_ids.shape[1])
    cache_key = (id(forward_fn), dataclasses.astuple(sc), prompt_len,
                 prompt_ids.shape[0], attn_mask is not None)
    sampler = _SAMPLER_CACHE.get(cache_key)
    if sampler is None:
        sampler = make_llada_sampler(forward_fn, sc, prompt_len)
        _SAMPLER_CACHE[cache_key] = sampler
    return sampler(params, prompt_ids, attn_mask=attn_mask, key=key)
