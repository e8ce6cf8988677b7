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
    block_cache: bool = False           # opt-in Fast-dLLM-style dual-cache
                                        # acceleration (models/block_cache.py)
                                        # — approximate for >1-layer models;
                                        # exact full-sequence loop otherwise
    parallel_threshold: Optional[float] = None
                                        # opt-in confidence-threshold parallel
                                        # decoding (Fast-dLLM, arXiv:
                                        # 2505.22618): per step, unmask EVERY
                                        # masked position whose confidence
                                        # exceeds the threshold (plus the
                                        # single most confident, so each step
                                        # progresses) instead of the fixed
                                        # transfer schedule; blocks finish in
                                        # as few steps as their tokens are
                                        # confident.  ``steps`` is ignored —
                                        # the per-block step count is dynamic
                                        # (bounded by block_length).

    def __post_init__(self):
        if self.gen_length % self.block_length != 0:
            raise ValueError("gen_length must be divisible by block_length "
                             "(reference asserts this, chat_finetuned.py:58)")
        num_blocks = self.gen_length // self.block_length
        if self.steps % num_blocks != 0 and self.parallel_threshold is None:
            # Threshold parallel decoding ignores `steps` (dynamic
            # while_loop per block) — only the fixed schedule needs the
            # divisibility the reference asserts.
            raise ValueError("steps must be divisible by num_blocks "
                             "(reference asserts this, chat_finetuned.py:60)")
        if self.remasking not in ("low_confidence", "random"):
            raise NotImplementedError(self.remasking)
        if self.block_cache and self.cfg_scale > 0.0:
            raise NotImplementedError(
                "CFG batch-doubling is not supported with block_cache — "
                "use the exact sampler for cfg_scale > 0")

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
                  key, supports_slice=None, cached_fns=None):
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

    def _avoid_eos(logits):
        if sc.avoid_eos and sc.eos_token_id is not None:
            logits = logits.at[..., sc.eos_token_id].set(NEG_INF)
        return logits

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
        return _avoid_eos(logits)

    def compute_counts(x, block_start):
        block_ids = jax.lax.dynamic_slice_in_dim(x, block_start, bl, axis=1)
        return get_num_transfer_tokens(block_ids == sc.mask_id, spb)

    def apply_transfer(x, x_blk, logits, k, k_gumbel, k_rand, block_start):
        """Score the block's logits and unmask the top-k positions — the
        shared tail of both the exact and the block-cached step."""
        x0, confidence, _ = _score(logits, x_blk, k_gumbel, k_rand)
        transfer = rank_topk_mask(confidence, k)
        new_blk = jnp.where(transfer, x0, x_blk)
        return jax.lax.dynamic_update_slice_in_dim(x, new_blk, block_start,
                                                   axis=1)

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
        logits = block_logits(x, block_start)
        x = apply_transfer(x, x_blk, logits, k, k_gumbel, k_rand, block_start)
        return (x, counts, key)

    def _score(logits, x_blk, k_gumbel, k_rand):
        """(x0, confidence) for a block's logits — shared scoring math."""
        mask_blk = x_blk == sc.mask_id
        scores = gumbel_rescore(logits, sc.temperature, k_gumbel)
        x0 = jnp.argmax(scores, axis=-1).astype(x_blk.dtype)
        if sc.remasking == "low_confidence":
            x0_p = token_confidence(logits, x0)
            if sc.confidence_dtype == "bfloat16":
                x0_p = x0_p.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            x0_p = jax.random.uniform(k_rand, x_blk.shape, jnp.float32)
        x0 = jnp.where(mask_blk, x0, x_blk)
        confidence = jnp.where(mask_blk, x0_p, NEG_INF)
        return x0, confidence, mask_blk

    if sc.parallel_threshold is not None:
        # Confidence-threshold parallel decoding (Fast-dLLM): a dynamic
        # while_loop per block in place of the fixed schedule — every
        # masked position whose confidence clears the threshold unmasks
        # this step (always at least the most confident one), so easy
        # blocks finish in one or two forwards.  Composes with the dual
        # cache: step 0 of each block refreshes, later steps are
        # block-only.
        thr = jnp.float32(sc.parallel_threshold)
        use_cache = cached_fns is not None and sc.block_cache
        if use_cache:
            refresh_fn, step_fn, init_cache_fn = cached_fns
            kc0, vc0 = init_cache_fn(B, S)
        else:
            kc0 = vc0 = jnp.zeros((), jnp.float32)  # unused carry slots

        def block_body(b, carry):
            x, key, kc, vc = carry
            block_start = prompt_len + b * bl

            def cond(st):
                x, key, kc, vc, it = st
                blk = jax.lax.dynamic_slice_in_dim(x, block_start, bl, axis=1)
                return jnp.logical_and(jnp.any(blk == sc.mask_id), it < bl)

            def body(st):
                x, key, kc, vc, it = st
                key, k_gumbel, k_rand = jax.random.split(key, 3)
                x_blk = jax.lax.dynamic_slice_in_dim(x, block_start, bl,
                                                     axis=1)
                if use_cache:
                    def do_refresh(x, x_blk, kc, vc):
                        lg, kc, vc = refresh_fn(x, attn_mask, block_start, bl)
                        return lg, kc, vc

                    def do_cached(x, x_blk, kc, vc):
                        return (step_fn(x_blk, block_start, kc, vc,
                                        attn_mask), kc, vc)

                    logits, kc, vc = jax.lax.cond(
                        it == 0, do_refresh, do_cached, x, x_blk, kc, vc)
                    logits = _avoid_eos(logits)
                else:
                    logits = block_logits(x, block_start)
                x0, confidence, mask_blk = _score(logits, x_blk,
                                                  k_gumbel, k_rand)
                forced = jax.nn.one_hot(jnp.argmax(confidence, axis=-1), bl,
                                        dtype=bool)
                transfer = ((confidence > thr) | forced) & mask_blk
                new_blk = jnp.where(transfer, x0, x_blk)
                x = jax.lax.dynamic_update_slice_in_dim(x, new_blk,
                                                        block_start, axis=1)
                return (x, key, kc, vc, it + 1)

            x, key, kc, vc, _ = jax.lax.while_loop(
                cond, body, (x, key, kc, vc, jnp.int32(0)))
            return (x, key, kc, vc)

        num_blocks = sc.num_blocks
        x, _, _, _ = jax.lax.fori_loop(0, num_blocks, block_body,
                                       (x, key, kc0, vc0))
        return x

    if cached_fns is not None and sc.block_cache:
        # Dual-cache mode (models/block_cache.py): step 0 of every block is
        # a full refresh (and yields that step's logits); the remaining
        # steps forward only the active block against the cache.
        refresh_fn, step_fn, init_cache_fn = cached_fns
        avoid_eos = _avoid_eos

        def cstep(s, carry):
            x, counts, key, kc, vc = carry
            block = s // spb
            i = s % spb
            block_start = prompt_len + block * bl

            counts = jax.lax.cond(
                i == 0, lambda: compute_counts(x, block_start), lambda: counts
            )
            k = jnp.take(counts, i, axis=1)  # [B]

            key, k_gumbel, k_rand = jax.random.split(key, 3)
            x_blk = jax.lax.dynamic_slice_in_dim(x, block_start, bl, axis=1)

            def do_refresh(x, x_blk, kc, vc):
                lg, kc, vc = refresh_fn(x, attn_mask, block_start, bl)
                return lg, kc, vc

            def do_cached(x, x_blk, kc, vc):
                return step_fn(x_blk, block_start, kc, vc, attn_mask), kc, vc

            logits, kc, vc = jax.lax.cond(i == 0, do_refresh, do_cached,
                                          x, x_blk, kc, vc)
            logits = avoid_eos(logits)
            x = apply_transfer(x, x_blk, logits, k, k_gumbel, k_rand,
                               block_start)
            return (x, counts, key, kc, vc)

        counts0 = jnp.zeros((B, spb), jnp.int32)
        kc0, vc0 = init_cache_fn(B, S)
        x, _, _, _, _ = jax.lax.fori_loop(
            0, sc.steps, cstep, (x, counts0, key, kc0, vc0))
        return x

    counts0 = jnp.zeros((B, spb), jnp.int32)
    x, _, _ = jax.lax.fori_loop(0, sc.steps, step, (x, counts0, key))
    return x


def make_llada_sampler(
    forward_fn: Callable,
    sampler_config: LLaDASamplerConfig,
    prompt_len: int,
    cached_fns=None,
) -> Callable:
    """Build the jitted sampler for a fixed (prompt_len, config) shape class.

    ``forward_fn(params, input_ids, attn_mask) -> (logits, aux)`` is the
    model forward (models.make_forward_fn output).  Returns
    ``sample(params, prompt_ids, attn_mask=None, key=None) -> [B, P+G]``.

    ``cached_fns``: (refresh_fn, step_fn, init_cache_fn) from
    ``models.block_cache.make_cached_fns`` — required when
    ``sampler_config.block_cache`` is set (each takes ``params`` first).
    """
    sc = sampler_config
    if sc.block_cache and cached_fns is None:
        raise ValueError("block_cache=True needs cached_fns "
                         "(models.block_cache.make_cached_fns(cfg))")
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
        bound = None
        if cached_fns is not None and sc.block_cache:
            refresh_fn, step_fn, init_cache_fn = cached_fns
            bound = (
                lambda ids, m, bs, bl: refresh_fn(params, ids, m, bs, bl),
                lambda blk, bs, kc, vc, m: step_fn(params, blk, bs, kc, vc, m),
                lambda B_, S_: init_cache_fn(params, B_, S_),
            )
        return _denoise_loop(fwd, sc, x, prompt_len, full_mask, key,
                             supports_slice=supports_slice, cached_fns=bound)

    return sample


# Convenience one-shot API with a small compile cache keyed on shape class.
# Bounded FIFO: identity-keyed entries from callers that rebuild their
# forward/cached fns per call must not grow the dict without limit (each
# entry pins a traced+compiled sampler).  make_cached_fns is memoized per
# config (models/block_cache.py), so well-behaved callers always hit.
_SAMPLER_CACHE: dict = {}
_SAMPLER_CACHE_MAX = 64


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
    block_cache: bool = False,
    cached_fns=None,
    parallel_threshold: Optional[float] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Drop-in equivalent of the reference ``llada_generate``.

    Same signature semantics as Inference/chat_finetuned.py:35-106, returning
    [B, prompt_len + gen_length] token ids.

    ``block_cache`` + ``cached_fns`` (models.block_cache.make_cached_fns):
    opt-in dual-cache accelerated decode — see models/block_cache.py for the
    approximation contract.
    """
    sc = LLaDASamplerConfig(
        steps=steps, gen_length=gen_length, block_length=block_length,
        temperature=temperature, cfg_scale=cfg_scale, remasking=remasking,
        mask_id=mask_id, avoid_eos=avoid_eos, eos_token_id=eos_token_id,
        confidence_dtype=confidence_dtype, block_cache=block_cache,
        parallel_threshold=parallel_threshold,
    )
    prompt_len = int(prompt_ids.shape[1])
    fns_key = (None if cached_fns is None
               else tuple(id(f) for f in cached_fns))
    cache_key = (id(forward_fn), fns_key, dataclasses.astuple(sc),
                 prompt_len, prompt_ids.shape[0], attn_mask is not None)
    sampler = _SAMPLER_CACHE.get(cache_key)
    if sampler is None:
        sampler = make_llada_sampler(forward_fn, sc, prompt_len,
                                     cached_fns=cached_fns)
        while len(_SAMPLER_CACHE) >= _SAMPLER_CACHE_MAX:
            _SAMPLER_CACHE.pop(next(iter(_SAMPLER_CACHE)))
        _SAMPLER_CACHE[cache_key] = sampler
    return sampler(params, prompt_ids, attn_mask=attn_mask, key=key)
