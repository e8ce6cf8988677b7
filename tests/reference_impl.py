"""Independent NumPy implementation of the LLaDA block-diffusion sampling
semantics, used as the oracle for the fused jitted loop.

Written from the algorithm description in SURVEY.md §2.1 (C1-C6); takes the
model forward as a black-box callable so only the *sampler* math is under
test.  Greedy/deterministic paths only — temperature>0 uses RNG that cannot
match across frameworks.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def np_get_num_transfer_tokens(mask_index: np.ndarray, steps: int) -> np.ndarray:
    mask_num = mask_index.sum(axis=1, keepdims=True)
    base = mask_num // steps
    remainder = mask_num % steps
    out = np.zeros((mask_num.shape[0], steps), dtype=np.int64) + base
    for i in range(mask_num.shape[0]):
        out[i, : remainder[i, 0]] += 1
    return out


def np_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def np_dream_filter_stats(logits, top_p=None, top_k=None, alg="entropy"):
    """Greedy (temperature 0) ``sample_tokens`` semantics of the published
    Dream remote code: top-p/top-k filter the logits, softmax the *filtered*
    distribution, then score per position — max prob (maskgit_plus),
    top1-top2 margin (topk_margin), or sum p·log(p+1e-10) (entropy).
    Written from the algorithm description; independent of the jax path."""
    work = logits.astype(np.float64)
    filt = work.copy()
    if top_p is not None and top_p < 1.0:
        order = np.argsort(-work, axis=-1, kind="stable")
        swork = np.take_along_axis(work, order, axis=-1)
        p = np_softmax(swork)
        cum = np.cumsum(p, axis=-1)
        remove_sorted = (cum - p) > top_p  # keep-first shift of cum > top_p
        remove = np.zeros_like(remove_sorted)
        np.put_along_axis(remove, order, remove_sorted, axis=-1)
        filt = np.where(remove, -np.inf, filt)
    if top_k is not None and top_k < work.shape[-1]:
        kth = np.sort(work, axis=-1)[..., -top_k][..., None]
        filt = np.where(work < kth, -np.inf, filt)
    probs = np_softmax(filt)
    x0 = np.argmax(probs, axis=-1)
    if alg == "topk_margin":
        sp = np.sort(probs, axis=-1)
        conf = sp[..., -1] - sp[..., -2]
    elif alg == "entropy":
        conf = np.sum(probs * np.log(probs + 1e-10), axis=-1)
    else:  # maskgit_plus / origin
        conf = np.max(probs, axis=-1)
    return x0, conf


def np_dream_generate(
    logits_fn: Callable[[np.ndarray], np.ndarray],
    prompt_ids: np.ndarray,
    *,
    steps: int,
    max_new_tokens: int,
    mask_id: int,
    top_p: Optional[float] = None,
    alg: str = "entropy",
    eps: float = 1e-3,
    batch_mean: bool = False,
) -> np.ndarray:
    """Greedy Dream decoding loop (linspace timesteps, score-ordered
    transfers).  ``batch_mean=True`` reproduces the remote code's
    batch-averaged transfer count (one k for all rows); transfers are always
    restricted to masked positions (see sampling/dream.py docstring)."""
    B, P = prompt_ids.shape
    x = np.concatenate(
        [prompt_ids.astype(np.int64),
         np.full((B, max_new_tokens), mask_id, np.int64)], axis=1)
    timesteps = np.linspace(1.0, eps, steps + 1)
    for i in range(steps):
        mask_index = x == mask_id
        x0, conf = np_dream_filter_stats(logits_fn(x), top_p=top_p, alg=alg)
        t, s = timesteps[i], timesteps[i + 1]
        last = i == steps - 1
        if batch_mean:
            num = mask_index.sum() / B
            k = int(num) if last else int(num * (1.0 - s / t))
            counts = [k] * B
        else:
            counts = [int(n) if last else int(n * (1.0 - s / t))
                      for n in mask_index.sum(axis=1)]
        full_conf = np.where(mask_index, conf, -np.inf)
        for j in range(B):
            if counts[j] > 0:
                sel = np.argsort(-full_conf[j], kind="stable")[: counts[j]]
                sel = sel[mask_index[j, sel]]
                x[j, sel] = x0[j, sel]
    return x


def np_llada_generate(
    logits_fn: Callable[[np.ndarray], np.ndarray],
    prompt_ids: np.ndarray,
    *,
    steps: int,
    gen_length: int,
    block_length: int,
    mask_id: int,
    cfg_scale: float = 0.0,
    avoid_eos: bool = False,
    eos_token_id: Optional[int] = None,
) -> np.ndarray:
    """Greedy low-confidence block-diffusion decoding (temperature 0)."""
    B, P = prompt_ids.shape
    x = np.full((B, P + gen_length), mask_id, dtype=np.int64)
    x[:, :P] = prompt_ids
    prompt_index = x != mask_id

    assert gen_length % block_length == 0
    num_blocks = gen_length // block_length
    assert steps % num_blocks == 0
    spb = steps // num_blocks

    for nb in range(num_blocks):
        lo, hi = P + nb * block_length, P + (nb + 1) * block_length
        counts = np_get_num_transfer_tokens(x[:, lo:hi] == mask_id, spb)
        for i in range(spb):
            mask_index = x == mask_id
            if cfg_scale > 0.0:
                un_x = x.copy()
                un_x[prompt_index] = mask_id
                logits = logits_fn(np.concatenate([x, un_x], axis=0))
                cond, uncond = logits[:B], logits[B:]
                logits = uncond + (cfg_scale + 1.0) * (cond - uncond)
            else:
                logits = logits_fn(x)
            if avoid_eos and eos_token_id is not None:
                logits[..., eos_token_id] = -np.inf

            x0 = np.argmax(logits, axis=-1)
            p = np_softmax(logits.astype(np.float64), axis=-1)
            x0_p = np.take_along_axis(p, x0[..., None], axis=-1)[..., 0]
            x0_p[:, hi:] = -np.inf

            x0 = np.where(mask_index, x0, x)
            confidence = np.where(mask_index, x0_p, -np.inf)

            for j in range(B):
                k = counts[j, i]
                if k > 0:
                    # top-k, ties by lowest index (stable descending sort)
                    sel = np.argsort(-confidence[j], kind="stable")[:k]
                    x[j, sel] = x0[j, sel]
    return x
