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
