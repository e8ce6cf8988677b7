"""Transfer-count schedule for the block denoising loop.

Reference semantics (Inference/chat_finetuned.py:25-32
``_get_num_transfer_tokens``): distribute ``mask_num`` masked tokens evenly
over ``steps`` — every step gets ``mask_num // steps``, the first
``mask_num % steps`` steps get one extra.  The reference builds this with a
Python loop over batch rows; here it is a single broadcast compare.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_num_transfer_tokens(mask_index: jnp.ndarray, steps: int) -> jnp.ndarray:
    """mask_index: [B, L] bool → counts [B, steps] int32."""
    mask_num = jnp.sum(mask_index.astype(jnp.int32), axis=1, keepdims=True)  # [B, 1]
    base = mask_num // steps
    remainder = mask_num % steps
    step_ids = jnp.arange(steps, dtype=jnp.int32)[None, :]
    return base + (step_ids < remainder).astype(jnp.int32)
