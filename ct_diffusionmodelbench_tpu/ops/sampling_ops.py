"""Vectorized primitives for the denoising sampler.

These are the TPU-native replacements for the reference sampler's per-step
tensor work (Inference/chat_finetuned.py:16-32,83-104):

- :func:`gumbel_rescore`   — temperature sampling, argmax-equivalent to the
  reference's ``exp(logits)/(-log u)^T`` computed in log-space.
- :func:`token_confidence` — chosen-token softmax probability without
  materializing the full softmax (logsumexp gather).
- :func:`rank_topk_mask`   — per-row top-k selection with a *dynamic* k per
  row, shapes static under jit (the reference loops rows in Python and calls
  ``torch.topk`` with a data-dependent k, chat_finetuned.py:100-104).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def gumbel_rescore(
    logits: jnp.ndarray,
    temperature: float,
    key: Optional[jax.Array],
    parity_fp64: bool = False,
) -> jnp.ndarray:
    """Return scores whose argmax reproduces the reference's Gumbel trick.

    Reference (Inference/chat_finetuned.py:16-22): at temperature T it
    computes ``exp(logits_f64) / (-log u)^T`` and argmaxes.  Taking logs, the
    argmax equals ``argmax(logits - T * log(-log u))``, which we compute
    directly — no overflow-prone exp, and no fp64 requirement on TPU (fp64 is
    emulated and slow there; see SURVEY.md §7 hard-part 1).  Temperature 0
    short-circuits to the raw logits exactly like the reference (:17-18).

    ``parity_fp64`` runs the noise math in float64 for CPU-side parity runs
    with x64 enabled.  Exact torch-RNG reproduction is out of scope: at
    temperature > 0 the reference consumes ``torch.rand`` — a different
    generator — so only distributional equivalence holds; greedy (T=0) is
    bit-exact.
    """
    if temperature == 0:
        return logits
    if key is None:
        raise ValueError("temperature > 0 requires a PRNG key")
    dt = jnp.float64 if parity_fp64 else jnp.float32
    u = jax.random.uniform(key, logits.shape, dtype=dt, minval=jnp.finfo(dt).tiny, maxval=1.0)
    return logits.astype(dt) - temperature * jnp.log(-jnp.log(u))


def token_confidence(logits: jnp.ndarray, chosen: jnp.ndarray) -> jnp.ndarray:
    """softmax(logits)[chosen] per position, computed as exp(logit - lse).

    Matches the reference's ``torch.gather(softmax(logits), -1, x0)``
    (chat_finetuned.py:86-88) without writing a [B, S, V] softmax to HBM —
    only the logsumexp reduction and one gather.
    """
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    chosen_logit = jnp.take_along_axis(
        logits.astype(jnp.float32), chosen[..., None], axis=-1
    )[..., 0]
    return jnp.exp(chosen_logit - lse)


def rank_topk_mask(confidence: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask selecting each row's top-``k[row]`` confidences.

    Static shapes under jit despite per-row dynamic k: rank every position by
    a stable descending sort (ties broken by lowest index, matching
    ``torch.topk``'s sorted output on contiguous CPU tensors), then threshold
    the rank against k.

    confidence: [B, S] float; k: [B] int.  Cost O(S log S) per row — trivial
    at S <= 2.5k (SURVEY.md §7 hard-part 3).
    """
    order = jnp.argsort(-confidence, axis=-1, stable=True)   # [B, S] indices, best first
    ranks = jnp.argsort(order, axis=-1, stable=True)         # rank of each position
    return ranks < k[:, None]
