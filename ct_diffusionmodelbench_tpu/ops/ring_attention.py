"""Ring attention — sequence/context parallelism over a mesh ``seq`` axis.

The reference has **no** sequence parallelism (SURVEY.md §2.4 P5: its max
sequence is 2048 and "block" in the sampler is a decode schedule, not a
sharding).  This module makes SP/CP a first-class strategy anyway, the
TPU-native way: shard the sequence dimension of Q/K/V over a ``seq`` mesh
axis and rotate the K/V shards around the ring with ``ppermute`` while each
device accumulates its queries' attention with a running log-sum-exp — the
blockwise online-softmax combine of FlashAttention, lifted one level up to
the inter-chip ring (Liu et al., "Ring Attention with Blockwise
Transformers").

Why this shape: per-device activation memory for attention drops from
O(S²·H) to O((S/n)·S·H/n) per step and no full-sequence tensor is ever
materialized on any chip, so context length scales linearly with ring size.
Each ring step is one chunk-local attention (an XLA-fused einsum+softmax —
differentiable, so the same code path trains), and the only communication is
a neighbor ``ppermute`` of the K/V shard per step, which rides ICI
point-to-point links concurrently with compute.

Composability: the ring runs over ``seq`` only; batch stays sharded over
``data`` and heads over ``model`` (TP), so DP x SP x TP compose in one
``shard_map``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _chunk_attention(q, k, v, bias):
    """Unnormalized-combine building block: chunk-local attention plus its
    log-sum-exp.

    q: [B, Sq, H, Dh]; k, v: [B, Sk, KV, Dh]; bias: [B, Sk] additive f32
    (0 = real key, NEG_INF = padded key).
    Returns (o [B, Sq, H, Dh] f32 — softmax-normalized within the chunk,
             lse [B, Sq, H] f32 — log sum exp of the chunk's scores).
    """
    rep = q.shape[2] // k.shape[2]
    if rep != 1:
        b, s, kv, d = k.shape
        k = jnp.broadcast_to(k[:, :, :, None, :], (b, s, kv, rep, d)).reshape(b, s, kv * rep, d)
        v = jnp.broadcast_to(v[:, :, :, None, :], (b, s, kv, rep, d)).reshape(b, s, kv * rep, d)
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[:, None, None, :]
    m = jnp.max(s, axis=-1)                          # [B, H, Sq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)                          # [B, H, Sq]
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    l_safe = jnp.maximum(l, 1e-30)
    o = o / jnp.transpose(l_safe, (0, 2, 1))[..., None]
    lse = m + jnp.log(l_safe)                        # [B, H, Sq]
    return o, jnp.transpose(lse, (0, 2, 1))          # lse → [B, Sq, H]


def ring_attention_local(q, k, v, mask=None, *, axis_name: str, axis_size: int):
    """Per-shard body (call under shard_map with the seq dim sharded).

    q, k, v: [B, S/n, H|KV, Dh] local shards; mask: [B, S/n] local (1 = real).
    Rotates (k, v, mask) around the ring; every device sees every KV chunk
    exactly once and folds it into its running (output, lse) pair.
    """
    b, s_loc = q.shape[:2]
    if mask is None:
        bias = jnp.zeros((b, s_loc), jnp.float32)
    else:
        bias = jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    o0 = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    lse0 = jnp.full(q.shape[:3], NEG_INF, jnp.float32)

    def combine(o, lse, o_i, lse_i):
        # Online-softmax combine of two normalized partial results.
        m = jnp.maximum(lse, lse_i)
        w_old = jnp.exp(lse - m)
        w_new = jnp.exp(lse_i - m)
        denom = jnp.maximum(w_old + w_new, 1e-30)
        o = (o * w_old[..., None] + o_i * w_new[..., None]) / denom[..., None]
        return o, m + jnp.log(denom)

    def step(carry, _):
        o, lse, k_c, v_c, b_c = carry
        o, lse = combine(o, lse, *_chunk_attention(q, k_c, v_c, b_c))
        # Rotate the KV shard to the next device; compute of step t overlaps
        # the transfer for step t+1 under XLA's async collective scheduling.
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        b_c = jax.lax.ppermute(b_c, axis_name, perm)
        return (o, lse, k_c, v_c, b_c), None

    # Only the first n-1 steps rotate: the last chunk is folded outside the
    # scan, so no device pays a final ICI hop whose result is discarded.
    (o, lse, k_l, v_l, b_l), _ = jax.lax.scan(
        step, (o0, lse0, k, v, bias), None, length=axis_size - 1)
    o, lse = combine(o, lse, *_chunk_attention(q, k_l, v_l, b_l))
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    mesh: jax.sharding.Mesh,
) -> jnp.ndarray:
    """shard_map'ed ring attention over the mesh's ``seq`` axis.

    q: [B, S, H, Dh]; k, v: [B, S, KV, Dh]; mask: [B, S] (1 = real).
    Batch shards over ``data``, heads over ``model``, sequence over ``seq``.
    Caller guarantees divisibility (attention.attention falls back to the
    dense reference otherwise).  Differentiable (scan + ppermute + einsum).
    """
    from ct_diffusionmodelbench_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, SEQ_AXIS)

    n = mesh.shape[SEQ_AXIS]
    if mask is None:
        mask = jnp.ones(q.shape[:2], jnp.int32)
    spec = P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None)
    f = jax.shard_map(
        partial(ring_attention_local, axis_name=SEQ_AXIS, axis_size=n),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(DATA_AXIS, SEQ_AXIS)),
        out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v, mask)
