"""Pallas TPU flash attention — bidirectional, cache-less, GQA-aware.

The single hottest kernel of the framework: every denoise step of every
sampler is a full-sequence non-causal forward (the reference's
``model(x).logits`` hot loop, Inference/chat_finetuned.py:67-77; cost model
in SURVEY.md §3.1).  Classic blockwise online-softmax flash attention:

- grid over (batch, query-head, query-tile); each program streams the
  key/value tiles for its (batch, kv-head) through VMEM,
- running max / denominator carried in f32; probabilities cast to the value
  dtype only for the [TQ, TK] @ [TK, Dh] MXU matmul, accumulated in f32,
- GQA folded into the index map (query head h reads kv head h // rep — no
  materialized K/V repeat, unlike the jnp reference),
- optional padding mask enters as an additive f32 bias row,
- **layout**: kernels address heads through the *last* dimension of the
  flat [B, S, H*Dh] projection output — a zero-cost reshape of what the
  QKV matmuls produce, so no [B,S,H,D]→[B,H,S,D] transpose ever touches
  HBM (the transposes were costing ~3% end-to-end at S=320).

No causal path on purpose: diffusion LMs never use one.  Backward is the
fused FlashAttention-2-style pair of Pallas kernels in
ops/flash_attention_bwd.py, wired through a custom_vjp whose pad/reshape
wrapper differentiates automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TQ = 256
DEFAULT_TK = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *maybe_lse,
                  scale, tk, s_pad, with_lse):
    lse_ref = maybe_lse[0] if with_lse else None
    # Blocks are [1, T, Dh] column slices of the flat [B, S_pad, H*Dh]
    # layout: trailing dims (T, Dh) satisfy Mosaic's (8, 128) tiling.
    q = q_ref[0, :, :]  # [TQ, Dh]
    tq, dh = q.shape
    nk = s_pad // tk

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(j * tk, tk), :]             # [TK, Dh]
        v_blk = v_ref[0, pl.ds(j * tk, tk), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                           # [TQ, TK] f32
        s = s + bias_ref[0, 0, pl.ds(j * tk, tk)][None, :]

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha[:, None] + pv
        return acc, m_new, l

    acc = jnp.zeros((tq, dh), jnp.float32)
    m = jnp.full((tq,), NEG_INF, jnp.float32)
    l = jnp.zeros((tq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m, l))

    out = acc / jnp.maximum(l, 1e-30)[:, None]
    o_ref[0, :, :] = out.astype(o_ref.dtype)
    if with_lse:
        lse_ref[0, :, 0] = m + jnp.log(jnp.maximum(l, 1e-30))  # [1, TQ, 1] block


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tiles(s, tile_q, tile_k):
    # Adaptive tiling: short sequences (the 300-2500 token regime every
    # denoise step runs at) use a single query tile of exactly round_up(s, 8)
    # rows and a single kv tile of round_up(s, 128) — zero padding waste,
    # one-shot online softmax.  Long sequences use fixed large tiles: measured
    # on v5e, padding up to a 512 kv tile beats shrinking the tile (MXU
    # efficiency dominates the wasted rows).
    tq = _round_up(s, 8) if s <= 2 * tile_q else tile_q
    tk = _round_up(s, 128) if s <= 2 * tile_k else tile_k
    return tq, tk, _round_up(s, tq), _round_up(s, tk)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    tile_q: int = DEFAULT_TQ,
    tile_k: int = DEFAULT_TK,
) -> jnp.ndarray:
    """q: [B, S, H, Dh]; k, v: [B, S, KV, Dh]; mask: [B, S] (1 = real).

    Returns [B, S, H, Dh] in q.dtype.  Numerics oracle:
    ops.attention.attention_reference (asserted in tests).  Differentiable.
    """
    b, s, h, dh = q.shape
    kv = k.shape[2]
    tq, tk, sq_pad, sk_pad = _tiles(s, tile_q, tile_k)

    # Flatten heads into the last dim (free reshape of the projection
    # output) and pad the sequence (no-op when s is already tile-aligned).
    qf = jnp.pad(q.reshape(b, s, h * dh), ((0, 0), (0, sq_pad - s), (0, 0)))
    kf = jnp.pad(k.reshape(b, s, kv * dh), ((0, 0), (0, sk_pad - s), (0, 0)))
    vf = jnp.pad(v.reshape(b, s, kv * dh), ((0, 0), (0, sk_pad - s), (0, 0)))

    valid = jnp.ones((b, s), jnp.float32) if mask is None else mask.astype(jnp.float32)
    valid = jnp.pad(valid, ((0, 0), (0, sk_pad - s)))
    bias = jnp.where(valid > 0, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    of = _flash_core(h, kv, dh, tq, tk, qf, kf, vf, bias)
    return of[:, :s].reshape(b, s, h, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_core(h, kv, dh, tq, tk, qf, kf, vf, bias):
    """Flat-layout core: qf [B,Sq,H*Dh], kf/vf [B,Sk,KV*Dh], bias [B,1,Sk]
    → of [B,Sq,H*Dh]."""
    of, _ = _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse=False)
    return of


def _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse):
    b, sq_pad, _ = qf.shape
    sk_pad = kf.shape[1]
    rep = h // kv
    scale = dh ** -0.5

    grid = (b, h, sq_pad // tq)
    kernel = functools.partial(_flash_kernel, scale=scale, tk=tk,
                               s_pad=sk_pad, with_lse=with_lse)
    o_spec = pl.BlockSpec((1, tq, dh), lambda bi, hi, qi: (bi, qi, hi),
                          memory_space=pltpu.VMEM)
    out_specs, out_shape = o_spec, jax.ShapeDtypeStruct((b, sq_pad, h * dh), qf.dtype)
    if with_lse:
        # lse as [B*H, Sq, 1]: trailing (tq, 1) dims satisfy the tiling rule
        # and each (b, h) program owns a distinct leading index.
        lse_spec = pl.BlockSpec(
            (1, tq, 1), lambda bi, hi, qi, _h=h: (bi * _h + hi, qi, 0),
            memory_space=pltpu.VMEM)
        out_specs = (o_spec, lse_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32))

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, dh), lambda bi, hi, qi: (bi, 0, hi // rep),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, dh), lambda bi, hi, qi: (bi, 0, hi // rep),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, bias)

    if with_lse:
        return result
    return result, None


def _core_fwd(h, kv, dh, tq, tk, qf, kf, vf, bias):
    of, lse = _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse=True)
    return of, (qf, kf, vf, bias, of, lse)


def _core_bwd(h, kv, dh, tq, tk, res, g):
    from ct_diffusionmodelbench_tpu.ops.flash_attention_bwd import flash_attention_bwd

    qf, kf, vf, bias, of, lse = res
    # Upstream g is already in the flat padded layout; padded query rows
    # arrive as zeros (the caller's slice VJP), which keeps them out of dk/dv.
    dq, dk, dv = flash_attention_bwd(
        qf, kf, vf, bias, of, g.astype(qf.dtype), lse,
        h=h, kv=kv, dh=dh, scale=dh ** -0.5, tq=tq, tk=tk)
    return (dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype),
            jnp.zeros_like(bias))


_flash_core.defvjp(_core_fwd, _core_bwd)
