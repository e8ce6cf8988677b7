"""Pallas backward kernels for the bidirectional flash attention.

FlashAttention-2-style backward, non-causal, GQA-aware:

    p_ij  = exp(q_i·k_j * scale + bias_j - lse_i)
    dv_j  = Σ_i p_ij · do_i
    ds_ij = p_ij · (do_i·v_j − D_i) · scale,   D_i = Σ_d do_id · o_id
    dq_i  = Σ_j ds_ij k_j
    dk_j  = Σ_i ds_ij q_i

Two kernels: one gridded over query tiles (dq), one over kv tiles (dk/dv,
accumulating across the rep query heads that share each kv head).  Layout
matches the forward: heads live in the last dim of flat [B, S, H*Dh] arrays
(no transposes); lse / D are [B*H, Sq, 1].  Padded query rows carry zero
``do``, so every spurious term they could contribute vanishes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, dsum_ref,
               dq_ref, *, scale, tk, sk_pad):
    q = q_ref[0, :, :]                      # [TQ, Dh]
    do = do_ref[0, :, :]
    lse = lse_ref[0, :, 0]                  # [TQ]
    dsum = dsum_ref[0, :, 0]
    tq, dh = q.shape
    nk = sk_pad // tk

    def body(j, acc):
        k_blk = k_ref[0, pl.ds(j * tk, tk), :]
        v_blk = v_ref[0, pl.ds(j * tk, tk), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, 0, pl.ds(j * tk, tk)][None, :]
        p = jnp.exp(s - lse[:, None])                       # [TQ, TK]
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum[:, None]) * scale
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((tq, dh), jnp.float32))
    dq_ref[0, :, :] = acc.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, *, scale, tq, sq_pad, rep):
    k_blk = k_ref[0, :, :]                  # [TK, Dh]
    v_blk = v_ref[0, :, :]
    bias = bias_ref[0, 0, :]                # [TK]
    tk, dh = k_blk.shape
    nq = sq_pad // tq

    dk = jnp.zeros((tk, dh), jnp.float32)
    dv = jnp.zeros((tk, dh), jnp.float32)
    for r in range(rep):  # static unroll over the q heads sharing this kv head
        def body(i, carry):
            dk, dv = carry
            q = q_ref[0, pl.ds(i * tq, tq), r * dh:(r + 1) * dh]
            do = do_ref[0, pl.ds(i * tq, tq), r * dh:(r + 1) * dh]
            lse = lse_ref[r, pl.ds(i * tq, tq), 0]
            dsum = dsum_ref[r, pl.ds(i * tq, tq), 0]

            s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = s + bias[None, :]
            p = jnp.exp(s - lse[:, None])                    # [TQ, TK]
            dv = dv + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - dsum[:, None]) * scale
            dk = dk + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk, dv

        dk, dv = jax.lax.fori_loop(0, nq, body, (dk, dv))
    dk_ref[0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, :] = dv.astype(dv_ref.dtype)


def flash_attention_bwd(qf, kf, vf, bias, of, dof, lse, *, h, kv, dh,
                        scale, tq, tk):
    """Flat layout: qf/of/dof [B, Sq, H*Dh]; kf/vf [B, Sk, KV*Dh];
    bias [B, 1, Sk]; lse [B*H, Sq, 1].  Returns (dq, dk, dv), f32, same
    layout."""
    b, sq_pad, _ = qf.shape
    sk_pad = kf.shape[1]
    rep = h // kv
    interpret = jax.default_backend() != "tpu"

    # D_i = rowsum(do * o) per head → [B*H, Sq, 1].
    dsum = jnp.sum(dof.astype(jnp.float32).reshape(b, sq_pad, h, dh)
                   * of.astype(jnp.float32).reshape(b, sq_pad, h, dh), axis=-1)
    dsum = dsum.transpose(0, 2, 1).reshape(b * h, sq_pad, 1)

    # Scoped-VMEM limits: without an explicit CompilerParams limit these
    # kernels get the default ~24 MB scoped-vmem stack, and the dkv kernel's
    # real footprint exceeds it under GQA — whole [1, Sq, rep*Dh] q/do blocks
    # plus the [rep, Sq, 1] lse/dsum blocks (whose minor dim lane-pads x128:
    # 4*2048*128*4 B = 4 MB EACH) double-buffer to ~25.5 MB at the llada-moe
    # train shape, which failed TPU compile by 1.5 MB (docs/STATUS.md round-5;
    # the forward solved the same problem at flash_attention.py:375-399).
    itemsize = jnp.dtype(qf.dtype).itemsize
    lane = 128  # minor-dim tile width: [.., 1] blocks pad to this
    dq_blocks = (2 * tq * dh * itemsize          # q, do tiles
                 + 2 * sk_pad * dh * itemsize    # k, v (whole rows)
                 + sk_pad * 4                    # bias
                 + 2 * tq * lane * 4             # lse, dsum (lane-padded)
                 + tq * dh * 4)                  # dq out (f32)
    dkv_blocks = (2 * sq_pad * rep * dh * itemsize   # q, do (whole rows)
                  + 2 * tk * dh * itemsize           # k, v tiles
                  + tk * 4                           # bias
                  + 2 * rep * sq_pad * lane * 4      # lse, dsum (lane-padded)
                  + 2 * tk * dh * 4)                 # dk, dv out (f32)
    dq_vmem = min(3 * dq_blocks + (6 << 20), 100 << 20)
    dkv_vmem = min(3 * dkv_blocks + (6 << 20), 100 << 20)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, tk=tk, sk_pad=sk_pad),
        grid=(b, h, sq_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, dh), lambda bi, hi, qi: (bi, 0, hi // rep),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, dh), lambda bi, hi, qi: (bi, 0, hi // rep),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, dh), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda bi, hi, qi, _h=h: (bi * _h + hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda bi, hi, qi, _h=h: (bi * _h + hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, h * dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=dq_vmem),
        interpret=interpret,
    )(qf, kf, vf, bias, dof, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, tq=tq, sq_pad=sq_pad, rep=rep),
        grid=(b, kv, sk_pad // tk),
        in_specs=[
            pl.BlockSpec((1, sq_pad, rep * dh), lambda bi, gi, ki: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dh), lambda bi, gi, ki: (bi, ki, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dh), lambda bi, gi, ki: (bi, ki, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda bi, gi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, rep * dh), lambda bi, gi, ki: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, sq_pad, 1),
                         lambda bi, gi, ki, _kv=kv: (bi * _kv + gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, sq_pad, 1),
                         lambda bi, gi, ki, _kv=kv: (bi * _kv + gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tk, dh), lambda bi, gi, ki: (bi, ki, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dh), lambda bi, gi, ki: (bi, ki, gi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, sk_pad, kv * dh), jnp.float32),
            jax.ShapeDtypeStruct((b, sk_pad, kv * dh), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=dkv_vmem),
        interpret=interpret,
    )(qf, kf, vf, bias, dof, lse, dsum)
    return dq, dk, dv
