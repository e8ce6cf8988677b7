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


def _rope_rows(x, cos, sin):
    """In-kernel rotate-half RoPE on a [T, Dh] tile (f32 math, caller casts).

    cos/sin: [T, Dh//2].  Identical formulation to models/layers.apply_rope,
    so the fused path is bit-equal to the jnp rope + kernel composition."""
    half = x.shape[-1] // 2
    x1 = x[:, :half].astype(jnp.float32)
    x2 = x[:, half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _flash_kernel(*refs, scale, tk, s_pad, with_lse, with_rope, g, rep):
    # Ref order: q, k, v, bias[, cos_q, sin_q, cos_k, sin_k], o[, lse].
    # Blocks carry ``g`` query heads per program ([1, T, g*Dh] column slices
    # of the flat [B, S_pad, H*Dh] layout — trailing dims satisfy Mosaic's
    # (8, 128) tiling).  g > 1 amortizes the per-program dispatch overhead
    # that dominates at short sequence lengths (VERDICT r3 item 5: at S=320
    # the per-head grid paid ~2 us x 32 programs against ~9 us of MXU work).
    # The head loop is Python-unrolled so every lane-dim slice is STATIC.
    if with_rope:
        (q_ref, k_ref, v_ref, bias_ref, cq_ref, sq_ref, ck_ref, sk_ref,
         *outs) = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, *outs = refs
    o_ref = outs[0]
    lse_ref = outs[1] if with_lse else None
    dh = o_ref.shape[-1] // g
    nk = s_pad // tk

    for hj in range(g):
        q = q_ref[0, :, hj * dh:(hj + 1) * dh]  # [TQ, Dh]
        if with_rope:
            # Fused RoPE + cast: q/k arrive unrotated, the rotation runs on
            # the f32 tile in VMEM and casts straight to the MXU input dtype
            # — the separate XLA rope fusion's HBM round-trip of roped q/k
            # disappears (VERDICT r2 weak 3 / STATUS gap 4).
            q = _rope_rows(q, cq_ref[0], sq_ref[0]).astype(q_ref.dtype)
        tq = q.shape[0]
        kj = hj // rep  # local kv-head slice (see _run_forward's constraint)

        def body(j, carry, q=q, kj=kj):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(j * tk, tk), kj * dh:(kj + 1) * dh]
            if with_rope:
                k_blk = _rope_rows(
                    k_blk, ck_ref[0, pl.ds(j * tk, tk), :],
                    sk_ref[0, pl.ds(j * tk, tk), :]).astype(k_ref.dtype)
            v_blk = v_ref[0, pl.ds(j * tk, tk), kj * dh:(kj + 1) * dh]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                       # [TQ, TK] f32
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
        o_ref[0, :, hj * dh:(hj + 1) * dh] = out.astype(o_ref.dtype)
        if with_lse:
            # [g, TQ, 1] block
            lse_ref[hj, :, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_kernel_direct(*refs, scale, with_lse, with_rope, g, rep):
    """Single-kv-tile whole-problem kernel (the B=1 / short-S serving shape,
    VERDICT r4 item 6): tk == s_pad, so the online-softmax carry collapses
    to one direct softmax, and the f32 score tile + cast probability tile
    live in TWO shared VMEM scratch buffers reused across the unrolled head
    loop.  The generic kernel holds one f32 score tile PER unrolled head
    (empirical, see _head_group), which caps the group at ~12 MB of scores
    and forces >=2 programs at B=1 — sharing the tiles lets ALL heads ride
    one program, amortizing dispatch + DMA warmup once per layer."""
    if with_rope:
        (q_ref, k_ref, v_ref, bias_ref, cq_ref, sq_ref, ck_ref, sk_ref,
         *rest) = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, *rest = refs
    if with_lse:
        o_ref, lse_ref, s_ref, p_ref = rest
    else:
        o_ref, s_ref, p_ref = rest
        lse_ref = None
    dh = o_ref.shape[-1] // g

    for hj in range(g):
        q = q_ref[0, :, hj * dh:(hj + 1) * dh]
        if with_rope:
            q = _rope_rows(q, cq_ref[0], sq_ref[0]).astype(q_ref.dtype)
        kj = hj // rep
        k_blk = k_ref[0, :, kj * dh:(kj + 1) * dh]
        if with_rope:
            k_blk = _rope_rows(k_blk, ck_ref[0], sk_ref[0]).astype(k_ref.dtype)
        v_blk = v_ref[0, :, kj * dh:(kj + 1) * dh]
        s_ref[...] = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[0, 0, :][None, :]
        s = s_ref[...]
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[:, None])
        l = jnp.sum(p, axis=-1)
        p_ref[...] = p.astype(p_ref.dtype)
        pv = jax.lax.dot_general(
            p_ref[...], v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = pv / jnp.maximum(l, 1e-30)[:, None]
        o_ref[0, :, hj * dh:(hj + 1) * dh] = out.astype(o_ref.dtype)
        if with_lse:
            lse_ref[hj, :, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _direct_mode() -> str:
    """CTDB_FLASH_DIRECT: '1' forces the shared-scratch direct kernel on
    every single-kv-tile call, '0' forces it off; unset = 'auto' = off.

    Measured negative (PERF.json attention_b1_direct_negative, 2026-08-19):
    the direct kernel times identically to the grouped kernel (+-3%) at
    every B in {1,8}, S in {320,512,1024} — collapsing the grid to ONE
    program does not move the B=1 short-S gap to XLA, so that gap is fixed
    custom-call + DMA-warmup overhead, and XLA keeps the short-S dispatch
    (ops/attention.py threshold).  The knob stays for future
    hardware/toolchain revisions."""
    import os

    return os.environ.get("CTDB_FLASH_DIRECT", "auto").strip().lower()


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
    rope: Optional[tuple] = None,
) -> jnp.ndarray:
    """q: [B, S, H, Dh]; k, v: [B, S, KV, Dh]; mask: [B, S] (1 = real).

    ``rope=(cos, sin)`` (each [B, S, Dh//2] f32): q/k arrive UNROTATED and
    the rotate-half RoPE + cast runs inside the kernel — numerically
    identical to ``apply_rope`` followed by the no-rope kernel, minus the
    HBM round-trip of the rotated tensors.

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

    if rope is None:
        of = _flash_core(h, kv, dh, tq, tk, qf, kf, vf, bias)
    else:
        cos, sin = rope
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        cq = jnp.pad(cos, ((0, 0), (0, sq_pad - s), (0, 0)))
        sq = jnp.pad(sin, ((0, 0), (0, sq_pad - s), (0, 0)))
        ck = jnp.pad(cos, ((0, 0), (0, sk_pad - s), (0, 0)))
        sk = jnp.pad(sin, ((0, 0), (0, sk_pad - s), (0, 0)))
        of = _flash_core_rope(h, kv, dh, tq, tk, qf, kf, vf, bias,
                              cq, sq, ck, sk)
    return of[:, :s].reshape(b, s, h, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_core(h, kv, dh, tq, tk, qf, kf, vf, bias):
    """Flat-layout core: qf [B,Sq,H*Dh], kf/vf [B,Sk,KV*Dh], bias [B,1,Sk]
    → of [B,Sq,H*Dh]."""
    of, _ = _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse=False)
    return of


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_core_rope(h, kv, dh, tq, tk, qf, kf, vf, bias, cq, sq, ck, sk):
    """Fused-RoPE core: qf/kf unrotated; cq/sq [B,Sq,Dh//2], ck/sk
    [B,Sk,Dh//2]."""
    of, _ = _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse=False,
                         rope_flat=(cq, sq, ck, sk))
    return of


def _head_group(h, rep, dh, tq, sk_pad, itemsize=2, shared_scores=False):
    """Query heads per program.  Grouping amortizes per-program dispatch
    overhead — decisive at short S where each head's attention is ~10 us of
    MXU work (VERDICT r3 item 5) — but multiplies per-program VMEM, so the
    largest group fitting a ~10 MB budget (of ~16 MB/core) wins.  Valid
    groups divide h and align with GQA (g % rep == 0 keeps whole kv heads
    per program; rep % g == 0 keeps one shared kv head).  Env override
    ``CTDB_FLASH_HEAD_GROUP`` for A/B sweeps."""
    import os

    env = os.environ.get("CTDB_FLASH_HEAD_GROUP")
    if env:
        # Fail-safe like _run_forward's divisibility fallback: a malformed
        # override must not break every attention forward.
        try:
            return max(1, int(env))
        except ValueError:
            pass
    if sk_pad > 1024:
        # long-S regime: per-program work is already large, and full-seq
        # k/v blocks would overflow VMEM at g > 1
        return 1
    budget = 10 * 1024 * 1024
    # The unrolled head loop appears to hold each head's f32 score tile as
    # a distinct VMEM allocation: (tq=512, g=16) — unrolled scores 16.8 MB,
    # just past the 16 MB core — reproducibly fails Mosaic compile while
    # every config at or below ~12 MB of unrolled scores compiles and runs
    # (empirical, tools/flash_group_ab.py; the remote compile service only
    # reports HTTP 500).  Cap both terms.
    scores_budget = 12 * 1024 * 1024
    best = 1
    for g in range(1, h + 1):
        if h % g or not (g % rep == 0 or rep % g == 0):
            continue
        kvg = max(1, g // rep)
        vmem = ((2 * tq * g + 2 * sk_pad * kvg) * dh * itemsize
                + tq * sk_pad * 4)  # q+o, k+v, one f32 score tile
        if shared_scores:
            # Direct kernel: the score/prob tiles are explicit scratch
            # shared across the head loop — no per-head stacking, so the
            # only scores term is the fixed pair of scratch buffers.
            if vmem + tq * sk_pad * itemsize <= budget:
                best = g
        elif vmem <= budget and g * tq * sk_pad * 4 <= scores_budget:
            best = g
    return best


def _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse,
                 rope_flat=None):
    b, sq_pad, _ = qf.shape
    sk_pad = kf.shape[1]
    rep = h // kv
    scale = dh ** -0.5
    with_rope = rope_flat is not None
    direct = sk_pad == tk and _direct_mode() == "1"
    g = _head_group(h, rep, dh, tq, sk_pad, shared_scores=direct)
    if h % g or not (g % rep == 0 or rep % g == 0):  # bad env override
        g = 1
    kvg = max(1, g // rep)

    grid = (b, h // g, sq_pad // tq)
    if direct:
        kernel = functools.partial(_flash_kernel_direct, scale=scale,
                                   with_lse=with_lse, with_rope=with_rope,
                                   g=g, rep=rep)
    else:
        kernel = functools.partial(_flash_kernel, scale=scale, tk=tk,
                                   s_pad=sk_pad, with_lse=with_lse,
                                   with_rope=with_rope, g=g, rep=rep)
    o_spec = pl.BlockSpec((1, tq, g * dh), lambda bi, hi, qi: (bi, qi, hi),
                          memory_space=pltpu.VMEM)
    out_specs, out_shape = o_spec, jax.ShapeDtypeStruct((b, sq_pad, h * dh), qf.dtype)
    if with_lse:
        # lse as [B*H, Sq, 1]: trailing (tq, 1) dims satisfy the tiling rule
        # and each (b, head-group) program owns a distinct [g]-row leading
        # slice.
        lse_spec = pl.BlockSpec(
            (g, tq, 1), lambda bi, hi, qi, _n=h // g: (bi * _n + hi, qi, 0),
            memory_space=pltpu.VMEM)
        out_specs = (o_spec, lse_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b * h, sq_pad, 1), jnp.float32))

    in_specs = [
        pl.BlockSpec((1, tq, g * dh), lambda bi, hi, qi: (bi, qi, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_pad, kvg * dh),
                     lambda bi, hi, qi: (bi, 0, (hi * g) // (rep * kvg)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sk_pad, kvg * dh),
                     lambda bi, hi, qi: (bi, 0, (hi * g) // (rep * kvg)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf, bias]
    if with_rope:
        half = dh // 2
        in_specs += [
            pl.BlockSpec((1, tq, half), lambda bi, hi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, half), lambda bi, hi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, half), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, half), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += list(rope_flat)

    # Scoped-VMEM limit: the default 16 MB rejects head-grouped configs
    # whose unrolled per-head f32 score tiles stack up (measured: g=16 at
    # S=320 without rope needs 19.5 MB).  Budget what the kernel actually
    # uses — pipelined in/out blocks (x3 for double-buffering), the
    # unrolled score tiles, rope tables — plus margin; deliberately NOT a
    # blanket high limit, which would starve the surrounding ops' memory-
    # space assignment (see grouped_gemm_pallas.py's measured note).
    it = qf.dtype.itemsize
    blocks = (2 * tq * g + 2 * sk_pad * kvg) * dh * it + sk_pad * 4
    if with_rope:
        blocks += (2 * tq + 2 * sk_pad) * (dh // 2) * 4
    scores = (tq * sk_pad * (4 + it) if direct  # shared scratch pair
              else g * tq * sk_pad * 4)
    vmem_limit = min(3 * blocks + scores + (6 << 20), 100 << 20)
    scratch_shapes = ([pltpu.VMEM((tq, sk_pad), jnp.float32),
                       pltpu.VMEM((tq, sk_pad), qf.dtype)]
                      if direct else [])
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)

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


def _rope_flat(x, cos, sin, heads, sign=1.0):
    """Rotate-half RoPE on a flat [B, S, heads*Dh] tensor (f32 math);
    ``sign=-1`` applies the inverse rotation (the transpose — RoPE is
    orthogonal per pair), used to rotate gradients back."""
    b, s_, hd = x.shape
    half = cos.shape[-1]
    xs = x.reshape(b, s_, heads, 2 * half)
    x1 = xs[..., :half].astype(jnp.float32)
    x2 = xs[..., half:].astype(jnp.float32)
    c = cos[:, :, None, :]
    sn = sin[:, :, None, :] * sign
    out = jnp.concatenate([x1 * c - x2 * sn, x2 * c + x1 * sn], axis=-1)
    return out.reshape(b, s_, hd).astype(x.dtype)


def _core_rope_fwd(h, kv, dh, tq, tk, qf, kf, vf, bias, cq, sq, ck, sk):
    of, lse = _run_forward(h, kv, dh, tq, tk, qf, kf, vf, bias, with_lse=True,
                           rope_flat=(cq, sq, ck, sk))
    return of, (qf, kf, vf, bias, of, lse, cq, sq, ck, sk)


def _core_rope_bwd(h, kv, dh, tq, tk, res, g):
    from ct_diffusionmodelbench_tpu.ops.flash_attention_bwd import flash_attention_bwd

    qf, kf, vf, bias, of, lse, cq, sq, ck, sk = res
    # Rematerialize the rotated q/k (flash-style recompute trade), run the
    # standard backward, then rotate dq/dk back through the inverse rotation
    # (RoPE is orthogonal: d(unrotated) = R^T d(rotated)).
    q_rot = _rope_flat(qf, cq, sq, h)
    k_rot = _rope_flat(kf, ck, sk, kv)
    dq, dk, dv = flash_attention_bwd(
        q_rot, k_rot, vf, bias, of, g.astype(qf.dtype), lse,
        h=h, kv=kv, dh=dh, scale=dh ** -0.5, tq=tq, tk=tk)
    dq = _rope_flat(dq, cq, sq, h, sign=-1.0)
    dk = _rope_flat(dk, ck, sk, kv, sign=-1.0)
    zeros = jnp.zeros_like
    return (dq.astype(qf.dtype), dk.astype(kf.dtype), dv.astype(vf.dtype),
            zeros(bias), zeros(cq), zeros(sq), zeros(ck), zeros(sk))


_flash_core_rope.defvjp(_core_rope_fwd, _core_rope_bwd)
