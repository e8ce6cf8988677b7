"""AdamW with reduced-precision moment state (bf16 / blockwise-int8).

The reference trains with HF `adamw_torch` and full f32 moments
(Training/Training_0to1k/train.py:448), which on one v5e chip caps the
trainable dense model at ~0.83B params (f32 params + 2x f32 moments + grads
= 16 B/param transient).  This module stores Adam's mu/nu in

- ``bfloat16`` — straight cast, 2x state shrink, or
- ``int8``    — blockwise linear quantization (per-256-value f32 absmax
  scale, the bitsandbytes-style block size), 4x state shrink.  Blocks run
  along each leaf's MINOR axis with q kept in the leaf's own shape
  (layout-native: the update never leaves the tensor's T(8,128) tiling),
  falling back to the flat [Nb, 256] layout for leaves no block divides —
  see Quantized.

while every *update* is computed in f32 (dequantize -> Adam math ->
requantize), so the optimizer dynamics stay close to f32 Adam; the oracle
test pins tiny-model loss trajectories across all three dtypes.  The int8
path floors the Adam denominator by nu's own per-block quantization error
(see adam_math) — without it, updates explode when a nu element quantizes
to 0 while its mu survives.

The transformation mirrors ``optax.adamw`` = scale_by_adam +
add_decayed_weights(mask) + scale_by_learning_rate, with identical bias
correction, so ``state_dtype='float32'`` is exactly optax.adamw.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

QUANT_BLOCK = 256
# Chunked int8 update: rows of the [Nb, QUANT_BLOCK] quantized layout
# processed per lax.map step.  32768 rows = 32 MB of f32 per temp.  Without
# chunking, the update dequantizes BOTH moments of a leaf to full f32 —
# measured 3x 1.75 GB live temps on a llada-moe-7b 4-layer expert stack,
# the allocation that (not the CE) capped single-chip MoE SFT at 2 layers
# in round 3 (the OOM dump names optim.py's mu/nu lines).
CHUNK_ROWS = 32768


def _chunk_rows(r: int, target: int) -> int:
    """Largest divisor of ``r`` that is <= ``target`` (at least 1) — the
    rowwise-chunked Adam path maps over leading-row chunks and a divisor
    avoids padding the leaf (a whole-tensor copy) just to chunk it."""
    best, d = 1, 1
    while d * d <= r:
        if r % d == 0:
            if d <= target:
                best = max(best, d)
            if r // d <= target:
                best = max(best, r // d)
        d += 1
    return best


class Quantized(NamedTuple):
    """Blockwise linear-quantized tensor in one of two layouts:

    - **rowwise** (layout-native): q int8 with the ORIGINAL shape, scale f32
      ``shape[:-1] + (G,)`` — blocks are minor-axis runs, so quantize /
      dequantize / the Adam update are pure elementwise+minor-reduce ops in
      the tensor's own T(8,128) tiling.  The old flatten-to-[Nb, 256] layout
      forced XLA to DETILE every big leaf twice per optimizer step (the
      round-5 train decomposition measured the epilogue at ~10x its HBM
      floor, dominated by relayout copies).
    - **flat** (fallback for leaves whose minor dim no block divides):
      q int8 [Nb, B], scale f32 [Nb, 1] over row-major 256-runs.

    ``meta`` is a zero-size f32 array whose trailing dims record the
    unquantized shape (keeps the pytree leaf-only); the layouts are told
    apart by ``q.shape == meta.shape[1:]``."""
    q: jnp.ndarray
    scale: jnp.ndarray
    meta: jnp.ndarray


def _row_block(shape, block: int = QUANT_BLOCK):
    """Largest of (block, 128) dividing the minor dim of a >=2D shape, or
    None when only the flat layout applies.  128 exists for minor dims like
    the MoE Fm=896 (= 7*128) that 256 does not divide."""
    if len(shape) < 2:
        return None
    for b in (block, 128):
        if shape[-1] % b == 0:
            return b
    return None


def quantize_int8(x: jnp.ndarray, block: int = QUANT_BLOCK) -> Quantized:
    meta = jnp.zeros((0,) + tuple(x.shape), jnp.float32)
    rb = _row_block(x.shape, block)
    if rb is not None:
        g = x.shape[-1] // rb
        xg = x.astype(jnp.float32).reshape(x.shape[:-1] + (g, rb))
        absmax = jnp.max(jnp.abs(xg), axis=-1)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)   # [..., G]
        q = jnp.clip(jnp.round(xg / scale[..., None]), -127, 127)
        return Quantized(q=q.astype(jnp.int8).reshape(x.shape), scale=scale,
                         meta=meta)
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return Quantized(q=q, scale=scale, meta=meta)


def _is_rowwise(t: Quantized) -> bool:
    return t.q.shape == t.meta.shape[1:]


def dequantize_int8(t: Quantized) -> jnp.ndarray:
    shape = t.meta.shape[1:]
    if _is_rowwise(t):
        g = t.scale.shape[-1]
        rb = shape[-1] // g
        xg = t.q.astype(jnp.float32).reshape(shape[:-1] + (g, rb))
        return (xg * t.scale[..., None]).reshape(shape)
    n = 1
    for d in shape:
        n *= d
    flat = (t.q.astype(jnp.float32) * t.scale).reshape(-1)[:n]
    return flat.reshape(shape)


def _quant_err(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Per-block max dequantization error of a [Nb, B] int8 layout:
    half a quantization step, but exactly 0 for all-zero blocks (whose
    stored scale is the 1.0 division guard, not a real step size — any
    block with nonzero absmax holds at least one |q| == 127, so
    ``any(q != 0)`` identifies them)."""
    nonzero = jnp.any(q != 0, axis=-1, keepdims=True)
    return jnp.where(nonzero, 0.5 * scale, 0.0)


def dequantize_err(t: Quantized) -> jnp.ndarray:
    """Per-element dequantization error bound of ``t``, in its original
    shape (each element carries its block's half-step; see _quant_err)."""
    shape = t.meta.shape[1:]
    if _is_rowwise(t):
        g = t.scale.shape[-1]
        rb = shape[-1] // g
        qg = t.q.reshape(shape[:-1] + (g, rb))
        nonzero = jnp.any(qg != 0, axis=-1)
        err = jnp.where(nonzero, 0.5 * t.scale, 0.0)
        return jnp.broadcast_to(err[..., None],
                                shape[:-1] + (g, rb)).reshape(shape)
    n = 1
    for d in shape:
        n *= d
    err = jnp.broadcast_to(_quant_err(t.q, t.scale), t.q.shape)
    return err.reshape(-1)[:n].reshape(shape)


def _encode(x: jnp.ndarray, dtype: str):
    if dtype == "int8":
        return quantize_int8(x)
    if dtype == "bfloat16":
        return x.astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def _decode(t, dtype: str) -> jnp.ndarray:
    if dtype == "int8":
        return dequantize_int8(t)
    return jnp.asarray(t, jnp.float32)


class ScaleByAdamLowpState(NamedTuple):
    count: chex.Array
    mu: chex.ArrayTree
    nu: chex.ArrayTree


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype: str = "float32",
    update_dtype: str = "float32",
) -> optax.GradientTransformation:
    """optax ``scale_by_adam`` with mu/nu stored in ``state_dtype``.

    ``update_dtype``: dtype of the EMITTED update tree (the Adam math
    itself always runs in f32).  With bf16 params the final
    ``p + lr*upd`` rounds to bf16 regardless, so emitting bf16 updates
    only adds bf16 rounding ON the update value (~0.4% relative — the
    gradients were already bf16 under grad_accum_dtype='bfloat16') while
    halving the update tree's live bytes: XLA's buffer assignment holds
    the full tree across the optimizer epilogue, measured 5.5 GiB f32 at
    1.38B params (tools/moe_train_memfit.py) — the allocation between the
    2-layer and 3-layer single-chip MoE SFT ceiling."""
    if state_dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown optimizer state dtype {state_dtype!r}")
    if update_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown optimizer update dtype {update_dtype!r}")
    u_dt = jnp.dtype(update_dtype)

    def init_fn(params):
        def zeros():
            return jax.tree.map(
                lambda p: _encode(jnp.zeros(p.shape, jnp.float32),
                                  state_dtype), params)
        return ScaleByAdamLowpState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def adam_math(g32, mu_prev, nu_prev, nu_err=0.0):
            # Shared by the plain and chunked paths — identical op order;
            # results agree to one ulp (XLA may fuse/FMA the elementwise
            # chains differently per context), pinned by
            # tests/test_train.py::test_int8_adam_chunked_update_matches.
            #
            # ``nu_err`` is the max dequantization error of nu_prev (half a
            # quantization step, per block; 0 for exact f32/bf16 state).
            # Without it the int8 path EXPLODES: nu has the squared dynamic
            # range of the grads, so a block's small elements quantize to 0
            # while their mu survives, and mu_hat/(sqrt(nu_hat)+eps) on the
            # next small-grad step emits updates 1e3-1e6x the intended
            # scale (measured max|upd| 3e4 at lr-normalized scale 1e-2 with
            # decaying-magnitude grads).  Flooring nu by its own error
            # bound caps |upd| near ~0.7 worst-case while shifting
            # well-represented elements by <=1/254 inside the sqrt.
            mu = b1 * mu_prev + (1.0 - b1) * g32
            nu = b2 * nu_prev + (1.0 - b2) * g32 * g32
            mu_hat = mu / c1
            nu_hat = nu / c2
            nu_floor = (b2 * nu_err) / c2
            upd = mu_hat / (jnp.sqrt(nu_hat + nu_floor) + eps)
            return upd, mu, nu

        def leaf_int8_chunked(g, mu_q, nu_q):
            """Int8 leaf update in the quantized [Nb, B] layout, CHUNK_ROWS
            rows per lax.map step: per-step f32 temps are chunk-sized
            instead of leaf-sized, and the requantization blocks are the
            exact rows quantize_int8 uses — same math, ulp-equal results."""
            shape, n = g.shape, g.size
            pad = (-n) % QUANT_BLOCK
            rows_g = jnp.pad(g.reshape(-1), (0, pad)).reshape(-1, QUANT_BLOCK)
            nb = rows_g.shape[0]
            rpad = (-nb) % CHUNK_ROWS
            nc = (nb + rpad) // CHUNK_ROWS

            def rows(x, w):
                return jnp.pad(x, ((0, rpad), (0, 0))).reshape(nc, CHUNK_ROWS, w)

            def one(args):
                gc, qm, sm, qn, sn = args
                upd, mu, nu = adam_math(gc.astype(jnp.float32),
                                        qm.astype(jnp.float32) * sm,
                                        qn.astype(jnp.float32) * sn,
                                        nu_err=_quant_err(qn, sn))

                def quant(x):
                    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
                    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
                    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
                    return q, s

                qm2, sm2 = quant(mu)
                qn2, sn2 = quant(nu)
                return upd.astype(u_dt), qm2, sm2, qn2, sn2

            upd, qm, sm, qn, sn = jax.lax.map(
                one, (rows(rows_g, QUANT_BLOCK),
                      rows(mu_q.q, QUANT_BLOCK), rows(mu_q.scale, 1),
                      rows(nu_q.q, QUANT_BLOCK), rows(nu_q.scale, 1)))

            def unrows(x, w):
                return x.reshape(-1, w)[:nb]

            upd = upd.reshape(-1)[:n].reshape(shape)
            new_mu = Quantized(q=unrows(qm, QUANT_BLOCK),
                               scale=unrows(sm, 1), meta=mu_q.meta)
            new_nu = Quantized(q=unrows(qn, QUANT_BLOCK),
                               scale=unrows(sn, 1), meta=nu_q.meta)
            return upd, new_mu, new_nu

        def leaf_int8_rowwise_chunked(g, mu_q, nu_q):
            """Int8 leaf update in the layout-native rowwise layout, chunked
            over LEADING rows: per-step f32 temps stay ~CHUNK_ROWS *
            QUANT_BLOCK elements, and every op (dequant, Adam math, requant)
            runs in the leaf's own tiling — minor-axis group reshapes and
            leading-dim merges only, no detile copies (the flat [Nb, 256]
            path detiled each big leaf twice per step; round-5 decomposition
            measured the epilogue at ~10x its HBM floor).

            The chunk loop is a fori_loop slicing inputs / updating outputs
            in place on the leading dim — an earlier lax.map formulation
            stacked operands into [nc, rpc, G, B] arrays, and XLA chose
            permuted scan-operand layouts ({3,1,2,0} copies, ~3 ms each on
            the 126464-row embed; round-5 ce_chunk sweep trace)."""
            shape = g.shape
            w = shape[-1]
            gq = mu_q.scale.shape[-1]
            rb = w // gq
            r = g.size // w
            rpc = _chunk_rows(r, max(1, (CHUNK_ROWS * QUANT_BLOCK) // w))
            nc = r // rpc

            g3 = g.reshape(r, gq, rb)
            qm3 = mu_q.q.reshape(r, gq, rb)
            sm3 = mu_q.scale.reshape(r, gq, 1)
            qn3 = nu_q.q.reshape(r, gq, rb)
            sn3 = nu_q.scale.reshape(r, gq, 1)

            def body(i, carry):
                upd_o, qm_o, sm_o, qn_o, sn_o = carry
                s = i * rpc
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, rpc, 0)
                qn_c, sn_c = sl(qn3), sl(sn3)
                nz = jnp.any(qn_c != 0, axis=-1, keepdims=True)
                upd, mu, nu = adam_math(
                    sl(g3).astype(jnp.float32),
                    sl(qm3).astype(jnp.float32) * sl(sm3),
                    qn_c.astype(jnp.float32) * sn_c,
                    nu_err=jnp.where(nz, 0.5 * sn_c, 0.0))

                def quant(x):
                    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                    sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
                    q = jnp.clip(jnp.round(x / sc), -127, 127)
                    return q.astype(jnp.int8), sc

                qm2, sm2 = quant(mu)
                qn2, sn2 = quant(nu)
                ups = lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                    buf, val, s, 0)
                return (ups(upd_o, upd.astype(u_dt)), ups(qm_o, qm2),
                        ups(sm_o, sm2), ups(qn_o, qn2), ups(sn_o, sn2))

            init = (jnp.zeros((r, gq, rb), u_dt), qm3, sm3, qn3, sn3)
            upd, qm, sm, qn, sn = jax.lax.fori_loop(0, nc, body, init)
            new_mu = Quantized(q=qm.reshape(shape),
                               scale=sm.reshape(mu_q.scale.shape),
                               meta=mu_q.meta)
            new_nu = Quantized(q=qn.reshape(shape),
                               scale=sn.reshape(nu_q.scale.shape),
                               meta=nu_q.meta)
            return upd.reshape(shape), new_mu, new_nu

        def leaf(g, mu_q, nu_q):
            if state_dtype == "int8" and g.size > CHUNK_ROWS * QUANT_BLOCK:
                if _is_rowwise(mu_q):
                    return leaf_int8_rowwise_chunked(g, mu_q, nu_q)
                return leaf_int8_chunked(g, mu_q, nu_q)
            nu_err = dequantize_err(nu_q) if state_dtype == "int8" else 0.0
            upd, mu, nu = adam_math(g.astype(jnp.float32),
                                    _decode(mu_q, state_dtype),
                                    _decode(nu_q, state_dtype),
                                    nu_err=nu_err)
            return (upd.astype(u_dt), _encode(mu, state_dtype),
                    _encode(nu, state_dtype))

        flat_g, treedef = jax.tree.flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu) \
            if state_dtype == "int8" else jax.tree.leaves(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu) \
            if state_dtype == "int8" else jax.tree.leaves(state.nu)
        outs = [leaf(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdamLowpState(count=count, mu=new_mu,
                                                 nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` with the norm accumulated in f32.

    With a bf16 grad-accumulation buffer (TrainConfig.grad_accum_dtype)
    optax's global_norm would sum millions of bf16 squares in bf16; this
    casts per-leaf (small transients) and matches optax exactly for f32
    input."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(updates))
        g_norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        updates = jax.tree.map(
            lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _add_decayed_weights_keep_dtype(weight_decay, mask=None):
    """optax.add_decayed_weights computing per leaf in f32 and casting back
    to the UPDATE's dtype — optax's own version promotes bf16 updates to
    f32 (u + wd*p with weak-typed operands), rematerializing the full-size
    f32 update tree the bf16 path exists to avoid."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("add_decayed_weights needs params")

        def leaf(u, p, m=True):
            if not m:
                return u
            return (u.astype(jnp.float32)
                    + weight_decay * p.astype(jnp.float32)).astype(u.dtype)

        if mask is not None:
            m = mask(params) if callable(mask) else mask
            updates = jax.tree.map(leaf, updates, params, m)
        else:
            updates = jax.tree.map(leaf, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_learning_rate_keep_dtype(learning_rate):
    """optax.scale_by_learning_rate casting back to the update's dtype (the
    f32 schedule scalar otherwise promotes a bf16 tree to f32)."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        step = -jnp.asarray(lr, jnp.float32)
        updates = jax.tree.map(
            lambda u: (u.astype(jnp.float32) * step).astype(u.dtype), updates)
        return updates, optax.ScaleByScheduleState(
            count=optax.safe_increment(state.count))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowp(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask=None,
    state_dtype: str = "float32",
    update_dtype: str = "float32",
) -> optax.GradientTransformation:
    """Drop-in for ``optax.adamw`` with moment-state and update dtype
    knobs.  update_dtype='bfloat16' keeps the emitted tree bf16 through
    the decay and lr stages (keep-dtype variants; the per-leaf math still
    runs f32, so values match optax to one bf16 rounding)."""
    if update_dtype == "float32":
        return optax.chain(
            scale_by_adam_lowp(b1=b1, b2=b2, eps=eps,
                               state_dtype=state_dtype),
            optax.add_decayed_weights(weight_decay, mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    return optax.chain(
        scale_by_adam_lowp(b1=b1, b2=b2, eps=eps, state_dtype=state_dtype,
                           update_dtype=update_dtype),
        _add_decayed_weights_keep_dtype(weight_decay, mask),
        _scale_by_learning_rate_keep_dtype(learning_rate),
    )
