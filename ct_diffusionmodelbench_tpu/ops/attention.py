"""Bidirectional, cache-less multi-head attention.

The diffusion LMs here attend over the *full* sequence every denoising step —
there is no causal mask and no KV cache (the reference's hot loop re-runs
``model(x).logits`` on the whole sequence each step,
Inference/chat_finetuned.py:77).  That makes non-causal flash attention the
single hottest kernel of the framework.

Two implementations behind one dispatcher:

- ``reference``: pure jnp einsum + f32 softmax.  Runs anywhere (CPU tests),
  and is the numerics oracle for the Pallas kernel.
- ``pallas``: blockwise online-softmax flash attention for TPU
  (ops/flash_attention.py), VMEM-tiled for the MXU.

Shapes follow the GQA convention:
    q: [B, S, H,  Dh]    k, v: [B, S, KV, Dh]    with H % KV == 0.
Optional ``mask``: [B, S] with 1 = real token, 0 = padding.  Padding keys are
excluded from every query's softmax; padded query rows produce garbage that
callers must ignore (the sampler only reads real positions).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return x
    b, s, kv, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, kv, n_rep, d)).reshape(b, s, kv * n_rep, d)


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """jnp reference attention (softmax in f32, output in q.dtype)."""
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        logits = logits + bias
    if causal:
        s = q.shape[1]
        tri = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(tri[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    causal: bool = False,
    rope: Optional[tuple] = None,
) -> jnp.ndarray:
    """Dispatch to the Pallas flash kernel on TPU, jnp reference elsewhere.

    ``rope=(cos, sin)`` ([B, S, Dh//2] each): q/k arrive UNROTATED; the
    Pallas path fuses the rotation + cast into the kernel (no HBM
    round-trip of the rotated tensors), every other path applies the
    identical jnp rotation first — numerics are the same either way.

    The causal path (AR baseline models only) always uses the reference
    implementation — the Pallas kernel is specialized for the bidirectional
    diffusion hot loop.
    """
    def roped():
        if rope is None:
            return q, k
        from ct_diffusionmodelbench_tpu.models.layers import apply_rope
        return apply_rope(q, rope[0], rope[1]), apply_rope(k, rope[0], rope[1])

    if not causal and impl == "auto":
        # Sequence-parallel meshes take the ring path under auto dispatch:
        # only the ring keeps the sequence sharded through attention (any
        # dense impl would force GSPMD to all-gather the full S on-chip,
        # defeating the point of the seq axis).  Explicit impl= wins so the
        # numerics oracle stays forceable under an SP mesh.
        from ct_diffusionmodelbench_tpu.parallel.mesh import (
            current_mesh, seq_axis_size)

        mesh = current_mesh()
        sp = seq_axis_size(mesh)
        if sp > 1:
            from ct_diffusionmodelbench_tpu.ops.ring_attention import ring_attention
            from ct_diffusionmodelbench_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            b, s, h, _ = q.shape
            kv = k.shape[2]
            tp = mesh.shape[MODEL_AXIS]
            if (s % sp == 0 and b % mesh.shape[DATA_AXIS] == 0
                    and h % tp == 0 and kv % tp == 0):
                qr, kr = roped()
                return ring_attention(qr, kr, v, mask=mask, mesh=mesh)
    if impl == "auto":
        # Measured crossover on v5e with RoPE fused in-kernel
        # (tools/flash_group_ab.py, round-4 head-grouped kernel): the win
        # boundary collapses onto ONE variable, the total score-matrix work
        # B*H*S^2.  Measured at both 32-head and 16-head geometries across
        # batch 1..8 and S 320..4096: every configuration at or above
        # 2.62e7 elements wins for Pallas (1.18x..3.3x — e.g. b8/h32/S320
        # 1.18x, b4/h32/S512 == b8/h16/S512 1.7x, b1/h32/S1024 1.47x),
        # every one at or below 1.68e7 wins for XLA (whose fused attention
        # degrades super-linearly once the problem leaves its small-buffer
        # regime).  Threshold set in the measured gap.  Override with
        # impl= or cfg.attn_impl.
        b, s, h = q.shape[0], q.shape[1], q.shape[2]
        impl = ("pallas" if _on_tpu() and b * h * s * s >= 24e6
                else "reference")
    if causal:
        impl = "reference"
    if impl == "pallas":
        from ct_diffusionmodelbench_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None:
            return _flash_sharded(q, k, v, mask, mesh, rope=rope)
        from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, rope=rope)
    if impl == "reference":
        qr, kr = roped()
        return attention_reference(qr, kr, v, mask=mask, causal=causal)
    raise ValueError(f"unknown attention impl {impl!r}")


def _flash_sharded(q, k, v, mask, mesh, rope=None):
    """shard_map the flash kernel over the mesh: batch over 'data', heads
    over 'model'.  Attention is head-local, so no collectives are needed —
    each shard runs the unmodified kernel on its local heads (rope tables
    are head-independent, so they shard over 'data' only).  Falls back to
    the jnp reference when the head counts don't divide the model axis."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention
    from ct_diffusionmodelbench_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    b, _, h, _ = q.shape
    kv = k.shape[2]
    if h % tp or kv % tp or b % dp:
        if rope is not None:
            from ct_diffusionmodelbench_tpu.models.layers import apply_rope
            q = apply_rope(q, rope[0], rope[1])
            k = apply_rope(k, rope[0], rope[1])
        return attention_reference(q, k, v, mask=mask)

    if mask is None:
        mask = jnp.ones(q.shape[:2], jnp.int32)
    spec_qkv = P(DATA_AXIS, None, MODEL_AXIS, None)
    spec_bs = P(DATA_AXIS, None)
    if rope is None:
        f = jax.shard_map(
            partial(flash_attention),
            mesh=mesh,
            in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_bs),
            out_specs=spec_qkv,
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )
        return f(q, k, v, mask)
    spec_rope = P(DATA_AXIS, None, None)
    f = jax.shard_map(
        lambda q_, k_, v_, m_, c_, s_: flash_attention(
            q_, k_, v_, mask=m_, rope=(c_, s_)),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_bs, spec_rope, spec_rope),
        out_specs=spec_qkv,
        check_vma=False,
    )
    return f(q, k, v, mask, rope[0], rope[1])
