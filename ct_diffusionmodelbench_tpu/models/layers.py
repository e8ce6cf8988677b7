"""Core transformer layers: RMSNorm, RoPE, SwiGLU.

Pure functions over explicit parameter pytrees — no module framework.  Norms
and rotary math run in float32 regardless of the activation dtype (bf16
accumulation differences are the main source of logits divergence vs the HF
reference forwards, SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def rope_angles(positions: jnp.ndarray, head_dim: int, theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for rotary embeddings.

    positions: [B, S] int32 → returns cos, sin each [B, S, head_dim//2] f32.
    """
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = positions.astype(jnp.float32)[..., None] * freqs  # [B, S, half]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (x[..., :half], x[..., half:]) — HF LLaMA convention.

    x: [B, S, H, Dh]; cos/sin: [B, S, Dh//2].
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def swiglu(x: jnp.ndarray, w_gate: jnp.ndarray, w_up: jnp.ndarray, w_down: jnp.ndarray) -> jnp.ndarray:
    from ct_diffusionmodelbench_tpu.ops.quant import qdot

    gate = qdot(x, w_gate)
    up = qdot(x, w_up)
    h = (jax.nn.silu(gate) * up).astype(x.dtype)
    return qdot(h, w_down).astype(x.dtype)
