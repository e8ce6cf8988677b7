"""Weight-only int8 quantization for serving.

The reference serves every model in bf16 and splits models that don't fit
one device across several with ``device_map="auto"`` (e.g.
Inference/chat_finetuned.py:138-144 loads the finetuned LLaDA onto 2x GPUs).
TPU-native alternative when only one chip is available: symmetric per-output-
channel int8 weights.  LLaDA-8B at bf16 is ~16.3 GB — larger than one v5e's
16 GB HBM — but 8.2 GB at int8, so the north-star model itself serves
single-chip (opt-in: ``--quant int8``; bf16 under TP>=2 stays the exact
path).

Representation: a weight ``w [.., D_in, D_out]`` becomes a dict
``{"q": int8 [.., D_in, D_out], "s": f32 [.., D_out]}`` with
``w ~= q * s[..., None, :]``.  Per-OUTPUT-channel scales commute with the
matmul: ``x @ (q * s) == (x @ q) * s`` — so :func:`qdot` applies the scale
to the f32 accumulator, never materializing a dequantized weight at full
precision cost.

Quantized leaves stay ordinary pytrees (dicts), so ``lax.scan`` over stacked
layers, checkpoint save/load, and jit all work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Leaf names eligible for weight-only quantization: the big [.., in, out]
# matmul weights.  Norm gains, biases, router (runs in f32, tiny), and the
# embedding table (consumed by a row gather) stay in the model dtype.
DENSE_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                    "ws_gate", "ws_up", "ws_down")
EXPERT_QUANT_KEYS = ("we_gate", "we_up", "we_down")
TOP_QUANT_KEYS = ("lm_head",)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


@jax.jit
def quantize_tensor(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8: scale = absmax / 127 over the
    contraction (second-to-last) axis."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    s = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_tensor(t: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (t["q"].astype(jnp.float32) * t["s"][..., None, :]).astype(dtype)


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """``jnp.dot(x, w, preferred_element_type=f32)`` that accepts either a
    plain array or a quantized dict.

    int8 values are integers <= 127 — exactly representable in bf16 — so the
    cast loses nothing; the f32 accumulator is scaled per column afterwards
    (mathematically identical to multiplying the weight by its scale first).
    """
    if not is_quantized(w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    acc = jnp.dot(x, w["q"].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return acc * w["s"]


def quantize_params(params: dict, *, experts: bool = True) -> dict:
    """Quantize a model parameter tree in place (returns a new tree; big
    bf16 leaves are replaced, everything else passes through).

    ``experts=False`` keeps the routed-expert stacks in bf16 (e.g. to
    isolate dense-path quantization in tests)."""
    out = {k: v for k, v in params.items()}
    blocks = dict(params["blocks"])
    keys = DENSE_QUANT_KEYS + (EXPERT_QUANT_KEYS if experts else ())
    for k in keys:
        if k in blocks:
            blocks[k] = quantize_tensor(blocks[k])
    out["blocks"] = blocks
    for k in TOP_QUANT_KEYS:
        if k in params:
            out[k] = quantize_tensor(params[k])
    return out


def quantized_leaf_transform(name: str, tensor: jnp.ndarray):
    """Per-leaf transform for ``init_params(..., leaf_transform=...)``:
    quantizes eligible leaves AS THEY ARE BUILT, so a full-size int8 init
    never holds the whole bf16 tree (LLaDA-8B: 16.3 GB bf16 would not fit
    the chip that its 8.2 GB int8 form is being built for)."""
    if name in DENSE_QUANT_KEYS + EXPERT_QUANT_KEYS + TOP_QUANT_KEYS:
        return quantize_tensor(tensor)
    return tensor
