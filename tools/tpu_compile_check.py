"""Compile + execute every Pallas kernel path on the REAL chip in one run.

Interpret-mode tests cannot catch Mosaic TPU-compile failures (CLAUDE.md:
e.g. the int8 kernels' scale-tensor `memref_slice` of a tiled dim compiled
nowhere but interpret mode for a whole session) — this is the one-command
gate to run after touching any kernel.  Small shapes, ~2-4 GB HBM peak,
safe to run in a contended window (correctness only, no timing).

Covers: flash attention fwd (+mask, +fused RoPE) and bwd, the grouped-FFN
backends (auto pair, manual pair, fused megakernel, kloop/gather combines,
pad-skip sentinel, stacked layer-id), the int8 manual pair (flat +
stacked), ring attention under a 1-device mesh, and the block-cache
refresh/step pair.

Usage: python tools/tpu_compile_check.py [--only flash,grouped,...]
Prints one OK/FAIL line per path; exit code 1 if any failed.
"""

import argparse
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

CHECKS = {}


def check(name):
    def deco(fn):
        CHECKS[name] = fn
        return fn
    return deco


def _moe_inputs(n=512, k=8, e=16, d=256, fm=256):
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (n, d), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (n, k)), -1)
    idx = jax.random.randint(ks[2], (n, k), 0, e)
    wg = jax.random.normal(ks[3], (e, d, fm), jnp.bfloat16) * 0.05
    wu = jax.random.normal(ks[4], (e, d, fm), jnp.bfloat16) * 0.05
    wd = jax.random.normal(ks[5], (e, fm, d), jnp.bfloat16) * 0.05
    return x, probs, idx, wg, wu, wd


@check("flash_fwd")
def _flash_fwd():
    from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention

    B, S, H, Dh = 2, 512, 4, 128
    ks = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(ks[0], (B, S, H, Dh), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32).at[:, -32:].set(0)
    np.asarray(jax.jit(flash_attention)(q, kv, v))
    np.asarray(jax.jit(flash_attention)(q, kv, v, mask))
    cos = jnp.ones((B, S, Dh // 2), jnp.float32)
    sin = jnp.zeros((B, S, Dh // 2), jnp.float32)
    np.asarray(jax.jit(lambda *a: flash_attention(*a, rope=(cos, sin)))(q, kv, v))


@check("flash_fwd_grouped")
def _flash_fwd_grouped():
    """The head-group policy's production picks (ops/flash_attention.py
    _head_group) at the real serving geometries — Mosaic rejected one
    grouped config (tq=512, g=16) that interpret mode was happy with, so
    every shape the auto-dispatcher can route to the kernel compiles here."""
    from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention

    for (b, s, h) in ((1, 320, 32), (1, 512, 32), (1, 1024, 32),
                      (2, 320, 16)):
        ks = jax.random.split(jax.random.key(3), 3)
        q = jax.random.normal(ks[0], (b, s, h, 128), jnp.bfloat16)
        kv = jax.random.normal(ks[1], (b, s, h, 128), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, 128), jnp.bfloat16)
        np.asarray(jax.jit(flash_attention)(q, kv, v))


@check("flash_direct")
def _flash_direct():
    """The shared-scratch direct kernel (CTDB_FLASH_DIRECT=1, VERDICT r4
    item 6) at the B=1 serving geometries it targets — with the shared
    score/prob scratch the head group can reach g=h (one program), a
    Mosaic-side config interpret mode cannot vouch for."""
    import os

    from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention

    os.environ["CTDB_FLASH_DIRECT"] = "1"
    try:
        for (b, s, h) in ((1, 320, 32), (1, 512, 32), (1, 1024, 32)):
            ks = jax.random.split(jax.random.key(7), 3)
            q = jax.random.normal(ks[0], (b, s, h, 128), jnp.bfloat16)
            kv = jax.random.normal(ks[1], (b, s, h, 128), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, s, h, 128), jnp.bfloat16)
            cos = jnp.ones((b, s, 64), jnp.float32)
            sin = jnp.zeros((b, s, 64), jnp.float32)
            np.asarray(jax.jit(flash_attention)(q, kv, v))
            np.asarray(jax.jit(
                lambda *a: flash_attention(*a, rope=(cos, sin)))(q, kv, v))
    finally:
        os.environ.pop("CTDB_FLASH_DIRECT", None)


@check("flash_bwd")
def _flash_bwd():
    from ct_diffusionmodelbench_tpu.ops.flash_attention import flash_attention

    B, S, H, Dh = 1, 256, 2, 128
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (B, S, H, Dh), jnp.bfloat16)
    kv = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
    g = jax.jit(jax.grad(
        lambda q, k, v: flash_attention(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))
    np.asarray(g(q, kv, v)[0])


@check("grouped_variants")
def _grouped():
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    args = _moe_inputs()
    for env in ({"CTDB_GROUPED_MANUAL": "0"},
                {"CTDB_GROUPED_MANUAL": "1"},
                {"CTDB_GROUPED_MANUAL": "1", "CTDB_GROUPED_SKIP_PAD": "1"},
                {"CTDB_GROUPED_MANUAL": "1", "CTDB_GROUPED_NSUB": "2"},
                {"CTDB_GROUPED_MANUAL": "1", "CTDB_GROUPED_NSUB": "4"},
                {"CTDB_GROUPED_FUSED": "1"},
                {"CTDB_GROUPED_COMBINE": "gather"},
                {"CTDB_ROUTING_RANK": "cumsum"}):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            np.asarray(jax.jit(grouped_expert_ffn_pallas)(*args))
        finally:
            for k, v in old.items():
                os.environ.pop(k, None) if v is None else os.environ.update({k: v})


@check("grouped_stacked")
def _grouped_stacked():
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    x, probs, idx, wg, wu, wd = _moe_inputs()
    wg2, wu2, wd2 = (jnp.stack([w, w * 2]) for w in (wg, wu, wd))
    np.asarray(jax.jit(
        lambda *a: grouped_expert_ffn_pallas(*a, layer_index=jnp.int32(1)))(
            x, probs, idx, wg2, wu2, wd2))


@check("grouped_int8")
def _grouped_int8():
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)
    from ct_diffusionmodelbench_tpu.ops.quant import quantize_tensor

    x, probs, idx, wg, wu, wd = _moe_inputs()
    qg, qu, qd = (quantize_tensor(w) for w in (wg, wu, wd))
    np.asarray(jax.jit(grouped_expert_ffn_pallas)(x, probs, idx, qg, qu, qd))
    qs = [{"q": jnp.stack([t["q"], t["q"]]), "s": jnp.stack([t["s"], t["s"]])}
          for t in (qg, qu, qd)]
    np.asarray(jax.jit(
        lambda *a: grouped_expert_ffn_pallas(*a, layer_index=jnp.int32(1)))(
            x, probs, idx, *qs))


@check("ring_attention")
def _ring():
    from ct_diffusionmodelbench_tpu.ops.ring_attention import ring_attention

    B, S, H, Dh = 1, 256, 2, 128
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1, 1),
        ("data", "seq", "model"))
    np.asarray(jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(q, k, v))


@check("block_cache")
def _block_cache():
    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_cached_fns)

    cfg = get_config("llada-tiny", dtype="bfloat16")
    params = init_params(cfg, jax.random.key(4))
    refresh, step, init_cache = make_cached_fns(cfg)
    ids = jnp.full((1, 32), 5, jnp.int32)
    logits, kc, vc = jax.jit(
        lambda p, x: refresh(p, x, None, 16, 8))(params, ids)
    np.asarray(logits)
    blk = jax.lax.dynamic_slice_in_dim(ids, 16, 8, axis=1)
    np.asarray(jax.jit(
        lambda p, b, kc, vc: step(p, b, 16, kc, vc, None))(
            params, blk, kc, vc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", \
        "this gate exists to catch TPU-only Mosaic failures - run it on TPU"
    only = set(args.only.split(",")) if args.only else None
    failed = []
    for name, fn in CHECKS.items():
        if only and name not in only:
            continue
        try:
            fn()
            print(f"OK    {name}", flush=True)
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            traceback.print_exc(limit=3)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
