"""Round-3 MoE FFN sweep: batch x tile_m x VMEM-budget x fused-megakernel.

Measures seconds/layer of the grouped expert FFN at the llada-moe-7b layer
shape (E=64 top-8, D=2048, Fm=896, bf16) for the batched-denoise token
counts of batch 8/16/32 (seq 320), on the real chip with the fori_loop
chained-timing methodology (CLAUDE.md: single-op timings are meaningless on
the axon backend).

Floors at this shape (docs/STATUS.md): weight-DMA 0.86 ms/layer (689 MB of
expert weights at ~819 GB/s), compute 2.25e11 FLOPs x (M/20480) / 197 TFLOPs.

Usage: python tools/sweep_moe_r3.py [--quick]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

E, K, D, FM = 64, 8, 2048, 896
SEQ = 320  # prompt 64 + gen 256


def _t(call, reps=3):
    np.asarray(call())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(call())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def time_loop(fn, args, iters=8, reps=3):
    @jax.jit
    def run(args):
        def body(_, c):
            out = fn(*c)
            return (out.astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, iters, body, args)[0].sum() \
            .astype(jnp.float32)

    return _t(lambda: run(args), reps) / iters


def setup(n):
    x = jax.random.normal(jax.random.key(0), (n, D), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(jax.random.key(1), (n, K)), -1)
    idx = jax.random.randint(jax.random.key(2), (n, K), 0, E)
    wg, wu = (jax.random.normal(jax.random.key(i), (E, D, FM),
                                jnp.bfloat16) * 0.02 for i in (3, 4))
    wd = jax.random.normal(jax.random.key(5), (E, FM, D), jnp.bfloat16) * 0.02
    return x, probs, idx, wg, wu, wd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batches", type=str, default="8,16,32")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    results = []
    batches = [int(b) for b in args.batches.split(",")]
    variants = [
        # (label, tile_m, vmem_mb, fused)
        ("tm64_default", 64, None, False),
        ("tm128_vmem40", 128, 40, False),
        ("tm256_vmem48", 256, 48, False),
        ("fused_megakernel", 64, None, True),
    ]
    if args.quick:
        variants = variants[:2]

    for batch in batches:
        n = batch * SEQ
        ops = setup(n)
        m = n * K
        compute_floor_ms = 6 * m * D * FM / 197e12 * 1e3
        for label, tm, vmem, fused in variants:
            env = {}
            if vmem:
                env["CTDB_GROUPED_VMEM_MB"] = str(vmem)
            if fused:
                env["CTDB_GROUPED_FUSED"] = "1"
            env["CTDB_GROUPED_TILE_M"] = str(tm)
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                dt = time_loop(
                    lambda *a: grouped_expert_ffn_pallas(*a), ops,
                    iters=8, reps=3)
                row = {"batch": batch, "slots": m, "variant": label,
                       "ms_per_layer": round(dt * 1e3, 3),
                       "compute_floor_ms": round(compute_floor_ms, 3),
                       "weight_dma_floor_ms": 0.86}
            except Exception as e:
                row = {"batch": batch, "variant": label,
                       "error": f"{type(e).__name__}: {str(e)[:150]}"}
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            print(json.dumps(row), flush=True)
            results.append(row)

    with open("/tmp/sweep_moe_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
