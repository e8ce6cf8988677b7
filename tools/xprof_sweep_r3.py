"""Contention-robust MoE FFN sweep via on-chip xprof durations.

Wall-clock on the shared axon pool swings 3-60x with tenant load, but the
device plane's per-op durations stay valid (CLAUDE.md) — so this sweep
attributes ms/layer from XLA-Ops totals instead of time.time().

For each (batch, variant): profile a 10-iteration fused FFN loop at the
llada-moe-7b layer shape, sum the TPU device plane's XLA-Ops line, divide
by iterations.

Usage: python tools/xprof_sweep_r3.py [--batches 8,16,32]
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xprof_ffn import REPS, collect_xspace, device_op_totals  # noqa: E402

E, K, D, FM = 64, 8, 2048, 896
SEQ = 320


def profile_layer_ms(n, env):
    import jax
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        ks = jax.random.split(jax.random.key(0), 8)
        x = jax.random.normal(ks[0], (n, D), jnp.bfloat16)
        probs = jax.nn.softmax(jax.random.normal(ks[1], (n, K)), -1)
        idx = jax.random.randint(ks[2], (n, K), 0, E)
        wg = jax.random.normal(ks[3], (E, D, FM), jnp.bfloat16) * 0.02
        wu = jax.random.normal(ks[4], (E, D, FM), jnp.bfloat16) * 0.02
        wd = jax.random.normal(ks[5], (E, FM, D), jnp.bfloat16) * 0.02
        if os.environ.get("CTDB_SWEEP_INT8", "0") == "1":
            # int8 weight-only serving path: halves the expert weight stream
            # through the manual-DMA _q kernels (ops/quant.py).
            from ct_diffusionmodelbench_tpu.ops.quant import quantize_tensor
            wg, wu, wd = (quantize_tensor(w) for w in (wg, wu, wd))

        include_routing = os.environ.get("CTDB_SWEEP_ROUTING", "0") == "1"

        @jax.jit
        def run(x, probs, idx, wg, wu, wd):
            def it(i, acc):
                xi = x + (acc * 0).astype(x.dtype)
                # Routing depends only on idx: with a loop-invariant idx XLA
                # hoists counting_layout/expert_rank OUT of the loop and the
                # sweep never sees layout cost.  CTDB_SWEEP_ROUTING=1 rolls
                # idx by the (traced) iteration counter so the layout is
                # recomputed per iteration, as in the real per-layer call.
                idxi = jax.lax.rem(idx + i, E) if include_routing else idx
                o = grouped_expert_ffn_pallas(xi, probs, idxi, wg, wu, wd)
                return acc + o.astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, REPS, it,
                                     jnp.zeros((n, D), jnp.float32)).sum()

        np.asarray(run(x, probs, idx, wg, wu, wd))  # compile + warm
        trace_dir = tempfile.mkdtemp(prefix="xprof_sweep_")
        import jax.profiler
        with jax.profiler.trace(trace_dir):
            np.asarray(run(x, probs, idx, wg, wu, wd))

        totals = device_op_totals(collect_xspace(trace_dir))
        xla_ms = sum(ms for (line, _), (ms, _) in totals.items()
                     if line == "XLA Ops")
        top = sorted(((ms, name) for (line, name), (ms, c) in totals.items()
                      if line == "XLA Ops"), reverse=True)[:6]
        return xla_ms / REPS, [(round(ms / REPS, 3), name[:70])
                               for ms, name in top]
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16,32")
    ap.add_argument("--variants", type=str,
                    default="tm64,tm128v40,fused")
    ap.add_argument("--detail", action="store_true")
    args = ap.parse_args()

    variant_env = {
        "tm64": {"CTDB_GROUPED_TILE_M": "64"},
        "tm128v40": {"CTDB_GROUPED_TILE_M": "128",
                     "CTDB_GROUPED_VMEM_MB": "40"},
        "tm256v48": {"CTDB_GROUPED_TILE_M": "256",
                     "CTDB_GROUPED_VMEM_MB": "48"},
        "fused": {"CTDB_GROUPED_TILE_M": "64", "CTDB_GROUPED_FUSED": "1"},
        # round-3 manual-DMA pair x combine formulation grid
        "r2auto": {"CTDB_GROUPED_TILE_M": "64", "CTDB_GROUPED_MANUAL": "0",
                   "CTDB_GROUPED_COMBINE": "gather"},
        "man_gu_gather": {"CTDB_GROUPED_TILE_M": "64",
                          "CTDB_GROUPED_MANUAL": "gateup",
                          "CTDB_GROUPED_COMBINE": "gather"},
        "man_gu_kloop": {"CTDB_GROUPED_TILE_M": "64",
                         "CTDB_GROUPED_MANUAL": "gateup",
                         "CTDB_GROUPED_COMBINE": "kloop"},
        "man_both_kloop": {"CTDB_GROUPED_TILE_M": "64",
                           "CTDB_GROUPED_MANUAL": "1",
                           "CTDB_GROUPED_COMBINE": "kloop"},
        "auto_kloop": {"CTDB_GROUPED_TILE_M": "64",
                       "CTDB_GROUPED_MANUAL": "0",
                       "CTDB_GROUPED_COMBINE": "kloop"},
        "man_tm128_kloop": {"CTDB_GROUPED_TILE_M": "128",
                            "CTDB_GROUPED_MANUAL": "1",
                            "CTDB_GROUPED_COMBINE": "kloop"},
        "man_tm32_kloop": {"CTDB_GROUPED_TILE_M": "32",
                           "CTDB_GROUPED_MANUAL": "1",
                           "CTDB_GROUPED_COMBINE": "kloop"},
        "fused_kloop": {"CTDB_GROUPED_TILE_M": "64",
                        "CTDB_GROUPED_FUSED": "1",
                        "CTDB_GROUPED_COMBINE": "kloop"},
        # round-3 routing-rank formulation A/B (chunked = MXU triangular-
        # matmul prefix counts; cumsum = direct [M, E] one-hot scan)
        "kloop_rank_mm": {"CTDB_GROUPED_TILE_M": "64",
                          "CTDB_GROUPED_MANUAL": "1",
                          "CTDB_GROUPED_COMBINE": "kloop",
                          "CTDB_ROUTING_RANK": "chunked"},
        "kloop_rank_cumsum": {"CTDB_GROUPED_TILE_M": "64",
                              "CTDB_GROUPED_MANUAL": "1",
                              "CTDB_GROUPED_COMBINE": "kloop",
                              "CTDB_ROUTING_RANK": "cumsum"},
        "fused_rank_mm": {"CTDB_GROUPED_TILE_M": "64",
                          "CTDB_GROUPED_FUSED": "1",
                          "CTDB_GROUPED_COMBINE": "kloop",
                          "CTDB_ROUTING_RANK": "chunked"},
        # round-4 nsub A/B: layout tiles per grid step in the manual pair
        # kernels (run schedule + weight DMA stay at tile_m; only Mosaic's
        # per-grid-step x/h block orchestration amortizes — the suspected
        # ~0.5 us/tile steady-state cost, docs/STATUS.md).
        "man_nsub2": {"CTDB_GROUPED_TILE_M": "64",
                      "CTDB_GROUPED_MANUAL": "1",
                      "CTDB_GROUPED_COMBINE": "kloop",
                      "CTDB_GROUPED_NSUB": "2"},
        "man_nsub4": {"CTDB_GROUPED_TILE_M": "64",
                      "CTDB_GROUPED_MANUAL": "1",
                      "CTDB_GROUPED_COMBINE": "kloop",
                      "CTDB_GROUPED_NSUB": "4"},
        "man_nsub8": {"CTDB_GROUPED_TILE_M": "64",
                      "CTDB_GROUPED_MANUAL": "1",
                      "CTDB_GROUPED_COMBINE": "kloop",
                      "CTDB_GROUPED_NSUB": "8"},
        # round-5: nsub2 combined with the remaining knobs (wider tile_n
        # via a raised VMEM budget; tile_m 128)
        "nsub2_v48": {"CTDB_GROUPED_TILE_M": "64",
                      "CTDB_GROUPED_MANUAL": "1",
                      "CTDB_GROUPED_COMBINE": "kloop",
                      "CTDB_GROUPED_NSUB": "2",
                      "CTDB_GROUPED_VMEM_MB": "48"},
        "nsub2_tm128": {"CTDB_GROUPED_TILE_M": "128",
                        "CTDB_GROUPED_MANUAL": "1",
                        "CTDB_GROUPED_COMBINE": "kloop",
                        "CTDB_GROUPED_NSUB": "2"},
        "nsub2_tm32": {"CTDB_GROUPED_TILE_M": "32",
                       "CTDB_GROUPED_MANUAL": "1",
                       "CTDB_GROUPED_COMBINE": "kloop",
                       "CTDB_GROUPED_NSUB": "2"},
    }

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        n = b * SEQ
        m = n * K
        floor = 6 * m * D * FM / 197e12 * 1e3
        for vname in args.variants.split(","):
            try:
                ms, top = profile_layer_ms(n, variant_env[vname])
                row = {"batch": b, "variant": vname,
                       "onchip_ms_per_layer": round(ms, 3),
                       "compute_floor_ms": round(floor, 3),
                       "weight_dma_floor_ms": 0.86}
                if args.detail:
                    row["top_ops"] = top
            except Exception as e:
                row = {"batch": b, "variant": vname,
                       "error": f"{type(e).__name__}: {str(e)[:150]}"}
            print(json.dumps(row), flush=True)
            rows.append(row)
    with open("/tmp/xprof_sweep_r3.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
