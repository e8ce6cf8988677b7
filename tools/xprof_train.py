"""On-chip attribution + remat-variant sweep for the SFT train step.

Wall-clock on the shared axon pool is contention-noisy; the device plane's
per-op durations stay valid (CLAUDE.md), so this profiles one jitted train
step (grad-accum microbatch scan + optimizer update) and buckets the XLA-Ops
line into: matmul/conv fusions, Pallas custom calls, optimizer-ish
elementwise, and the rest — then sweeps remat = True / "dots" / False for
wall + on-chip totals.

Usage: python tools/xprof_train.py [--layers 6] [--accum 4] [--seq 2048]
       [--variants full,dots,none]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xprof_ffn import collect_xspace, device_op_totals  # noqa: E402


def build_step(remat, layers, seq, accum):
    import jax

    from ct_diffusionmodelbench_tpu.models import get_config, init_params
    from ct_diffusionmodelbench_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step)

    cfg = get_config("llada-2b").replace(num_layers=layers)
    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=accum, batch_size=1,
                       max_length=seq, remat=remat)
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    optimizer, _ = make_optimizer(tcfg, total_steps=100)
    opt_state = optimizer.init(params)
    step, _ = make_train_step(cfg, tcfg, optimizer)
    ids = jax.random.randint(jax.random.key(1), (accum, 1, seq), 10,
                             min(100_000, cfg.vocab_size - 10))
    import jax.numpy as jnp
    plens = jnp.full((accum, 1), 64, jnp.int32)
    return cfg, step, params, opt_state, ids, plens


def run_variant(remat, layers, seq, accum, reps=3):
    import jax

    cfg, step, params, opt_state, ids, plens = build_step(
        remat, layers, seq, accum)
    key = jax.random.key(2)
    params, opt_state, m = step(params, opt_state, ids, plens, key)
    np.asarray(m["loss"])  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        params, opt_state, m = step(params, opt_state, ids, plens, key)
        np.asarray(m["loss"])
        ts.append(time.time() - t0)
    wall = float(np.median(ts))

    trace_dir = tempfile.mkdtemp(prefix="xprof_train_")
    import jax.profiler
    with jax.profiler.trace(trace_dir):
        params, opt_state, m = step(params, opt_state, ids, plens, key)
        np.asarray(m["loss"])

    totals = device_op_totals(collect_xspace(trace_dir))
    buckets = {"pallas": 0.0, "matmul_fusion": 0.0, "loop_wrapper": 0.0,
               "other": 0.0}
    top = []
    for (line, name), (ms, _) in totals.items():
        if line != "XLA Ops":
            continue
        low = name.lower()
        if "custom-call" in low:
            buckets["pallas"] += ms
        elif low.startswith("%while"):
            buckets["loop_wrapper"] += ms
        elif "fusion" in low and ("dot" in low or "convolution" in low):
            buckets["matmul_fusion"] += ms
        else:
            buckets["other"] += ms
        top.append((round(ms, 3), name[:90]))
    onchip = sum(buckets.values())
    nparams = sum(x.size for x in jax.tree.leaves(params))
    flops = 6 * nparams * accum * seq
    del params, opt_state
    return {
        "remat": str(remat), "layers": layers, "seq": seq, "accum": accum,
        "wall_s_per_step": round(wall, 3),
        "onchip_ms": round(onchip, 2),
        "train_mfu_wall": round(flops / wall / 197e12, 4),
        "buckets_ms": {k: round(v, 2) for k, v in buckets.items()},
        "top_ops": sorted(top, reverse=True)[:10],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--variants", type=str, default="full,dots,none")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    name_to_remat = {"full": True, "dots": "dots", "none": False}
    rows = []
    for v in args.variants.split(","):
        try:
            row = run_variant(name_to_remat[v], args.layers, args.seq,
                              args.accum, reps=args.reps)
        except Exception as e:
            row = {"remat": v,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(row), flush=True)
        rows.append(row)
    with open("/tmp/xprof_train.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
