"""Flat (unrolled) on-chip attribution of one grouped FFN layer.

The fori_loop harness wraps the whole layer in a `while` op whose device
duration overlaps its children, muddying attribution.  Here the layer runs
UNROLLED (python loop inside one jit), so every layout / gather / kernel op
appears flat on the XLA Ops line and sums cleanly.

Usage: python tools/xprof_unrolled_r3.py [--batch 8] [--top 30]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xprof_ffn import collect_xspace, device_op_totals  # noqa: E402

E, K, D, FM = 64, 8, 2048, 896
SEQ = 320
REPS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    n = args.batch * SEQ
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (n, D), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (n, K)), -1)
    # distinct routing per rep so nothing CSEs away
    idxs = [jax.random.randint(jax.random.fold_in(ks[2], r), (n, K), 0, E)
            for r in range(REPS)]
    wg = jax.random.normal(ks[3], (E, D, FM), jnp.bfloat16) * 0.02
    wu = jax.random.normal(ks[4], (E, D, FM), jnp.bfloat16) * 0.02
    wd = jax.random.normal(ks[5], (E, FM, D), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, probs, idxs, wg, wu, wd):
        acc = jnp.zeros((n, D), jnp.float32)
        xi = x
        for r in range(REPS):
            o = grouped_expert_ffn_pallas(xi, probs, idxs[r], wg, wu, wd)
            acc = acc + o.astype(jnp.float32) * 1e-6
            xi = (x + acc * 0).astype(x.dtype)
        return acc.sum()

    np.asarray(run(x, probs, idxs, wg, wu, wd))
    trace_dir = tempfile.mkdtemp(prefix="xprof_unrolled_")
    import jax.profiler
    with jax.profiler.trace(trace_dir):
        np.asarray(run(x, probs, idxs, wg, wu, wd))

    totals = device_op_totals(collect_xspace(trace_dir))
    rows = sorted(((ms, c, line, name)
                   for (line, name), (ms, c) in totals.items()
                   if line == "XLA Ops"), reverse=True)
    grand = sum(ms for ms, _, _, _ in rows)
    print(f"batch={args.batch} n={n} slots={n*K}  "
          f"XLA-Ops total {grand:.3f} ms / {REPS} layers "
          f"= {grand/REPS:.3f} ms/layer\n")
    for ms, c, line, name in rows[: args.top]:
        print(f"{ms/REPS:8.3f} ms/layer  x{c:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
