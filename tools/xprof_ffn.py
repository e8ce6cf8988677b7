"""Device-level profile of the grouped MoE FFN via jax.profiler + xplane.

The axon tunnel DOES ship a real device plane (``/device:TPU:0`` with XLA
Ops and async-copy lines), and on-chip op durations are valid even when the
shared pool is contended (tenant time-slicing happens between programs), so
this is the contention-robust way to attribute per-op cost.

Runs the fused REPS-layer FFN loop at a given token count under
``jax.profiler.trace``, parses the xplane with tensorflow's proto, and
prints per-op total device time, sorted.

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/xprof_ffn.py [--tokens 2560]
"""

import argparse
import glob
import gzip  # noqa: F401  (xplane dirs also hold .json.gz; only .pb parsed)
import os
import tempfile

import numpy as np

REPS = 10


def collect_xspace(trace_dir):
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    assert pbs, f"no xplane.pb under {trace_dir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(pbs)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(xs):
    """{op_name: (total_ms, count)} summed over the TPU device plane."""
    out = {}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                ms = ev.duration_ps / 1e9
                t, c = out.get((line.name, name), (0.0, 0))
                out[(line.name, name)] = (t + ms, c + 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2560)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    n, d, e, k, fm = args.tokens, 2048, 64, 8, 896
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (n, d), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (n, k)), -1)
    idx = jax.random.randint(ks[2], (n, k), 0, e)
    wg = jax.random.normal(ks[3], (e, d, fm), jnp.bfloat16) * 0.02
    wu = jax.random.normal(ks[4], (e, d, fm), jnp.bfloat16) * 0.02
    wd = jax.random.normal(ks[5], (e, fm, d), jnp.bfloat16) * 0.02

    @jax.jit
    def run(x, probs, idx, wg, wu, wd):
        def it(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            o = grouped_expert_ffn_pallas(xi, probs, idx, wg, wu, wd)
            return acc + o.astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, REPS, it,
                                 jnp.zeros((n, d), jnp.float32)).sum()

    np.asarray(run(x, probs, idx, wg, wu, wd))  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="xprof_ffn_")
    with jax.profiler.trace(trace_dir):
        np.asarray(run(x, probs, idx, wg, wu, wd))

    xs = collect_xspace(trace_dir)
    totals = device_op_totals(xs)
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    print(f"{'line':14s} {'total_ms':>9s} {'n':>5s}  "
          f"{'ms/layer':>8s}  op")
    grand = 0.0
    for (line, name), (ms, c) in rows[: args.top]:
        grand += ms if line == "XLA Ops" else 0.0
        print(f"{line[:14]:14s} {ms:9.3f} {c:5d}  {ms/REPS:8.3f}  {name[:90]}")
    print(f"\nXLA-Ops total: {grand:.3f} ms over {REPS} layers "
          f"= {grand/REPS:.3f} ms/layer")


if __name__ == "__main__":
    main()
