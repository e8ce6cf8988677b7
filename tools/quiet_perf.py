"""Wait for a quiet window on the shared axon TPU, then measure.

The pooled chip is time-sliced across tenants and effective throughput
swings >30x within minutes (CLAUDE.md), so perf numbers are only meaningful
when a sanity matmul confirms the chip is quiet.  This tool polls, then
runs (a) an interleaved grouped-GEMM backend A/B and (b) bench.py, writing
JSON next to its own stdout log.

Usage: python tools/quiet_perf.py [out_prefix]
"""
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sanity_ms():
    x = jax.random.normal(jax.random.key(9), (2048, 2048), jnp.bfloat16)

    @jax.jit
    def f(a):
        def body(_, c):
            return (c @ x).astype(c.dtype)
        return jax.lax.fori_loop(0, 32, body, a)

    np.asarray(f(x))
    best = min(
        _time_once(lambda: np.asarray(f(x))) for _ in range(3)) / 32 * 1e3
    return best


def _time_once(call):
    t0 = time.time()
    call()
    return time.time() - t0


def timeit(f, args, iters=8, reps=5):
    @jax.jit
    def run(a):
        def body(_, c):
            return (f(*c).astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, iters, body, a)[0]

    np.asarray(run(args))
    ts = []
    for _ in range(reps):
        ts.append(_time_once(lambda: np.asarray(run(args))))
    return float(np.median(ts)) / iters * 1e3


def grouped_ab():
    from ct_diffusionmodelbench_tpu.ops import grouped_gemm as gg

    N, K, E, D, Fm = 2048, 8, 64, 2048, 896
    x = jax.random.normal(jax.random.key(0), (N, D), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(jax.random.key(1), (N, K)), -1)
    idx = jax.random.randint(jax.random.key(2), (N, K), 0, E)
    wg = jax.random.normal(jax.random.key(3), (E, D, Fm), jnp.bfloat16) * 0.02
    wu = jax.random.normal(jax.random.key(4), (E, D, Fm), jnp.bfloat16) * 0.02
    wd = jax.random.normal(jax.random.key(5), (E, Fm, D), jnp.bfloat16) * 0.02
    args = (x, probs, idx, wg, wu, wd)
    fn = lambda xx, p, i, a, b, c: gg.grouped_expert_ffn(xx, p, i, a, b, c)
    flops = 2 * N * K * D * Fm * 3 / 1e9

    out = {"shape": f"N={N} K={K} E={E} D={D} Fm={Fm} bf16",
           "rounds": []}
    for _ in range(3):  # interleave so both sides share the window
        row = {}
        for backend in ("ragged", "pallas"):
            os.environ["CTDB_GROUPED_GEMM"] = backend
            t = timeit(fn, args)
            row[backend + "_ms"] = round(t, 3)
            row[backend + "_tflops"] = round(flops / t, 1)
        row["sanity_ms"] = round(sanity_ms(), 3)
        out["rounds"].append(row)
    os.environ.pop("CTDB_GROUPED_GEMM", None)
    return out


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quiet_perf"
    deadline = time.time() + 4 * 3600
    while time.time() < deadline:
        ms = sanity_ms()
        print(f"sanity {ms:.3f} ms", flush=True)
        if ms < 0.8:
            break
        time.sleep(180)
    result = {"sanity_ms_at_start": round(sanity_ms(), 3),
              "grouped_ab": grouped_ab()}
    with open(prefix + "_ab.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    # headline bench in a fresh process (needs the full 13.5 GiB free)
    proc = subprocess.run([sys.executable, "bench.py"],
                          capture_output=True, text=True, timeout=3600)
    with open(prefix + "_bench.json", "w") as f:
        f.write(proc.stdout)
    print(proc.stdout[-2000:], flush=True)


if __name__ == "__main__":
    main()
