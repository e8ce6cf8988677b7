"""Does scanning stacked expert weights cost an HBM->HBM slice copy?

models/transformer.py scans over stacked [L, ...] leaves; each iteration
hands a dynamically-sliced [E, D, Fm] expert stack to the grouped Pallas
kernel.  If XLA materializes that slice (pallas operands must be whole
arrays), every denoise step pays an extra read+write of the full expert
weights.  Measure: fused loop of the grouped FFN with (a) standalone weight
tensors vs (b) the same tensors dynamically sliced from a [2, E, D, Fm]
stack at a loop-carried index.

Usage: PYTHONPATH=/root/.axon_site:. python tools/probe_slice_copy.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
    grouped_expert_ffn_pallas)

N, D, E, K, FM, L, REPS = 2560, 2048, 64, 8, 896, 2, 10


def timed(name, fn, *args):
    np.asarray(fn(*args))
    t0 = time.time()
    np.asarray(fn(*args))
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1000:8.2f} ms/iter")
    return dt


def main():
    ks = jax.random.split(jax.random.key(0), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (N, D), dt)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (N, K)), -1)
    idx = jax.random.randint(ks[2], (N, K), 0, E)
    wg = jax.random.normal(ks[3], (L, E, D, FM), dt) * 0.02
    wu = jax.random.normal(ks[4], (L, E, D, FM), dt) * 0.02
    wd = jax.random.normal(ks[5], (L, E, FM, D), dt) * 0.02

    @jax.jit
    def direct(x, probs, idx, wg0, wu0, wd0):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            o = grouped_expert_ffn_pallas(xi, probs, idx, wg0, wu0, wd0)
            return acc + o.astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((N, D), jnp.float32)).sum()

    @jax.jit
    def sliced(x, probs, idx, wg, wu, wd):
        def body(i, acc):
            li = jnp.mod(i, L)
            g = jax.lax.dynamic_index_in_dim(wg, li, 0, keepdims=False)
            u = jax.lax.dynamic_index_in_dim(wu, li, 0, keepdims=False)
            d = jax.lax.dynamic_index_in_dim(wd, li, 0, keepdims=False)
            xi = x + (acc * 0).astype(x.dtype)
            o = grouped_expert_ffn_pallas(xi, probs, idx, g, u, d)
            return acc + o.astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((N, D), jnp.float32)).sum()

    t_direct = timed("weights passed directly", direct,
                     x, probs, idx, wg[0], wu[0], wd[0])
    t_sliced = timed("weights dynamic-sliced from [L, ...] stack", sliced,
                     x, probs, idx, wg, wu, wd)
    extra = (t_sliced - t_direct) * 1000
    wbytes = 3 * E * D * FM * 2
    print(f"slice overhead: {extra:.2f} ms/iter "
          f"(full-stack copy would be ~{wbytes/819e9*2*1000:.2f} ms)")


if __name__ == "__main__":
    main()
