"""MoE grouped-FFN cost breakdown at the headline bench shape.

Times fused 10x loops (single dispatch each — per-dispatch RPC on the axon
backend is ~0.1-0.3 s, so single-op timings are meaningless) of:

- the grouped Pallas expert FFN (counting-sort layout),
- lax.ragged_dot equivalent,
- the routing/layout machinery alone (counting_layout + both gathers),
- one full MoE transformer layer,
- one full attention sublayer at the same shape.

Usage: python tools/profile_moe.py [--tokens 2560] [--reps 10]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args):
    out = fn(*args)           # compile
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = time.time() - t0
    print(f"{name:40s} {dt*1000:9.2f} ms total  {dt*100:8.2f} ms/iter")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2560)  # batch 8 x seq 320
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--e", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--fm", type=int, default=896)
    args = ap.parse_args()

    from ct_diffusionmodelbench_tpu.models.moe import moe_block, router_probs
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        counting_layout, grouped_expert_ffn_pallas)

    n, d, e, k, fm, reps = (args.tokens, args.d, args.e, args.k, args.fm,
                            args.reps)
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (n, d), dt)
    wg = jax.random.normal(ks[1], (e, d, fm), dt) * 0.02
    wu = jax.random.normal(ks[2], (e, d, fm), dt) * 0.02
    wd = jax.random.normal(ks[3], (e, fm, d), dt) * 0.02
    wr = jax.random.normal(ks[4], (d, e), dt) * 0.02

    probs, idx, _ = jax.jit(lambda x: router_probs(x, wr, k, True))(x)
    probs, idx = jax.block_until_ready((probs, idx))

    def loop(body):
        # Weights travel as jit ARGUMENTS (closed-over arrays would be baked
        # into the program as constants — the axon remote-compile service
        # caps the request body well below the 660 MB expert stack).
        @jax.jit
        def run(x, *ops):
            def it(i, acc):
                xi = x + (acc * 0).astype(x.dtype)  # data dep, dtype preserved
                return acc + body(xi, *ops)[:n].astype(jnp.float32) * 1e-6
            acc = jax.lax.fori_loop(0, reps, it, jnp.zeros((n, d), jnp.float32))
            return acc.sum()  # scalar out: the result transfer over the
            #                   tunneled backend would otherwise dominate
        return run

    t_base = timed("empty body (dispatch+loop baseline)",
                   loop(lambda x: x), x) / reps

    t_grouped = timed("grouped pallas FFN (counting layout)",
                      loop(lambda x, *o: grouped_expert_ffn_pallas(x, *o)),
                      x, probs, idx, wg, wu, wd) / reps

    def ragged(x, probs, idx, wg, wu, wd):
        from ct_diffusionmodelbench_tpu.ops.grouped_gemm import (
            _sort_by_expert)
        dest, token_of, sizes = _sort_by_expert(idx, e)
        xs = jnp.take(x, token_of, axis=0)
        g = jax.lax.ragged_dot(xs, wg, sizes, preferred_element_type=jnp.float32)
        u = jax.lax.ragged_dot(xs, wu, sizes, preferred_element_type=jnp.float32)
        h = (jax.nn.silu(g) * u).astype(x.dtype)
        o = jax.lax.ragged_dot(h, wd, sizes, preferred_element_type=jnp.float32)
        out = jnp.take(o, dest, axis=0).astype(jnp.float32).reshape(n, k, d)
        return (out * probs[..., None]).sum(1).astype(x.dtype)

    t_ragged = timed("ragged_dot FFN (counting layout)", loop(ragged),
                     x, probs, idx, wg, wu, wd) / reps

    def layout_only(x, probs, idx):
        dest, tile_expert, _, m_pad = counting_layout(idx, e)
        src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
            jnp.arange(n * k, dtype=jnp.int32) // k)
        xs = jnp.take(x, src, axis=0)
        out = jnp.take(xs, dest, axis=0).astype(jnp.float32).reshape(n, k, d)
        return (out * probs[..., None]).sum(1).astype(x.dtype)

    t_layout = timed("layout+gathers only (no matmul)", loop(layout_only),
                     x, probs, idx) / reps

    def router_only(x, wr):
        p, i, _ = router_probs(x, wr, k, True)
        return x * p.sum()

    t_router = timed("router (softmax+topk) only", loop(router_only),
                     x, wr) / reps

    # Analytic floors at this shape.
    flops = 6 * n * k * d * fm
    wbytes = 3 * e * d * fm * 2
    print(f"\nanalytic: {flops/1e9:.1f} GFLOP/iter; expert weights "
          f"{wbytes/2**30:.2f} GiB/iter")
    print(f"v5e floors: compute {flops/197e12*1000:.2f} ms, "
          f"weight DMA {wbytes/819e9*1000:.2f} ms")
    print(f"grouped achieved: {flops/t_grouped/1e12:.1f} TFLOP/s "
          f"({flops/t_grouped/197e12*100:.0f}% MXU), "
          f"{wbytes/t_grouped/1e9:.0f} GB/s weight stream")


if __name__ == "__main__":
    main()
