"""Quiet-window FFN decomposition: where do the grouped-GEMM milliseconds go?

Waits for a quiet window on the shared axon chip (sanity matmul — the pool
is time-sliced and swings >30x; quiet_perf.py), then measures, at both the
single-sample (N=320 tokens -> 2560 slots) and batched bench (N=2560 ->
20480 slots) shapes:

- layout + both gathers, no matmuls,
- gate/up kernel only,
- down kernel only,
- full FFN at tile_m 64 / 128 / 256,

each as a fused fori_loop (per-dispatch RPC ~0.1-0.3 s) against an
empty-body baseline.  Writes JSON to the path given as argv[1]
(default /tmp/ffn_decompose.json).

Usage: PYTHONPATH=/root/.axon_site:. python tools/ffn_decompose.py [out]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

D, E, K, FM = 2048, 64, 8, 896
REPS = 10


def _time(call, reps=3):
    np.asarray(call())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(call())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def sanity_ms():
    x = jax.random.normal(jax.random.key(9), (2048, 2048), jnp.bfloat16)

    @jax.jit
    def f(a):
        def body(_, c):
            return (c @ x).astype(c.dtype)
        return jax.lax.fori_loop(0, 32, body, a)

    return min(_time(lambda: np.asarray(f(x)), 3) for _ in range(2)) / 32 * 1e3


def measure_shape(n_tokens):
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        counting_layout, grouped_expert_ffn_pallas, grouped_gateup_padded,
        grouped_matmul_padded)

    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (n_tokens, D), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(ks[1], (n_tokens, K)), -1)
    idx = jax.random.randint(ks[2], (n_tokens, K), 0, E)
    wg = jax.random.normal(ks[3], (E, D, FM), jnp.bfloat16) * 0.02
    wu = jax.random.normal(ks[4], (E, D, FM), jnp.bfloat16) * 0.02
    wd = jax.random.normal(ks[5], (E, FM, D), jnp.bfloat16) * 0.02

    def fused(body, out_cols):
        @jax.jit
        def run(x, *ops):
            def it(i, acc):
                xi = x + (acc[:, :1] * 0).astype(x.dtype)
                return acc + body(xi, *ops).astype(jnp.float32) * 1e-6
            acc = jnp.zeros((n_tokens, out_cols), jnp.float32)
            return jax.lax.fori_loop(0, REPS, it, acc).sum()
        return run

    out = {"n_tokens": n_tokens, "slots": n_tokens * K}
    t_base = _time(lambda: fused(lambda x: x, D)(x)) / REPS

    def net(body, out_cols, *ops):
        return _time(lambda: fused(body, out_cols)(x, *ops)) / REPS - t_base

    def layout_gathers(x, probs, idx):
        dest, tile_expert, _, m_pad = counting_layout(idx, E)
        src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
            jnp.arange(n_tokens * K, dtype=jnp.int32) // K)
        xs = jnp.take(x, src, axis=0)
        o = jnp.take(xs, dest, axis=0).astype(jnp.float32).reshape(
            n_tokens, K, D)
        return (o * probs[..., None]).sum(1).astype(x.dtype)

    out["baseline_ms"] = round(t_base * 1e3, 3)
    out["layout_gathers_ms"] = round(
        net(layout_gathers, D, probs, idx) * 1e3, 3)

    # Pre-built padded layout so the kernel-only rows exclude layout cost.
    dest, tile_expert, _, m_pad = counting_layout(idx, E)
    src = jnp.zeros((m_pad,), jnp.int32).at[dest].set(
        jnp.arange(n_tokens * K, dtype=jnp.int32) // K)
    xs_padded = jax.block_until_ready(jnp.take(x, src, axis=0))

    def gateup_only(xp, wg, wu):
        h = grouped_gateup_padded(xp, wg, wu, tile_expert)
        return h[: n_tokens, :D]  # shape-stable reduce target

    @jax.jit
    def run_gateup(xp, wg, wu):
        def it(i, acc):
            xi = xp + (acc[:, :1] * 0).astype(xp.dtype)
            h = grouped_gateup_padded(xi, wg, wu, tile_expert)
            return acc + h.astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(
            0, REPS, it, jnp.zeros((m_pad, FM), jnp.float32)).sum()

    @jax.jit
    def run_down(hp, wd):
        def it(i, acc):
            hi = hp + (acc[:, :FM] * 0).astype(hp.dtype)
            o = grouped_matmul_padded(hi, wd, tile_expert)
            return acc + o.astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(
            0, REPS, it, jnp.zeros((m_pad, D), jnp.float32)).sum()

    h_padded = jax.block_until_ready(
        jax.random.normal(ks[6], (m_pad, FM), jnp.bfloat16))
    out["gateup_kernel_ms"] = round(
        (_time(lambda: run_gateup(xs_padded, wg, wu)) / REPS - t_base) * 1e3, 3)
    out["down_kernel_ms"] = round(
        (_time(lambda: run_down(h_padded, wd)) / REPS - t_base) * 1e3, 3)

    for tm in (64, 128, 256):
        try:
            t = net(lambda x, p, i, a, b, c, _tm=tm:
                    grouped_expert_ffn_pallas(x, p, i, a, b, c, tile_m=_tm),
                    D, probs, idx, wg, wu, wd)
            out[f"ffn_tile_m{tm}_ms"] = round(t * 1e3, 3)
        except Exception as e:
            out[f"ffn_tile_m{tm}_ms"] = f"{type(e).__name__}: {str(e)[:120]}"

    flops = 6 * n_tokens * K * D * FM
    wbytes = 3 * E * D * FM * 2
    out["analytic"] = {
        "flops_g": round(flops / 1e9, 1),
        "weight_gib": round(wbytes / 2**30, 3),
        "compute_floor_ms": round(flops / 197e12 * 1e3, 3),
        "weight_dma_floor_ms": round(wbytes / 819e9 * 1e3, 3),
    }
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ffn_decompose.json"
    deadline = time.time() + 3 * 3600
    while time.time() < deadline:
        ms = sanity_ms()
        print(f"sanity {ms:.3f} ms", flush=True)
        if ms < 0.8:
            break
        time.sleep(120)

    result = {"sanity_ms": round(sanity_ms(), 3)}
    for n in (320, 2560):
        result[f"tokens_{n}"] = measure_shape(n)
        print(json.dumps(result[f"tokens_{n}"]), flush=True)
    result["sanity_ms_after"] = round(sanity_ms(), 3)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
