"""Headline benchmark: denoised tokens/sec/chip, apples-to-apples vs the
reference's own headline number.

Headline model: **full-size llada-moe-7b** (7.35B total / ~1.7B active with
embeddings, bf16 = 13.7 GiB — fits one v5e chip), measured at the exact
configuration the reference used for its 57.09 s/sample result: gen_length
256, steps 128, block_length 32, greedy low-confidence remasking
(Pre-Trained/bench_models/llada.py:576-587; model_performance.md:5 →
≈ 4.48 denoised tok/s on a GH200).

Also reported (config.sub_benchmarks): the llada-2b dense model at the
BASELINE.json north-star shape (256 steps), and per-run MFU =
analytic matmul FLOPs (ModelConfig.forward_flops, block-sliced LM head)
/ wall-clock / chip peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import jax
import numpy as np

REFERENCE_DENOISED_TOK_PER_SEC = 256.0 / 57.09  # BASELINE.md, LLaDA-MoE on GH200

PROMPT_LEN = 64
GEN_LENGTH = 256
BLOCK_LENGTH = 32

# bf16 peak TFLOP/s per chip by device_kind (public TPU specs).
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # Trillium
    "TPU v6e": 918.0,
}


def chip_peak_tflops() -> tuple[str, float]:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16_TFLOPS.items():
        if kind.startswith(k):
            # prefer the longest (most specific) prefix match
            best = max((kk for kk in PEAK_BF16_TFLOPS if kind.startswith(kk)),
                       key=len)
            return kind, PEAK_BF16_TFLOPS[best]
    return kind, float("nan")  # mfu reported as null then


def _sanity_matmul_ms() -> float:
    """ms/iter of a 2048³ bf16 matmul chain — ~0.1 ms on a quiet v5e."""
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.key(9), (2048, 2048), jnp.bfloat16)

    @jax.jit
    def f(a):
        def body(_, c):
            return (c @ x).astype(c.dtype)
        return jax.lax.fori_loop(0, 32, body, a)

    np.asarray(f(x))
    best = min(_once(lambda: np.asarray(f(x))) for _ in range(3))
    return best / 32 * 1e3


def _once(call):
    t0 = time.time()
    call()
    return time.time() - t0


def wait_for_quiet(max_wait_s: float = 1500, threshold_ms: float = 0.8):
    """Block until the shared axon pool looks quiet, or the budget expires.

    The pooled chip is time-sliced across tenants and effective throughput
    swings >30x within minutes (CLAUDE.md) — an unlucky window once
    recorded a 9.17 s single-sample latency that re-measures at 2.66 s on
    a quiet chip.  Returns the last sanity reading (recorded in the JSON
    so a contended artifact is at least *labeled* as such)."""
    deadline = time.time() + max_wait_s
    ms = _sanity_matmul_ms()
    while ms >= threshold_ms and time.time() < deadline:
        time.sleep(60)
        ms = _sanity_matmul_ms()
    return ms


def measure(cfg, params, fwd, *, steps, batch, reps, seed=1, cached_fns=None,
            parallel_threshold=None):
    """Median seconds per batched sampler call (greedy LLaDA config).

    ``cached_fns`` / ``parallel_threshold``: measure the opt-in Fast-dLLM
    accelerations (models/block_cache.py; sampling/llada.py) instead of the
    exact sampler."""
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    kw = dict(steps=steps, gen_length=GEN_LENGTH, block_length=BLOCK_LENGTH,
              temperature=0.0, mask_id=cfg.mask_token_id,
              block_cache=cached_fns is not None, cached_fns=cached_fns,
              parallel_threshold=parallel_threshold)
    hi = min(cfg.vocab_size - 10, 100_000, cfg.mask_token_id)  # never sample
    prompt = jax.random.randint(jax.random.key(seed),            # the mask id
                                (batch, PROMPT_LEN), 10, hi)
    # NOTE: timing must force a device→host copy — block_until_ready does
    # not actually block on the tunneled axon backend; np.asarray does.
    np.asarray(llada_generate(fwd, params, prompt, **kw))  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = np.asarray(llada_generate(fwd, params, prompt, **kw))
        times.append(time.time() - t0)
    # Sanity: the loop denoised (random weights can legitimately *argmax to
    # the mask id* on a tiny vocab — the reference sampler allows that too —
    # so require near-complete rather than perfect unmasking).
    assert (out[:, PROMPT_LEN:] == cfg.mask_token_id).mean() < 0.05
    return float(np.median(times))


def onchip_seconds(cfg, params, fwd, *, steps, batch, seed=1):
    """Device-plane duration of ONE batched sampler call — contention-robust
    (tenant time-slicing happens between programs; on-chip op durations stay
    valid — CLAUDE.md).  The whole sampler is one fori_loop program, so its
    outermost `while` op's total IS the program's device time.  Returns None
    off-TPU or if the profiler plane is unavailable."""
    import tempfile

    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    try:
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        from xprof_ffn import collect_xspace, device_op_totals
    except Exception:
        return None
    kw = dict(steps=steps, gen_length=GEN_LENGTH, block_length=BLOCK_LENGTH,
              temperature=0.0, mask_id=cfg.mask_token_id)
    hi = min(cfg.vocab_size - 10, 100_000, cfg.mask_token_id)
    prompt = jax.random.randint(jax.random.key(seed), (batch, PROMPT_LEN),
                                10, hi)
    try:
        np.asarray(llada_generate(fwd, params, prompt, **kw))  # warm
        d = tempfile.mkdtemp(prefix="bench_onchip_")
        with jax.profiler.trace(d):
            np.asarray(llada_generate(fwd, params, prompt, **kw))
        totals = device_op_totals(collect_xspace(d))
        whiles = [ms for (line, name), (ms, _) in totals.items()
                  if line == "XLA Ops" and name.lstrip("%").startswith("while")]
        sec = max(whiles) / 1e3 if whiles else 0.0
        return round(sec, 4) if sec > 1e-4 else None
    except Exception:
        return None


def bench_model_batches(name, *, steps, batches, reps, peak_tflops,
                        dtype=None):
    """One model load, one single-sample latency, a throughput row per
    batch size.  Returns (cfg, best_row, all_rows) — best = max tok/s."""
    from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn

    cfg = get_config(name) if dtype is None else get_config(name, dtype=dtype)
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)

    n_chips = len(jax.devices())
    seq = PROMPT_LEN + GEN_LENGTH
    dt_single = measure(cfg, params, fwd, steps=steps, batch=1, reps=2)

    def _mfu(fl, dt):
        v = fl / dt / (n_chips * peak_tflops * 1e12)
        return round(v, 4) if np.isfinite(v) else None

    rows = []
    for batch in batches:
        try:
            dt = measure(cfg, params, fwd, steps=steps, batch=batch, reps=reps)
        except Exception as e:  # one batch OOMing shouldn't kill the sweep
            rows.append({"batch": batch,
                         "error": f"{type(e).__name__}: {str(e)[:120]}"})
            continue
        flops = batch * steps * cfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH)
        rows.append({
            "batch": batch,
            "tok_per_sec_per_chip": round(batch * GEN_LENGTH / dt / n_chips, 2),
            "seconds_per_batch": round(dt, 3),
            "seconds_per_sample_batched": round(dt / batch, 3),
            "mfu": _mfu(flops, dt),
        })
    # Opt-in dual-cache accelerated decode (models/block_cache.py,
    # Fast-dLLM-style): same model, same sampler config, approximate
    # numerics — reported as its own row, never as the headline (the
    # headline stays exact-semantics for apples-to-apples).
    accel_rows = []
    ok_batches = [r["batch"] for r in rows if "error" not in r]
    if ok_batches:
        from ct_diffusionmodelbench_tpu.models.block_cache import (
            make_cached_fns)
        cached = make_cached_fns(cfg)
        ab = max(ok_batches)
        for label, mkw in (
                ("block-cache (--accel block-cache)",
                 dict(cached_fns=cached)),
                # NOTE: on random-init weights almost no confidence clears
                # 0.9, so threshold decoding degrades to its worst case
                # (one forced unmask per step = block_length steps/block,
                # MORE than the 57.09s-config's steps_per_block=16) — this
                # row is a LOWER bound; real checkpoints unmask many
                # tokens/step (Fast-dLLM reports ~2x fewer steps).
                ("block-cache + parallel-threshold 0.9, worst-case "
                 "(--accel block-cache --parallel-threshold 0.9)",
                 dict(cached_fns=cached, parallel_threshold=0.9))):
            try:
                dt_a = measure(cfg, params, fwd, steps=steps, batch=ab,
                               reps=reps, **mkw)
                accel_rows.append({
                    "mode": label,
                    "batch": ab,
                    "tok_per_sec_per_chip": round(
                        ab * GEN_LENGTH / dt_a / n_chips, 2),
                    "seconds_per_batch": round(dt_a, 3),
                    "seconds_per_sample_batched": round(dt_a / ab, 3),
                })
            except Exception as e:
                accel_rows.append(
                    {"mode": label,
                     "error": f"{type(e).__name__}: {str(e)[:120]}"})
    ok = [r for r in rows if "error" not in r]
    if not ok:
        del params
        # Every batch OOMed/errored: surface a model-level failure so the
        # caller's fallback logic runs instead of an opaque max() crash.
        raise RuntimeError(f"all batch measurements failed: {rows}")
    # Contention-robust companion numbers: device-plane duration of each
    # batch's sampler program (valid even when the pool is time-sliced and
    # wall-clock is a lower bound — measured: a contended window deflated
    # the batch-8 wall row 34% while its on-chip time was unchanged).
    for r in ok:
        oc = onchip_seconds(cfg, params, fwd, steps=steps, batch=r["batch"])
        if oc is not None:
            r["onchip_seconds_per_batch"] = oc
            r["onchip_tok_per_sec_per_chip"] = round(
                r["batch"] * GEN_LENGTH / oc / n_chips, 2)
    best = max(ok, key=lambda r: r["tok_per_sec_per_chip"])
    onchip = best.get("onchip_seconds_per_batch")
    del params
    head = {
        "model": cfg.name,
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "params_active_b": round(cfg.active_param_count() / 1e9, 2),
        "prompt_len": PROMPT_LEN, "gen_length": GEN_LENGTH,
        "steps": steps, "block_length": BLOCK_LENGTH,
        "dtype": cfg.dtype, "batch": best["batch"],
        "tok_per_sec_per_chip": best["tok_per_sec_per_chip"],
        "seconds_per_batch": best["seconds_per_batch"],
        "seconds_per_sample_batched": best["seconds_per_sample_batched"],
        "single_sample_latency_sec": round(dt_single, 3),
        "single_sample_tok_per_sec": round(GEN_LENGTH / dt_single, 2),
        "mfu": best["mfu"],
        "mfu_single": _mfu(
            steps * cfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH),
            dt_single),
    }
    if onchip is not None:
        head["onchip_seconds_per_batch"] = onchip
        head["onchip_tok_per_sec_per_chip"] = round(
            best["batch"] * GEN_LENGTH / onchip / n_chips, 2)
    with_oc = [r for r in ok if "onchip_tok_per_sec_per_chip" in r]
    if with_oc:
        oc_best = max(with_oc, key=lambda r: r["onchip_tok_per_sec_per_chip"])
        head["onchip_best"] = {
            "batch": oc_best["batch"],
            "tok_per_sec_per_chip": oc_best["onchip_tok_per_sec_per_chip"],
            "note": "device-plane (contention-robust) best across the batch "
                    "sweep; the wall-clock headline above is a lower bound "
                    "when pool_sanity_matmul_ms is contended",
        }
    if accel_rows:
        # Fast-dLLM accelerated-mode rows (approximate numerics, opt-in):
        # reported alongside, never as the headline.
        head["accel"] = accel_rows
    return cfg, head, rows


def bench_model(name, *, steps, batch, reps, peak_tflops, dtype=None):
    from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn

    cfg = get_config(name) if dtype is None else get_config(name, dtype=dtype)
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)

    dt_single = measure(cfg, params, fwd, steps=steps, batch=1, reps=max(reps, 2))
    dt_batched = measure(cfg, params, fwd, steps=steps, batch=batch, reps=reps)

    n_chips = len(jax.devices())
    tok_s_chip = batch * GEN_LENGTH / dt_batched / n_chips
    seq = PROMPT_LEN + GEN_LENGTH
    flops_per_call = batch * steps * cfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH)

    def _mfu(fl, dt):
        v = fl / dt / (n_chips * peak_tflops * 1e12)
        return round(v, 4) if np.isfinite(v) else None

    oc = onchip_seconds(cfg, params, fwd, steps=steps, batch=batch)
    del params
    row = {
        "model": cfg.name,
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "params_active_b": round(cfg.active_param_count() / 1e9, 2),
        "prompt_len": PROMPT_LEN, "gen_length": GEN_LENGTH,
        "steps": steps, "block_length": BLOCK_LENGTH,
        "dtype": cfg.dtype, "batch": batch,
        "tok_per_sec_per_chip": round(tok_s_chip, 2),
        "seconds_per_batch": round(dt_batched, 3),
        "seconds_per_sample_batched": round(dt_batched / batch, 3),
        "single_sample_latency_sec": round(dt_single, 3),
        "single_sample_tok_per_sec": round(GEN_LENGTH / dt_single, 2),
        "mfu": _mfu(flops_per_call, dt_batched),
        "mfu_single": _mfu(flops_per_call / batch, dt_single),
    }
    if oc is not None:
        row["onchip_seconds_per_batch"] = oc
        row["onchip_tok_per_sec_per_chip"] = round(
            batch * GEN_LENGTH / oc / n_chips, 2)
        row["onchip_mfu"] = _mfu(flops_per_call, oc)
    return cfg, row


def main():
    on_tpu = jax.default_backend() == "tpu"
    chip_kind, peak = chip_peak_tflops()
    n_chips = len(jax.devices())

    sanity_ms = sanity_after_ms = None
    if on_tpu:
        sanity_ms = round(wait_for_quiet(), 3)
        # Headline: the reference's own model class and sampler config.
        # Try the full-size 7.27B MoE first; the shared axon pool's
        # allocator caps >3 GiB buffers at two, so its three ~3.9 GiB
        # expert stacks usually cannot all be resident on this tunneled
        # chip even though 13.5 GiB < HBM — fall back to the documented
        # bench preset (identical active compute, ~25% lighter total-expert
        # HBM traffic) and say so in the JSON.
        moe_note = None
        try:
            # Throughput sweeps with batch: the ~0.86 ms/layer expert-weight
            # stream is batch-invariant, so larger batches amortize it and
            # raise tok/s/chip until compute-bound.  Measure 8/16/32 in one
            # model load, headline the best, and keep every row.
            cfg, moe, moe_sweep = bench_model_batches(
                "llada-moe-7b", steps=128, batches=(8, 16, 32),
                reps=2, peak_tflops=peak)
        except Exception as e:  # ResourceExhausted from the pool allocator
            import gc
            gc.collect()
            time.sleep(150)  # axon reclamation lag: freed HBM returns ~2 min
            moe_note = (
                "full-size llada-moe-7b (7.27B, 13.5 GiB bf16) hit the axon "
                "pool allocator's two->3GiB-buffer cap "
                f"({type(e).__name__}); measured the llada-moe-bench1chip "
                "fallback: same architecture and active compute (top-8-of-"
                "64 + shared, D=2048, 1.49B active vs 1.4B published), "
                "5.72B total so total-expert HBM traffic is ~25% lighter "
                "than the real 7B — treat the number as an upper bound "
                "within ~25% on the bandwidth-bound component")
            cfg, moe, moe_sweep = bench_model_batches(
                "llada-moe-bench1chip", steps=128, batches=(8, 16, 32),
                reps=2, peak_tflops=peak)
        if moe_note:
            moe["fallback_note"] = moe_note
        moe["batch_sweep"] = moe_sweep
        # North-star shape (BASELINE.json: 256 steps) on the dense 2B.
        _, dense = bench_model("llada-2b", steps=256, batch=8, reps=2,
                               peak_tflops=peak)
        sanity_after_ms = round(_sanity_matmul_ms(), 3)
        dense["note"] = (
            "stand-in for the LLaDA-8B the north star names "
            "(BASELINE.json:2): 8B bf16 is ~16.3 GB > one v5e chip's 16 GB "
            "HBM, so a faithful same-architecture scale-down (22L, D=2048) "
            "runs the 256-step north-star shape single-chip; the full 8B "
            "executes under TP>=2 (tests/test_full_size_lowering.py)")
    else:  # CPU smoke path for CI
        cfg, moe = bench_model("llada-moe-tiny", steps=16, batch=2, reps=1,
                               peak_tflops=peak, dtype="float32")
        _, dense = bench_model("llada-tiny", steps=16, batch=2, reps=1,
                               peak_tflops=peak, dtype="float32")

    value = moe["tok_per_sec_per_chip"]
    print(json.dumps({
        "metric": "denoised_tokens_per_sec_per_chip",
        "value": value,
        "unit": "tok/s/chip",
        # Apples-to-apples: full-size LLaDA-MoE at gen 256 / steps 128 /
        # block 32 / greedy — the exact config behind the reference's
        # 57.09 s/sample (≈4.48 tok/s) GH200 measurement.
        "vs_baseline": round(value / REFERENCE_DENOISED_TOK_PER_SEC, 2),
        "config": {
            "backend": jax.default_backend(),
            "chips": n_chips,
            "chip_kind": chip_kind,
            # ms/iter of a sanity 2048^3 matmul right before and right
            # after measuring: ~0.1 quiet, multi-ms when other tenants
            # share the chip (the numbers below are then lower bounds on
            # true throughput).
            "pool_sanity_matmul_ms": sanity_ms,
            "pool_sanity_matmul_ms_after": sanity_after_ms,
            "peak_bf16_tflops_per_chip": peak if np.isfinite(peak) else None,
            "baseline": "LLaDA-MoE-7B-A1B 256 tok / 57.09 s on GH200 "
                        "(model_performance.md:5; BASELINE.md)",
            "headline": moe,
            "sub_benchmarks": {"llada_2b_dense_north_star": dense},
        },
    }))


if __name__ == "__main__":
    main()
