"""Headline benchmark: denoised tokens/sec/chip, apples-to-apples vs the
reference's own headline number.

Headline model: **full-size llada-moe-7b** (7.28B total / ~1.7B active with
embeddings, bf16 = 13.7 GiB — fits one v5e chip), measured at the exact
configuration the reference used for its 57.09 s/sample result: gen_length
256, steps 128, block_length 32, greedy low-confidence remasking
(Pre-Trained/bench_models/llada.py:576-587; model_performance.md:5 →
≈ 4.48 denoised tok/s on a GH200).

**The default invocation is budgeted** (VERDICT r3 item 1 — the r3 driver
run timed out, rc 124): it measures ONLY the batch-8 headline row, prints
the one JSON line, and exits.  A wall-clock budget (env
``CTDB_BENCH_BUDGET_S``, default 1200 s) gates every optional extra
(on-chip companion, single-sample latency) so the JSON line always lands
inside the budget; the quiet-pool wait is capped at 4 minutes and
contention robustness comes from the device-plane companion number instead
(on-chip durations stay valid under tenant time-slicing — CLAUDE.md).

``--full`` prints the same headline line first, then keeps measuring
(batch sweep 16/32, Fast-dLLM accel rows, per-row on-chip companions, and
the llada-2b dense north-star sub-benchmark) and writes the superset
artifact to ``--out`` (default BENCH_LOCAL_r05.json) — stdout stays
one-JSON-line clean either way.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

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

_DEADLINE = [float("inf")]


def remaining() -> float:
    """Seconds left in the run budget (headline must print before 0)."""
    return _DEADLINE[0] - time.time()


def log(msg):
    """Progress goes to stderr — stdout carries exactly one JSON line."""
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()


def wait_for_backend():
    """Initialize the jax backend outage-resiliently; return its name or
    None when the budget runs out first.

    VERDICT r4: BENCH_r04 died at an unguarded ``jax.default_backend()``
    ("Unable to initialize backend 'axon'") with 0 s of its 1200 s budget
    spent, and the sibling dryrun HUNG in the same call.  So: probe in a
    short-timeout subprocess (a hang can't eat the budget), retry while
    budget remains (the pool historically returns within minutes —
    CLAUDE.md), and only initialize in-process jax after a probe succeeds."""
    attempts = 0
    last = "never probed"
    while True:
        attempts += 1
        probe_timeout = max(30.0, min(590.0, remaining() - 60))
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                timeout=probe_timeout, env=dict(os.environ))
            if proc.returncode == 0 and proc.stdout.strip():
                name = proc.stdout.strip().splitlines()[-1]
                log(f"backend probe #{attempts}: '{name}' available")
                return jax.default_backend()  # safe: probe just succeeded
            last = (proc.stderr.strip().splitlines() or ["empty probe"])[-1][-200:]
        except subprocess.TimeoutExpired:
            last = f"probe hung >{probe_timeout:.0f}s"
        log(f"backend probe #{attempts} failed ({last}); "
            f"{remaining():.0f}s of budget left")
        if remaining() < 150:
            return None
        time.sleep(min(30.0, max(0.0, remaining() - 120)))


def emit_error_line(reason: str, extra=None):
    """Final-failure path: ONE parseable JSON line on stdout, rc 0.

    The driver records (rc, parsed-stdout); a traceback gives it nothing.
    Keep the standard metric keys so the artifact schema is stable."""
    result = {
        "metric": "denoised_tokens_per_sec_per_chip",
        "value": None,
        "unit": "tok/s/chip",
        "vs_baseline": None,
        "error": reason,
        "config": {
            "budget_s": (round(_DEADLINE[0] - _T0, 1)
                         if np.isfinite(_DEADLINE[0]) else None),
            "elapsed_s": round(time.time() - _T0, 1),
            **(extra or {}),
        },
    }
    print(json.dumps(result), flush=True)


def chip_peak_tflops() -> tuple[str, float]:
    kind = jax.devices()[0].device_kind
    for k in PEAK_BF16_TFLOPS:
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


def wait_for_quiet(max_wait_s: float = 240, threshold_ms: float = 0.8):
    """Block until the shared axon pool looks quiet, or the cap expires.

    The pooled chip is time-sliced across tenants and effective throughput
    swings >30x within minutes (CLAUDE.md).  The cap is deliberately short
    (VERDICT r3: a 25-min wait burned the whole driver budget); when the
    window stays contended we measure anyway and lean on the on-chip
    device-plane companion, which tenant time-slicing does not disturb.
    Returns the last sanity reading (recorded in the JSON so a contended
    artifact is at least *labeled* as such)."""
    deadline = time.time() + max_wait_s
    ms = _sanity_matmul_ms()
    while ms >= threshold_ms and time.time() < deadline:
        time.sleep(30)
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


def _mfu(fl, dt, n_chips, peak_tflops):
    v = fl / dt / (n_chips * peak_tflops * 1e12)
    return round(v, 4) if np.isfinite(v) else None


def load_headline_model():
    """Load the full-size MoE, falling back to the documented bench preset
    if the axon pool allocator rejects it.  Returns (cfg, params, fwd,
    fallback_note)."""
    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)

    note = None
    try:
        cfg = get_config("llada-moe-7b")
        params = init_params(cfg, jax.random.key(0))
        jax.block_until_ready(params)
    except Exception as e:  # ResourceExhausted from the pool allocator
        import gc
        gc.collect()
        # Axon reclamation lag: freed HBM only returns ~1-2 min after a
        # failure (CLAUDE.md) — sleep it off, but never past the budget.
        time.sleep(max(30.0, min(150.0, remaining() - 240)))
        note = (
            "full-size llada-moe-7b (7.28B, 13.7 GiB bf16) hit the axon "
            "pool allocator's two->3GiB-buffer cap "
            f"({type(e).__name__}); measured the llada-moe-bench1chip "
            "fallback: same architecture and active compute (top-8-of-"
            "64 + shared, D=2048, 1.49B active vs 1.4B published), "
            "5.72B total so total-expert HBM traffic is ~25% lighter "
            "than the real 7B — treat the number as an upper bound "
            "within ~25% on the bandwidth-bound component")
        cfg = get_config("llada-moe-bench1chip")
        params = init_params(cfg, jax.random.key(0))
        jax.block_until_ready(params)
    return cfg, params, make_forward_fn(cfg), note


def batch_row(cfg, params, fwd, *, steps, batch, reps, peak, n_chips,
              with_onchip):
    """One throughput row at a given batch size (+ on-chip companion)."""
    seq = PROMPT_LEN + GEN_LENGTH
    dt = measure(cfg, params, fwd, steps=steps, batch=batch, reps=reps)
    flops = batch * steps * cfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH)
    row = {
        "batch": batch,
        "tok_per_sec_per_chip": round(batch * GEN_LENGTH / dt / n_chips, 2),
        "seconds_per_batch": round(dt, 3),
        "seconds_per_sample_batched": round(dt / batch, 3),
        "mfu": _mfu(flops, dt, n_chips, peak),
    }
    if with_onchip:
        oc = onchip_seconds(cfg, params, fwd, steps=steps, batch=batch)
        if oc is not None:
            row["onchip_seconds_per_batch"] = oc
            row["onchip_tok_per_sec_per_chip"] = round(
                batch * GEN_LENGTH / oc / n_chips, 2)
            row["onchip_mfu"] = _mfu(flops, oc, n_chips, peak)
    return row


def headline_tpu(peak, n_chips):
    """The budgeted default path: ONE model, ONE batch size, headline dict.

    Returns (cfg, params, fwd, head) so --full can keep measuring on the
    same loaded model."""
    log("loading headline model (full-size llada-moe-7b)")
    cfg, params, fwd, note = load_headline_model()
    log(f"model ready: {cfg.name}; measuring batch 8 "
        f"(remaining budget {remaining():.0f}s)")
    row = batch_row(cfg, params, fwd, steps=128, batch=8, reps=2,
                    peak=peak, n_chips=n_chips,
                    with_onchip=remaining() > 90)
    head = {
        "model": cfg.name,
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "params_active_b": round(cfg.active_param_count() / 1e9, 2),
        "prompt_len": PROMPT_LEN, "gen_length": GEN_LENGTH,
        "steps": 128, "block_length": BLOCK_LENGTH,
        "dtype": cfg.dtype,
        **{k: v for k, v in row.items() if k != "mfu"},
        "mfu": row["mfu"],
    }
    if note:
        head["fallback_note"] = note
    # Single-sample latency costs one extra (batch-1) compile — only when
    # the budget clearly allows it.
    if remaining() > 360:
        log("measuring single-sample latency")
        try:
            dt1 = measure(cfg, params, fwd, steps=128, batch=1, reps=2)
            head["single_sample_latency_sec"] = round(dt1, 3)
            head["single_sample_tok_per_sec"] = round(GEN_LENGTH / dt1, 2)
            seq = PROMPT_LEN + GEN_LENGTH
            head["mfu_single"] = _mfu(
                128 * cfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH),
                dt1, n_chips, peak)
        except Exception as e:
            head["single_sample_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    return cfg, params, fwd, head


def full_extras(cfg, params, fwd, head, peak, n_chips):
    """--full only: batch sweep, accel rows, dense north-star sub-benchmark.
    Extends ``head`` in place — which is also result['config']['headline'],
    so the --full artifact write picks the extras up; may take tens of
    minutes."""
    rows = [dict(head_row_view(head))]
    for batch in (16, 32):
        log(f"sweep: batch {batch}")
        try:
            rows.append(batch_row(cfg, params, fwd, steps=128, batch=batch,
                                  reps=2, peak=peak, n_chips=n_chips,
                                  with_onchip=True))
        except Exception as e:
            rows.append({"batch": batch,
                         "error": f"{type(e).__name__}: {str(e)[:120]}"})
    head["batch_sweep"] = rows
    ok = [r for r in rows if "error" not in r]
    with_oc = [r for r in ok if "onchip_tok_per_sec_per_chip" in r]
    if with_oc:
        oc_best = max(with_oc, key=lambda r: r["onchip_tok_per_sec_per_chip"])
        head["onchip_best"] = {
            "batch": oc_best["batch"],
            "tok_per_sec_per_chip": oc_best["onchip_tok_per_sec_per_chip"],
            "note": "device-plane (contention-robust) best across the batch "
                    "sweep; the wall-clock headline is a lower bound when "
                    "pool_sanity_matmul_ms is contended",
        }
    # Opt-in dual-cache accelerated decode (models/block_cache.py,
    # Fast-dLLM-style): same model, same sampler config, approximate
    # numerics — reported as its own rows, never as the headline (the
    # headline stays exact-semantics for apples-to-apples).
    accel_rows = []
    if ok:
        from ct_diffusionmodelbench_tpu.models.block_cache import (
            make_cached_fns)
        cached = make_cached_fns(cfg)
        ab = max(r["batch"] for r in ok)
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
            log(f"accel row: {label}")
            try:
                dt_a = measure(cfg, params, fwd, steps=128, batch=ab,
                               reps=2, **mkw)
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
    if accel_rows:
        head["accel"] = accel_rows


def dense_subbench(peak, n_chips):
    """--full only: north-star shape (BASELINE.json: 256 steps) on the
    dense 2B.  Call only after the MoE params are released — both models
    resident would blow the 16 GB chip."""
    log("dense north-star sub-benchmark (llada-2b, 256 steps)")
    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)
    dcfg = get_config("llada-2b")
    dparams = init_params(dcfg, jax.random.key(0))
    jax.block_until_ready(dparams)
    dfwd = make_forward_fn(dcfg)
    drow = batch_row(dcfg, dparams, dfwd, steps=256, batch=8, reps=2,
                     peak=peak, n_chips=n_chips, with_onchip=True)
    dt1 = measure(dcfg, dparams, dfwd, steps=256, batch=1, reps=2)
    seq = PROMPT_LEN + GEN_LENGTH
    dense = {
        "model": dcfg.name,
        "params_total_b": round(dcfg.param_count() / 1e9, 2),
        "params_active_b": round(dcfg.active_param_count() / 1e9, 2),
        "prompt_len": PROMPT_LEN, "gen_length": GEN_LENGTH,
        "steps": 256, "block_length": BLOCK_LENGTH,
        "dtype": dcfg.dtype,
        **drow,
        "single_sample_latency_sec": round(dt1, 3),
        "single_sample_tok_per_sec": round(GEN_LENGTH / dt1, 2),
        "mfu_single": _mfu(
            256 * dcfg.forward_flops(seq, lm_head_width=BLOCK_LENGTH),
            dt1, n_chips, peak),
        "note": (
            "stand-in for the LLaDA-8B the north star names "
            "(BASELINE.json:2): 8B bf16 is ~16.3 GB > one v5e chip's 16 GB "
            "HBM, so a faithful same-architecture scale-down (22L, D=2048) "
            "runs the 256-step north-star shape single-chip; the full 8B "
            "executes under TP>=2 (tests/test_full_size_lowering.py)"),
    }
    del dparams
    return dense


def head_row_view(head):
    """The headline's own batch row, for the sweep table."""
    keys = ("batch", "tok_per_sec_per_chip", "seconds_per_batch",
            "seconds_per_sample_batched", "mfu", "onchip_seconds_per_batch",
            "onchip_tok_per_sec_per_chip", "onchip_mfu")
    return {k: head[k] for k in keys if k in head}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="after printing the headline JSON line, keep "
                         "measuring (batch sweep, accel rows, dense "
                         "north-star) and write the superset artifact "
                         "to --out")
    ap.add_argument("--out", default="BENCH_LOCAL_r05.json",
                    help="artifact path for --full extras")
    args = ap.parse_args()

    budget = float(os.environ.get("CTDB_BENCH_BUDGET_S", "1200"))
    _DEADLINE[0] = time.time() + budget

    backend = wait_for_backend()
    if backend is None:
        emit_error_line("backend_unavailable", {
            "note": "axon TPU backend never initialized within the budget "
                    "(probed in short-timeout subprocesses; pool down)"})
        return

    on_tpu = backend == "tpu"
    chip_kind, peak = chip_peak_tflops()
    n_chips = len(jax.devices())

    sanity_ms = None
    if on_tpu:
        log(f"budget {budget:.0f}s; waiting for a quiet pool window "
            "(cap 240s)")
        sanity_ms = round(wait_for_quiet(
            max_wait_s=min(240.0, max(0.0, remaining() - 600))), 3)
        log(f"pool sanity matmul: {sanity_ms} ms/iter "
            f"({'quiet' if sanity_ms < 0.8 else 'CONTENDED'})")
        cfg, params, fwd, head = headline_tpu(peak, n_chips)
    else:  # CPU smoke path for CI
        from ct_diffusionmodelbench_tpu.models import (
            get_config, init_params, make_forward_fn)
        cfg = get_config("llada-moe-tiny", dtype="float32")
        params = init_params(cfg, jax.random.key(0))
        fwd = make_forward_fn(cfg)
        row = batch_row(cfg, params, fwd, steps=16, batch=2, reps=1,
                        peak=peak, n_chips=n_chips, with_onchip=False)
        head = {"model": cfg.name, "dtype": cfg.dtype, **row}

    # Headline value: wall-clock tok/s/chip.  Under a contended pool window
    # wall-clock is unreliable in BOTH directions (CLAUDE.md: deflated up to
    # 34% OR inflated 3-60x) while device-plane durations stay valid — so
    # when the sanity matmul says contended and the on-chip companion
    # exists, the on-chip number IS the headline (labeled via value_source).
    value = head["tok_per_sec_per_chip"]
    value_source = "wall_clock"
    if (sanity_ms is not None and sanity_ms >= 0.8
            and "onchip_tok_per_sec_per_chip" in head):
        value = head["onchip_tok_per_sec_per_chip"]
        value_source = "onchip_device_plane"

    result = {
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
            "value_source": value_source,
            # ms/iter of a sanity 2048^3 matmul right before measuring:
            # ~0.1 quiet, multi-ms when other tenants share the chip.
            "pool_sanity_matmul_ms": sanity_ms,
            "peak_bf16_tflops_per_chip": peak if np.isfinite(peak) else None,
            "baseline": "LLaDA-MoE-7B-A1B 256 tok / 57.09 s on GH200 "
                        "(model_performance.md:5; BASELINE.md)",
            "budget_s": budget,
            "elapsed_s": round(time.time() - _T0, 1),
            "headline": head,
        },
    }
    print(json.dumps(result), flush=True)

    if args.full and on_tpu:
        log("--full: continuing with sweep/accel/dense extras")
        try:
            full_extras(cfg, params, fwd, head, peak, n_chips)
        except Exception as e:
            result["config"]["full_extras_error"] = (
                f"sweep/accel: {type(e).__name__}: {str(e)[:200]}")
        del params, fwd  # release the 13.7 GiB MoE before the dense init
        import gc
        gc.collect()
        try:
            dense = dense_subbench(peak, n_chips)
            result["config"]["sub_benchmarks"] = {
                "llada_2b_dense_north_star": dense}
        except Exception as e:
            result["config"]["dense_subbench_error"] = (
                f"{type(e).__name__}: {str(e)[:200]}")
        result["config"]["pool_sanity_matmul_ms_after"] = round(
            _sanity_matmul_ms(), 3)
        result["config"]["elapsed_s"] = round(time.time() - _T0, 1)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        log(f"wrote {args.out}")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — driver needs a parseable line
        traceback.print_exc()
        emit_error_line(f"{type(e).__name__}: {str(e)[:300]}")
