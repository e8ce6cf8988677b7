"""On-chip attribution + variant sweep for the SFT train step (VERDICT r3
item 6: decompose where the non-MXU ~70% of a train step goes, the same way
the MoE serving layer was decomposed).

Wall-clock on the shared axon pool is contention-noisy; the device plane's
per-op durations stay valid (CLAUDE.md), so this profiles one jitted train
step (grad-accum microbatch scan + optimizer update) and decomposes it by
EVENT INTERVALS — the grad-accum scan is one `while` event whose children
overlap it, so flat per-op sums double-count; instead every leaf event is
classified by whether it falls inside the while span:

  scan_matmul   — dot/conv fusions inside the scan (fwd+bwd model math)
  scan_pallas   — Pallas custom-calls inside the scan (flash attention, ...)
  scan_other    — everything else inside the scan (elementwise, remat
                  recompute glue, loss, copies)
  epilogue      — everything after the scan (grad clip + Adam update)
  device_gap    — program span minus device-busy union (DMA stalls /
                  scheduling bubbles visible on-chip)

Sweeps remat variants and microbatch shapes for wall + on-chip totals.

Usage: python tools/xprof_train.py [--layers 6] [--accum 4] [--batch 1]
       [--seq 2048] [--variants full,dots,none] [--model llada-2b]
       [--opt-dtype float32]
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

from xprof_ffn import collect_xspace  # noqa: E402


def build_step(remat, layers, seq, accum, batch, model, opt_dtype,
               ce_chunk=256, attn="default"):
    import jax
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.models import get_config, init_params
    from ct_diffusionmodelbench_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step)

    cfg = get_config(model).replace(num_layers=layers)
    if attn != "default":
        # 'pallas' forces the flash fwd+bwd kernels in the train step
        # (make_train_step only downgrades 'auto' to reference, an explicit
        # impl rides through) — the reference-attention train default dates
        # from before the head-grouped/fused-rope kernel (round 4) and
        # materializes [H, S, S] f32 scores per layer (~86 ms/step at 6L
        # S=2048 in the round-5 ce512 trace).
        cfg = cfg.replace(attn_impl=attn)
    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=accum,
                       batch_size=batch, max_length=seq, remat=remat,
                       optimizer_state_dtype=opt_dtype,
                       ce_chunk=ce_chunk,
                       grad_accum_dtype=("bfloat16" if opt_dtype == "int8"
                                         else "float32"))
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    optimizer, _ = make_optimizer(tcfg, total_steps=100)
    opt_state = optimizer.init(params)
    step, _ = make_train_step(cfg, tcfg, optimizer)
    ids = jax.random.randint(jax.random.key(1), (accum, batch, seq), 10,
                             min(100_000, cfg.vocab_size - 10))
    plens = jnp.full((accum, batch), 64, jnp.int32)
    return cfg, step, params, opt_state, ids, plens


def device_events(xs):
    """[(start_ps, dur_ps, name)] for every XLA-Ops event on the TPU plane."""
    out = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            base = line.timestamp_ns * 1000
            for ev in line.events:
                out.append((base + ev.offset_ps, ev.duration_ps,
                            meta.get(ev.metadata_id, str(ev.metadata_id))))
    return out


def union_ms(intervals):
    if not intervals:
        return 0.0
    ivs = sorted(intervals)
    busy = 0
    cs, ce = ivs[0]
    for s, e in ivs[1:]:
        if s > ce:
            busy += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    busy += ce - cs
    return busy / 1e9


def decompose(events):
    """Interval-based buckets (ms).  The largest `while` is the grad-accum
    scan; leaves inside it are the model math, leaves outside are the
    optimizer epilogue; the whole-program union vs span gives the on-chip
    gap."""
    whiles = [(s, d, n) for s, d, n in events
              if n.lstrip("%").startswith("while")]
    scan_s, scan_d = (0, 0)
    if whiles:
        scan_s, scan_d, _ = max(whiles, key=lambda t: t[1])
    scan_e = scan_s + scan_d
    leaves = [(s, d, n) for s, d, n in events
              if not n.lstrip("%").startswith("while")]
    buckets = {"scan_matmul": 0.0, "scan_pallas": 0.0, "scan_other": 0.0,
               "epilogue": 0.0}
    top_scan, top_epi = {}, {}
    for s, d, n in leaves:
        mid = s + d // 2
        low = n.lower()
        inside = scan_s <= mid < scan_e
        if inside:
            if "custom-call" in low:
                buckets["scan_pallas"] += d / 1e9
            elif "fusion" in low and ("dot" in low or "convolution" in low):
                buckets["scan_matmul"] += d / 1e9
            else:
                buckets["scan_other"] += d / 1e9
            top_scan[n] = top_scan.get(n, 0.0) + d / 1e9
        else:
            buckets["epilogue"] += d / 1e9
            top_epi[n] = top_epi.get(n, 0.0) + d / 1e9
    all_iv = [(s, s + d) for s, d, _ in events]
    span = (max(e for _, e in all_iv) - min(s for s, _ in all_iv)) / 1e9
    busy = union_ms([(s, s + d) for s, d, _ in leaves] or all_iv)
    buckets["device_gap"] = max(0.0, span - busy)
    buckets["program_span"] = span
    tops = {
        "scan": sorted(((round(v, 3), k[:90]) for k, v in top_scan.items()),
                       reverse=True)[:8],
        "epilogue": sorted(((round(v, 3), k[:90]) for k, v in top_epi.items()),
                           reverse=True)[:8],
        # The scan_pallas bucket counts anything named custom-call, but the
        # lowered StableHLO of the train step contains NO custom_calls on
        # CPU — name the TPU-side ones so the bucket is attributable.
        "custom_calls": sorted(
            ((round(v, 3), k[:120]) for k, v in top_scan.items()
             if "custom-call" in k.lower()), reverse=True)[:8],
    }
    return buckets, tops


def run_variant(remat, layers, seq, accum, batch, model, opt_dtype, reps=3,
                ce_chunk=256, attn="default"):
    import jax

    cfg, step, params, opt_state, ids, plens = build_step(
        remat, layers, seq, accum, batch, model, opt_dtype, ce_chunk=ce_chunk,
        attn=attn)
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

    events = device_events(collect_xspace(trace_dir))
    buckets, tops = decompose(events)
    nparams = sum(x.size for x in jax.tree.leaves(params))
    flops = 6 * cfg.active_param_count() * accum * batch * seq
    from bench import chip_peak_tflops
    peak = chip_peak_tflops()[1] * 1e12
    span = buckets["program_span"] / 1e3  # s
    del params, opt_state
    return {
        "remat": str(remat), "layers": layers, "seq": seq,
        "accum": accum, "microbatch": batch, "model": model,
        "opt_dtype": opt_dtype, "ce_chunk": ce_chunk, "attn": attn,
        "params_total_b": round(nparams / 1e9, 3),
        "wall_s_per_step": round(wall, 3),
        "onchip_s_per_step": round(span, 3),
        "train_mfu_wall": round(flops / wall / peak, 4),
        "train_mfu_onchip": round(flops / span / peak, 4) if span else None,
        "buckets_ms": {k: round(v, 2) for k, v in buckets.items()},
        "top_ops": tops,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--model", type=str, default="llada-2b")
    ap.add_argument("--opt-dtype", type=str, default="float32")
    ap.add_argument("--variants", type=str, default="full,dots,none")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--attn", type=str, default="default",
                    help="default | reference | pallas — force the train "
                         "attention impl (see build_step)")
    ap.add_argument("--ce-chunks", type=str, default="256",
                    help="comma list; 0 = unchunked full-logits CE.  The "
                         "chunk-loop backward accumulates a FULL [D, V] "
                         "head cotangent PER CHUNK (lax.map over "
                         "jax.checkpoint'ed chunks), so vocab-grad HBM "
                         "traffic scales with seq/chunk — sweep to find "
                         "the memory/traffic knee")
    args = ap.parse_args()

    name_to_remat = {"full": True, "dots": "dots", "none": False}
    if "moe" in args.model:
        # Training wants the SCANNED layer path, not the stacked-weights
        # custom_vjp (full-stack cotangent per layer — bench_sweep.py
        # bench_sft_moe note).
        import os
        os.environ["CTDB_MOE_STACKED"] = "0"
    rows = []
    for v in args.variants.split(","):
        for cc in (int(x) for x in args.ce_chunks.split(",")):
            try:
                row = run_variant(name_to_remat[v], args.layers, args.seq,
                                  args.accum, args.batch, args.model,
                                  args.opt_dtype, reps=args.reps,
                                  ce_chunk=cc, attn=args.attn)
            except Exception as e:
                row = {"remat": v, "ce_chunk": cc,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(json.dumps(row), flush=True)
            rows.append(row)
    with open("/tmp/xprof_train.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
