"""Spot-measure the Fast-dLLM accel modes vs the exact sampler, back to back.

Pool contention swings absolute wall-clock 3-60x (CLAUDE.md), but ratios of
back-to-back runs in one window stay meaningful.  Prints one JSON line per
mode: exact / block-cache / block-cache+threshold at the headline MoE bench
shape (or a model given by --model).

Usage: python tools/accel_spot.py [--model llada-moe-7b] [--batch 8]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn  # noqa: E402
from ct_diffusionmodelbench_tpu.models.block_cache import make_cached_fns
from ct_diffusionmodelbench_tpu.sampling import llada_generate

PROMPT_LEN, GEN, BL, STEPS = 64, 256, 32, 128


def sanity_ms():
    import jax.numpy as jnp
    x = jax.random.normal(jax.random.key(9), (2048, 2048), jnp.bfloat16)

    @jax.jit
    def f(a):
        return jax.lax.fori_loop(0, 32, lambda _, c: (c @ x).astype(c.dtype), a)

    np.asarray(f(x))
    t0 = time.time(); np.asarray(f(x))
    return (time.time() - t0) / 32 * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llada-moe-7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--quant", default="none", choices=["none", "int8", "both"],
                    help="int8: run every mode on int8 weights; both: bf16 "
                         "exact first, then the int8 modes (one contention "
                         "window -> fair bf16-vs-int8 ratio)")
    args = ap.parse_args()

    cfg = get_config(args.model)
    fwd = make_forward_fn(cfg)
    cached = make_cached_fns(cfg)

    hi = min(cfg.vocab_size - 10, 100_000, cfg.mask_token_id)
    prompt = jax.random.randint(jax.random.key(1), (args.batch, PROMPT_LEN),
                                10, hi)

    def make_params(quant: bool):
        if quant:
            from ct_diffusionmodelbench_tpu.ops.quant import (
                quantized_leaf_transform)
            p = init_params(cfg, jax.random.key(0),
                            leaf_transform=quantized_leaf_transform)
        else:
            p = init_params(cfg, jax.random.key(0))
        jax.block_until_ready(p)
        return p

    def run(params, **kw):
        return np.asarray(llada_generate(
            fwd, params, prompt, steps=STEPS, gen_length=GEN,
            block_length=BL, temperature=0.0, mask_id=cfg.mask_token_id,
            **kw))

    modes = [
        ("exact", {}),
        ("block-cache", dict(block_cache=True, cached_fns=cached)),
        ("block-cache+thr0.9", dict(block_cache=True, cached_fns=cached,
                                    parallel_threshold=0.9)),
    ]
    plans = []  # (label suffix, quantized, modes)
    if args.quant == "none":
        plans = [("", False, modes)]
    elif args.quant == "int8":
        plans = [("-int8", True, modes)]
    else:
        plans = [("", False, modes[:1]), ("-int8", True, modes)]

    print(json.dumps({"sanity_ms_before": round(sanity_ms(), 3)}))
    results = {}
    for suffix, quant, mode_list in plans:
        params = make_params(quant)
        for name, kw in mode_list:
            out = run(params, **kw)  # compile+warm
            assert (out[:, PROMPT_LEN:] == cfg.mask_token_id).mean() < 0.05, name
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                run(params, **kw)
                ts.append(time.time() - t0)
            dt = float(np.median(ts))
            results[name + suffix] = dt
            base = results.get("exact", dt)
            print(json.dumps({
                "mode": name + suffix, "batch": args.batch,
                "seconds_per_batch": round(dt, 3),
                "tok_per_sec_per_chip": round(args.batch * GEN / dt, 2),
                "speedup_vs_exact": round(base / dt, 2),
            }))
        del params  # free before the next param set (within-process reuse)
    print(json.dumps({"sanity_ms_after": round(sanity_ms(), 3)}))


if __name__ == "__main__":
    main()
