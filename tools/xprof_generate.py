"""Device-level profile of a full llada_generate call on a real model.

Loads the model (random init), warms up the fused sampler, traces the
second call, and aggregates per-op device durations from the xplane
(tools/xprof_ffn.py has the parser; works through the axon tunnel and is
robust to pool contention since on-chip durations exclude tenant queueing).

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/xprof_generate.py \
      [--model llada-moe-7b] [--batch 1] [--steps 8] [--top 30]
"""

import argparse
import sys
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llada-moe-7b")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--gen-length", type=int, default=256)
    ap.add_argument("--block-length", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax

    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    sys.path.insert(0, "tools")
    from xprof_ffn import collect_xspace, device_op_totals

    cfg = get_config(args.model)
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)
    hi = min(cfg.vocab_size - 10, 100_000, cfg.mask_token_id)
    prompt = jax.random.randint(jax.random.key(1),
                                (args.batch, args.prompt_len), 10, hi)
    kw = dict(steps=args.steps, gen_length=args.gen_length,
              block_length=args.block_length, temperature=0.0,
              mask_id=cfg.mask_token_id)
    np.asarray(llada_generate(fwd, params, prompt, **kw))  # compile+warm

    trace_dir = tempfile.mkdtemp(prefix="xprof_gen_")
    with jax.profiler.trace(trace_dir):
        np.asarray(llada_generate(fwd, params, prompt, **kw))

    totals = device_op_totals(collect_xspace(trace_dir))
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    n_steps = args.steps
    print(f"model={args.model} B={args.batch} steps={n_steps} "
          f"S={args.prompt_len + args.gen_length}")
    print(f"{'line':14s} {'total_ms':>9s} {'n':>5s} {'ms/step':>8s}  op")
    for (line, name), (ms, c) in rows[: args.top]:
        print(f"{line[:14]:14s} {ms:9.3f} {c:5d} {ms/n_steps:8.3f}  "
              f"{name[:100]}")
    xla_total = sum(ms for (line, _), (ms, _) in totals.items()
                    if line == "XLA Ops")
    print(f"\nXLA-Ops grand total {xla_total:.1f} ms "
          f"({xla_total/n_steps:.2f} ms/step incl. nesting double-count)")


if __name__ == "__main__":
    main()
