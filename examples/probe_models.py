"""Per-family quick probes (H11): run N small prompts through each model
family and save the generations as .lean files — the TPU-native equivalent of
Pre-Trained/chat_with_models/{dream-diffusion,apple-diffucoder,tessa-llama,
lladou}.py (each a 3-sample sanity probe with saved outputs,
lladou.py saves `.lean` files).

Offline: random-init presets; pass --model-dir to probe a real checkpoint.

    python examples/probe_models.py --out probe_results
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner
from ct_diffusionmodelbench_tpu.sampling.simple import ar_generate
from ct_diffusionmodelbench_tpu.utils.logging import log

PROMPTS = [
    "Prove that for any natural number n, n + 0 = n.",
    "Show that addition of natural numbers is commutative.",
    "Prove that the square of an even number is even.",
]

FAMILIES = [
    ("llada", "llada-tiny"),
    ("llada-moe", "llada-moe-tiny"),
    ("dream", "dream-tiny"),
    ("diffucoder", "dream-tiny"),
]


def main(argv=None):
    p = argparse.ArgumentParser(description="Per-family model probes")
    p.add_argument("--model-dir", default=None,
                   help="Probe a real checkpoint instead of tiny presets")
    p.add_argument("--out", default="probe_results")
    p.add_argument("--gen-length", type=int, default=32)
    p.add_argument("--steps", type=int, default=16)
    args = p.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    targets = ([("checkpoint", None)] if args.model_dir else FAMILIES)
    for family, preset in targets:
        runner = (ModelRunner.from_dir(args.model_dir) if args.model_dir
                  else ModelRunner.random_init(preset, family=family))
        log(f"--- {family} ({runner.cfg.name}) ---")
        for i, prompt in enumerate(PROMPTS):
            t0 = time.time()
            res = runner.generate(
                prompt, gen_length=args.gen_length, steps=args.steps,
                block_length=min(16, args.gen_length),
                temperature=0.0 if family.startswith("llada") else 0.4,
                top_p=0.95)
            path = out / f"{family}_probe_{i}.lean"
            path.write_text(res.text)
            log(f"[{family} #{i}] {time.time() - t0:.2f}s -> {path}")

        # AR-interface probe (LLaDOU-style) on the causal config
        if not args.model_dir and family == "llada":
            import jax
            import numpy as np
            from ct_diffusionmodelbench_tpu.models import make_forward_fn

            cfg = runner.cfg.replace(causal=True, logit_shift=False)
            fwd = make_forward_fn(cfg)
            ids = np.asarray(runner.tokenizer.encode(PROMPTS[0]), np.int32)
            seq = ar_generate(fwd, runner.params, ids[None],
                              max_new_tokens=16, temperature=0.7,
                              top_p=0.95, key=jax.random.key(0))
            txt = runner.tokenizer.decode(np.asarray(seq)[0, len(ids):])
            (out / "lladou_ar_probe.lean").write_text(txt)
            log("[lladou-ar] saved lladou_ar_probe.lean")


if __name__ == "__main__":
    main()
