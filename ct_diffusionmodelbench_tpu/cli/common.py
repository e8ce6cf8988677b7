"""Shared CLI plumbing: model loading + mesh flags.

Every serving CLI (chat, bench, minif2f, infer-split) exposes the same
``--dp/--tp`` mesh flags and the same --model-dir/--preset loading rules, so
the logic lives here once.  ``--tp`` is how a checkpoint that exceeds one
chip's HBM (LLaDA-8B bf16) actually gets served — the TP-sharded replacement
for the reference's ``device_map="auto"`` (Inference/chat_finetuned.py:
138-144).
"""

from __future__ import annotations

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner


def add_parallel_flags(p) -> None:
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis (prompt batches shard over "
                        "it; batch sizes must divide by it)")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis (attention heads / MLP "
                        "hidden / MoE experts shard over it; required when "
                        "the model exceeds one chip's HBM, e.g. LLaDA-8B "
                        "bf16 on v5e)")
    p.add_argument("--accel", type=str, default=None,
                   choices=["block-cache"],
                   help="Opt-in approximate acceleration: 'block-cache' = "
                        "Fast-dLLM-style dual KV cache (per-step compute "
                        "drops from full-sequence to the active block; "
                        "LLaDA families, single chip). Default: the exact "
                        "sampler")
    p.add_argument("--quant", type=str, default=None,
                   choices=["int8"],
                   help="Opt-in weight-only int8 quantization (per-output-"
                        "channel symmetric): serves models that overflow one "
                        "chip in bf16 (LLaDA-8B: 16.3 GB bf16 -> 8.2 GB "
                        "int8) WITHOUT a mesh. Approximate (weight "
                        "rounding); bf16 under --tp stays the exact path")
    p.add_argument("--parallel-threshold", type=float, default=None,
                   help="Opt-in Fast-dLLM confidence-threshold parallel "
                        "decoding: unmask every position whose confidence "
                        "exceeds this (e.g. 0.9) each step instead of the "
                        "fixed schedule — blocks finish in as few steps as "
                        "their tokens are confident (LLaDA families; "
                        "composes with --accel block-cache). Default: the "
                        "reference's fixed transfer schedule")


def runner_from_args(args) -> ModelRunner:
    """--preset (random-init, offline/dev) or --model-dir (HF checkpoint),
    with the (data=dp, model=tp) mesh when either flag exceeds 1."""
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    accel = getattr(args, "accel", None)
    quant = getattr(args, "quant", None)
    mask_id = getattr(args, "mask_id", None)
    pthr = getattr(args, "parallel_threshold", None)
    if getattr(args, "preset", None):
        runner = ModelRunner.random_init(args.preset, dp=dp, tp=tp,
                                         accel=accel, quant=quant)
        if mask_id is not None:
            runner.mask_id = mask_id
        runner.parallel_threshold = pthr
        return runner
    if getattr(args, "model_dir", None):
        runner = ModelRunner.from_dir(args.model_dir, mask_id_override=mask_id,
                                      dp=dp, tp=tp, accel=accel, quant=quant)
        runner.parallel_threshold = pthr
        return runner
    raise SystemExit("need --model-dir or --preset")
