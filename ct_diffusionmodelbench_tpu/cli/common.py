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


def runner_from_args(args) -> ModelRunner:
    """--preset (random-init, offline/dev) or --model-dir (HF checkpoint),
    with the (data=dp, model=tp) mesh when either flag exceeds 1."""
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    mask_id = getattr(args, "mask_id", None)
    if getattr(args, "preset", None):
        runner = ModelRunner.random_init(args.preset, dp=dp, tp=tp)
        if mask_id is not None:
            runner.mask_id = mask_id
        return runner
    if getattr(args, "model_dir", None):
        return ModelRunner.from_dir(args.model_dir, mask_id_override=mask_id,
                                    dp=dp, tp=tp)
    raise SystemExit("need --model-dir or --preset")
