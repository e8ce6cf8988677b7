"""SFT training CLI.

Replaces the reference's edit-the-constants launchers
(Training/Training_0to1k/train.py:33-56 module constants +
FAST_OUTPUT_DIR/FINETUNED_MODEL_DIR env vars) with one dataclass-backed
argparse config; flag names mirror the reference knobs.
"""

from __future__ import annotations

import argparse
import os

from ct_diffusionmodelbench_tpu.io.datasets_io import (
    NUMINA_DATASET,
    format_instruction_lean_sft,
    format_instruction_problem,
    load_hub_or_local,
    split_80_10_10,
)
from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer
from ct_diffusionmodelbench_tpu.models import get_config, init_params
from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint
from ct_diffusionmodelbench_tpu.train import TrainConfig, Trainer
from ct_diffusionmodelbench_tpu.utils.logging import log_timing

import jax


def build_parser():
    p = argparse.ArgumentParser(description="Masked-diffusion SFT (TPU-native)")
    p.add_argument("--model-dir", type=str, default=None,
                   help="HF-layout checkpoint to finetune (or resume from)")
    p.add_argument("--preset", type=str, default=None,
                   help="Random-init preset (from-scratch/dev runs)")
    p.add_argument("--dataset", type=str, default=NUMINA_DATASET,
                   help="Hub id or local json/jsonl path")
    p.add_argument("--format", choices=["lean_sft", "problem"], default="lean_sft",
                   help="Instruction format variant (A: train.py:63-88, "
                        "B: train_fast_save.py:40-65)")
    p.add_argument("--output-dir", type=str,
                   default=os.environ.get("FAST_OUTPUT_DIR", "./ctdb-finetuned"))
    p.add_argument("--train-samples", type=int, default=1000)
    p.add_argument("--dataset-slice", type=str, default=None,
                   help="Row slice like 1000:22000 (Training_1kto21k/train.py:169-173)")
    p.add_argument("--max-length", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=5e-5)
    p.add_argument("--warmup-steps", type=int, default=50)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--eval-steps", type=int, default=1000)
    p.add_argument("--logging-steps", type=int, default=10)
    p.add_argument("--save-steps", type=int, default=0,
                   help="0 = final save only (reference save_strategy='no')")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-variable-length", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize layer activations (gradient checkpointing)")
    p.add_argument("--remat-policy", choices=["full", "dots"], default="full",
                   help="With --remat: 'full' recomputes the whole block in "
                        "the backward; 'dots' saves matmul outputs and "
                        "recomputes only elementwise/norm work")
    p.add_argument("--dp", type=int, default=1,
                   help="Data-parallel mesh axis (batch shards over it; "
                        "first-class replacement for the reference's 8-GPU "
                        "DDP, Training_0to1k/train.py:459)")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel mesh axis (params shard "
                        "megatron-style; MoE experts ride this axis)")
    p.add_argument("--sp", type=int, default=1,
                   help="Sequence-parallel mesh axis (ring attention; "
                        "activations shard over the sequence for "
                        "long-context runs — no reference analogue)")
    p.add_argument("--pp", type=int, default=1,
                   help="Pipeline-parallel stages (GPipe over the layer "
                        "stack; the real version of the reference's "
                        "device_map='auto' layer spread, "
                        "Training_0to1k/train.py:116-122; composes with "
                        "--dp, and with --tp for dense models "
                        "(TP-within-stage); exclusive with --sp)")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = one per stage); "
                        "batch-size must divide by it")
    p.add_argument("--optimizer-state-dtype",
                   choices=["float32", "bfloat16", "int8"], default="float32",
                   help="Adam moment storage dtype (bfloat16/int8 shrink "
                        "optimizer state 2x/4x to fit bigger models on one "
                        "chip; float32 = reference adamw_torch semantics)")
    p.add_argument("--grad-accum-dtype",
                   choices=["float32", "bfloat16"], default="float32",
                   help="Gradient-accumulation buffer dtype (bfloat16 halves "
                        "the accumulation carry + transient grads; grad-norm "
                        "clip still accumulates in f32)")
    return p


def tokenize_rows(ds, tokenizer, max_length):
    """tokenize_function semantics (train.py:172-194): full text + prompt
    length per row."""
    rows = []
    for ex in ds:
        ids = tokenizer.encode(ex["text"], max_length=max_length)
        p_ids = tokenizer.encode(ex["prompt"], max_length=max_length)
        rows.append({"input_ids": ids, "prompt_lengths": len(p_ids)})
    return rows


def main(argv=None):
    args = build_parser().parse_args(argv)

    log_timing("Starting masked-diffusion SFT (TPU-native)")
    if args.model_dir:
        cfg, params = load_checkpoint(args.model_dir)
        try:
            tokenizer = Tokenizer.from_pretrained(args.model_dir)
        except Exception:
            tokenizer = Tokenizer.byte_fallback(vocab_size=cfg.vocab_size,
                                                eos_token_id=cfg.eos_token_id or 2)
    elif args.preset:
        cfg = get_config(args.preset)
        params = init_params(cfg, jax.random.key(args.seed))
        tokenizer = Tokenizer.byte_fallback(vocab_size=cfg.vocab_size,
                                            eos_token_id=cfg.eos_token_id or 2)
    else:
        raise SystemExit("need --model-dir or --preset")
    log_timing(f"Model: {cfg.name} ({cfg.param_count()/1e9:.2f}B params)")

    raw = load_hub_or_local(args.dataset, split="train")
    if args.dataset_slice:
        lo, hi = args.dataset_slice.split(":")
        raw = raw.select(range(int(lo), min(int(hi), len(raw))))

    fmt = (format_instruction_lean_sft if args.format == "lean_sft"
           else format_instruction_problem)
    formatted = raw.map(lambda x: fmt(x, tokenizer), remove_columns=raw.column_names)
    formatted = formatted.filter(lambda x: x["text"] != "")
    train_ds, val_ds, test_ds = split_80_10_10(formatted, seed=args.seed)
    if args.train_samples and len(train_ds) > args.train_samples:
        train_ds = train_ds.select(range(args.train_samples))
    print(f"Final splits -> train: {len(train_ds)}, val: {len(val_ds)}, "
          f"test: {len(test_ds)}")

    log_timing("Tokenizing dataset")
    tokenized_train = tokenize_rows(train_ds, tokenizer, args.max_length)
    tokenized_val = tokenize_rows(val_ds, tokenizer, args.max_length)

    tc = TrainConfig(
        output_dir=args.output_dir,
        num_epochs=args.epochs,
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        weight_decay=args.weight_decay,
        eval_steps=args.eval_steps,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
        max_length=args.max_length,
        seed=args.seed,
        variable_length=not args.no_variable_length,
        # --remat-policy dots implies remat even without --remat: asking for
        # a policy and silently getting NO rematerialization would double
        # activation memory ('full' is the default policy label, so it alone
        # does not switch remat on).
        remat=("dots" if args.remat_policy == "dots" else args.remat),
        dp=args.dp,
        tp=args.tp,
        sp=args.sp,
        pp=args.pp,
        pp_microbatches=args.pp_microbatches,
        optimizer_state_dtype=args.optimizer_state_dtype,
        grad_accum_dtype=args.grad_accum_dtype,
    )
    trainer = Trainer(cfg, params, tc, tokenized_train,
                      eval_dataset=tokenized_val, tokenizer=tokenizer)
    final = trainer.train()
    log_timing(f"Training complete! {final}")
    print(f"Model saved to: {args.output_dir}")


if __name__ == "__main__":
    main()
