"""AOT memory analysis of the MoE SFT train step at each layer depth.

The bench descent (bench_sweep.py _bench_sft_moe_subprocess) only learns
"fits" / "doesn't" per layer count, at ~20 min a try on the shared chip.
This compiles the SAME donated jitted step against ABSTRACT operands —
no HBM is allocated, only the remote compile service runs — and prints
XLA's own memory_analysis(): argument/output/temp/peak bytes.  A compile-
time RESOURCE_EXHAUSTED here is exactly the failure the runtime descent
hits, with the allocation breakdown attached.

Usage: python tools/moe_train_memfit.py [--layers 6,5,4,3,2] [--ce-chunk 256]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["CTDB_MOE_STACKED"] = "0"  # match bench_sweep.bench_sft_moe


def analyze(layers, ce_chunk, update_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.models import get_config, init_params
    from ct_diffusionmodelbench_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step)

    A, B, L = 4, 1, 2048
    cfg = get_config("llada-moe-7b").replace(num_layers=layers)
    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=A, batch_size=B,
                       max_length=L, remat=True,
                       optimizer_state_dtype="int8",
                       grad_accum_dtype="bfloat16",
                       optimizer_update_dtype=update_dtype,
                       ce_chunk=ce_chunk)
    optimizer, _ = make_optimizer(tcfg, total_steps=100)
    step, _ = make_train_step(cfg, tcfg, optimizer)

    params_abs = jax.eval_shape(lambda k: init_params(cfg, k),
                                jax.random.key(0))
    opt_abs = jax.eval_shape(optimizer.init, params_abs)
    ids = jax.ShapeDtypeStruct((A, B, L), jnp.int32)
    plens = jax.ShapeDtypeStruct((A, B), jnp.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    lowered = step.lower(params_abs, opt_abs, ids, plens, key)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    return {
        "layers": layers,
        "ce_chunk": ce_chunk,
        "param_count_b": round(cfg.param_count() / 1e9, 2),
        "argument_gib": round(ma.argument_size_in_bytes / gb, 2),
        "output_gib": round(ma.output_size_in_bytes / gb, 2),
        "donated_alias_gib": round(ma.alias_size_in_bytes / gb, 2),
        "temp_gib": round(ma.temp_size_in_bytes / gb, 2),
        # live peak = args + outputs + temps - donated aliases
        "peak_gib": round((ma.argument_size_in_bytes
                           + ma.output_size_in_bytes
                           + ma.temp_size_in_bytes
                           - ma.alias_size_in_bytes) / gb, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="4,3,6,5,2")
    ap.add_argument("--ce-chunk", type=int, default=256)
    ap.add_argument("--update-dtype", default="float32")
    args = ap.parse_args()

    for n in [int(x) for x in args.layers.split(",")]:
        try:
            row = analyze(n, args.ce_chunk, args.update_dtype)
            row["update_dtype"] = args.update_dtype
        except Exception as e:
            row = {"layers": n, "ce_chunk": args.ce_chunk,
                   "update_dtype": args.update_dtype,
                   "error": f"{type(e).__name__}: {str(e)[:2000]}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
