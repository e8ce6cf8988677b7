"""Quantize a bf16 HF-layout checkpoint directory to a ctdb-native int8
serving checkpoint (quantize once on disk, serve many times).

The reference serves bf16 and splits over-HBM models across GPUs with
``device_map="auto"`` (Inference/chat_finetuned.py:138-144); the
TPU-native single-chip alternative is weight-only int8 (ops/quant.py).
Loading an int8 dir skips both the bf16 host→device transfer of the big
tree and the on-load quantization pass; `ModelRunner.from_dir` (and every
serving CLI) auto-detects the format via config.json's ``ctdb_quant``.

Usage: python tools/quantize_ckpt.py --in ./llada-8b-ckpt --out ./llada-8b-int8
"""

import argparse
import os
import sys
from pathlib import Path

# Offline pass: per-leaf absmax/round is faster on host CPU than through the
# tunneled TPU's ~0.1-0.3 s per-dispatch RPC (CLAUDE.md).  Must be set
# before jax import; PALLAS_AXON_POOL_IPS= is what disables the TPU plugin.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="src", required=True)
    ap.add_argument("--out", dest="dst", required=True)
    args = ap.parse_args()

    # CPU is fine (and avoids touching device HBM): quantization is a
    # per-leaf absmax/round pass.
    from ct_diffusionmodelbench_tpu.io.checkpoint import (
        load_checkpoint, save_quantized_checkpoint)
    from ct_diffusionmodelbench_tpu.ops.quant import quantize_params

    cfg, params = load_checkpoint(args.src)
    qparams = quantize_params(params)
    save_quantized_checkpoint(args.dst, cfg, qparams)

    # copy tokenizer files alongside so from_dir finds them
    import shutil
    for f in Path(args.src).glob("tokenizer*"):
        shutil.copy(f, Path(args.dst) / f.name)
    for name in ("special_tokens_map.json", "generation_config.json"):
        p = Path(args.src) / name
        if p.exists():
            shutil.copy(p, Path(args.dst) / name)
    print(f"wrote int8 checkpoint to {args.dst}")


if __name__ == "__main__":
    main()
