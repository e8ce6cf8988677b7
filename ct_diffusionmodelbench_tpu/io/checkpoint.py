"""HF-checkpoint ⇄ JAX pytree interop.

Loads the sharded safetensors checkpoints that the reference produces and
consumes (``model.safetensors.index.json`` + shards, written by
``save_pretrained(max_shard_size="1GB")`` — Training/Training_0to1k/
train.py:355-376; reloaded via ``from_pretrained`` with
``local_files_only`` — Training_1kto21k/train.py:116-149), and exports our
trained pytrees back in the same layout so finetuned models stay loadable by
the HF stack.

Name mapping: every target leaf carries an ordered list of candidate HF name
templates (LLaMA/Qwen ``model.layers.{i}.self_attn.q_proj.weight`` style
first, OLMo/LLaDA ``model.transformer.blocks.{i}.q_proj.weight`` style as
alias) — the first template present in the checkpoint wins, so one loader
covers all four checkpoint families without remote code.  HF Linear weights
are stored [out, in]; our kernels take [in, out], so 2-D projection weights
transpose on the way through.  Layer tensors are stacked along a leading
axis to match the scan-over-layers forward.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ct_diffusionmodelbench_tpu.models.config import ModelConfig, config_from_hf
from ct_diffusionmodelbench_tpu.io.safetensors_io import (
    load_safetensors,
    save_safetensors,
    shard_tensors,
)

WEIGHTS_INDEX = "model.safetensors.index.json"
WEIGHTS_SINGLE = "model.safetensors"


# (our key, [HF name templates], transpose 2-D [out,in]→[in,out])
def _global_specs(cfg: ModelConfig):
    specs = [
        ("embed", ["model.embed_tokens.weight", "model.transformer.wte.weight",
                   "transformer.wte.weight", "embed_tokens.weight"], False),
        ("final_norm", ["model.norm.weight", "model.transformer.ln_f.weight",
                        "model.final_layernorm.weight"], False),
    ]
    if not cfg.tie_embeddings:
        specs.append(("lm_head", ["lm_head.weight", "model.transformer.ff_out.weight",
                                  "model.lm_head.weight"], True))
    return specs


def _layer_specs(cfg: ModelConfig):
    a = "model.layers.{i}.self_attn."
    o = "model.transformer.blocks.{i}."
    m = "model.layers.{i}.mlp."
    specs = [
        ("attn_norm", ["model.layers.{i}.input_layernorm.weight", o + "attn_norm.weight"], False),
        ("wq", [a + "q_proj.weight", o + "q_proj.weight"], True),
        ("wk", [a + "k_proj.weight", o + "k_proj.weight"], True),
        ("wv", [a + "v_proj.weight", o + "v_proj.weight"], True),
        ("wo", [a + "o_proj.weight", o + "attn_out.weight"], True),
        ("ffn_norm", ["model.layers.{i}.post_attention_layernorm.weight", o + "ff_norm.weight"], False),
    ]
    if cfg.attention_bias:
        specs += [
            ("bq", [a + "q_proj.bias"], False),
            ("bk", [a + "k_proj.bias"], False),
            ("bv", [a + "v_proj.bias"], False),
        ]
    if cfg.qk_norm:
        specs += [
            ("q_norm", [a + "q_norm.weight", o + "q_norm.weight"], False),
            ("k_norm", [a + "k_norm.weight", o + "k_norm.weight"], False),
        ]
    if cfg.is_moe:
        specs += [
            ("router", [m + "gate.weight", m + "router.weight",
                        "model.layers.{i}.block_sparse_moe.gate.weight"], True),
        ]
        if cfg.num_shared_experts:
            specs += [
                ("ws_gate", [m + "shared_experts.gate_proj.weight",
                             m + "shared_expert.gate_proj.weight"], True),
                ("ws_up", [m + "shared_experts.up_proj.weight",
                           m + "shared_expert.up_proj.weight"], True),
                ("ws_down", [m + "shared_experts.down_proj.weight",
                             m + "shared_expert.down_proj.weight"], True),
            ]
    else:
        specs += [
            ("w_gate", [m + "gate_proj.weight", o + "ff_proj.weight"], True),
            ("w_up", [m + "up_proj.weight", o + "up_proj.weight"], True),
            ("w_down", [m + "down_proj.weight", o + "ff_out.weight"], True),
        ]
    return specs


# (our key, [per-expert HF templates], [stacked HF templates], transpose)
# Per-expert: one [out, in] matrix per expert (Bailing/Qwen-MoE layout;
# Mixtral's block_sparse_moe.{e}.w1/w3/w2 aliases included).  Stacked: one
# 3-D [E, out, in] tensor per layer (or 2-D fused [E*out, in]) — some MoE
# exports fuse the per-expert tensors this way; normalized by
# ``_normalize_stacked_experts``.
def _expert_specs():
    m = "model.layers.{i}.mlp.experts.{e}."
    bs = "model.layers.{i}.block_sparse_moe.experts.{e}."
    st = "model.layers.{i}.mlp.experts."
    return [
        ("we_gate", [m + "gate_proj.weight", bs + "w1.weight"],
         [st + "gate_proj.weight", st + "gate_proj"], True),
        ("we_up", [m + "up_proj.weight", bs + "w3.weight"],
         [st + "up_proj.weight", st + "up_proj"], True),
        ("we_down", [m + "down_proj.weight", bs + "w2.weight"],
         [st + "down_proj.weight", st + "down_proj"], True),
    ]


def _normalize_stacked_experts(key: str, arr: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    """Stacked expert tensor → our [E, in, out] kernel layout.

    Convention: stacked checkpoints stack HF ``[out, in]`` matrices along a
    leading expert axis → stored [E, out, in]; fused 2-D variants are
    [E*out, in].  gate/up: out=Fm, in=D → target [E, D, Fm]; down: out=D,
    in=Fm → target [E, Fm, D]."""
    E, D, Fm = cfg.num_experts, cfg.hidden_size, cfg.moe_intermediate_size
    out_dim, in_dim = (Fm, D) if key in ("we_gate", "we_up") else (D, Fm)
    if arr.ndim == 2:
        if arr.shape != (E * out_dim, in_dim):
            raise ValueError(
                f"fused expert tensor {key}: got {arr.shape}, "
                f"expected ({E * out_dim}, {in_dim})")
        arr = arr.reshape(E, out_dim, in_dim)
    if arr.shape != (E, out_dim, in_dim):
        raise ValueError(
            f"stacked expert tensor {key}: got {arr.shape}, "
            f"expected ({E}, {out_dim}, {in_dim})")
    return arr.transpose(0, 2, 1)  # [E, out, in] → [E, in, out]


def _read_all_tensors(model_dir: Path) -> Dict[str, np.ndarray]:
    index_path = model_dir / WEIGHTS_INDEX
    if index_path.exists():
        with open(index_path) as f:
            index = json.load(f)
        tensors: Dict[str, np.ndarray] = {}
        for shard_name in sorted(set(index["weight_map"].values())):
            tensors.update(load_safetensors(model_dir / shard_name))
        return tensors
    single = model_dir / WEIGHTS_SINGLE
    if single.exists():
        return load_safetensors(single)
    raise FileNotFoundError(
        f"No {WEIGHTS_INDEX} or {WEIGHTS_SINGLE} in {model_dir}")


def _find(tensors, templates, **fmt):
    for t in templates:
        name = t.format(**fmt)
        if name in tensors:
            return tensors[name]
    return None


def load_checkpoint(
    model_dir: str | Path,
    cfg: Optional[ModelConfig] = None,
    dtype: Optional[str] = None,
) -> tuple[ModelConfig, dict]:
    """Load (config, params) from an HF-layout checkpoint directory."""
    model_dir = Path(model_dir)
    if cfg is None:
        cfg_path = model_dir / "config.json"
        if not cfg_path.exists():
            raise FileNotFoundError(f"{cfg_path} missing and no cfg given")
        cfg = config_from_hf(cfg_path, name=model_dir.name)
    target = dtype or cfg.dtype
    dt = np.dtype(ml_dtypes.bfloat16) if target == "bfloat16" else np.dtype(target)
    cfg = cfg.replace(dtype=target)  # keep config honest about loaded dtype

    tensors = _read_all_tensors(model_dir)

    def convert(arr: np.ndarray, transpose: bool) -> np.ndarray:
        if transpose and arr.ndim == 2:
            arr = arr.T
        return np.ascontiguousarray(arr).astype(dt, copy=False)

    # The heavy work is transposing/stacking GBs of mmapped tensors — numpy
    # releases the GIL for the copies, so a thread pool cuts 16 GB-class
    # checkpoint loads by ~the core count.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=min(16, (os.cpu_count() or 8)))

    def fetch(key, templates, tp, **fmt):
        arr = _find(tensors, templates, **fmt)
        if arr is None:
            raise KeyError(
                f"checkpoint missing {key} {fmt or ''} (tried {templates})")
        return convert(arr, tp)

    params: dict = {"blocks": {}}
    global_futs = {key: pool.submit(fetch, key, templates, tp)
                   for key, templates, tp in _global_specs(cfg)}

    layer_futs = {}
    for key, templates, tp in _layer_specs(cfg):
        layer_futs[key] = [pool.submit(fetch, key, templates, tp, i=i)
                           for i in range(cfg.num_layers)]
    def fetch_stacked(key, stacked_templates, dense_templates, **fmt):
        arr = _find(tensors, stacked_templates, **fmt)
        if arr is None:
            raise KeyError(
                f"checkpoint missing {key} {fmt or ''} in any layout "
                f"(per-expert {dense_templates}, stacked {stacked_templates})")
        arr = _normalize_stacked_experts(key, np.asarray(arr), cfg)
        return np.ascontiguousarray(arr).astype(dt, copy=False)

    expert_futs = {}
    expert_stacked_futs = {}
    if cfg.is_moe:
        for key, templates, stacked_templates, tp in _expert_specs():
            if _find(tensors, templates, i=0, e=0) is not None:
                expert_futs[key] = [
                    [pool.submit(fetch, key, templates, tp, i=i, e=e)
                     for e in range(cfg.num_experts)]
                    for i in range(cfg.num_layers)
                ]
            else:  # stacked / fused expert tensors (one per layer)
                expert_stacked_futs[key] = [
                    pool.submit(fetch_stacked, key, stacked_templates,
                                templates, i=i)
                    for i in range(cfg.num_layers)
                ]

    try:
        for key, fut in global_futs.items():
            params[key] = jnp.asarray(fut.result())
        for key, futs in layer_futs.items():
            params["blocks"][key] = jnp.asarray(
                np.stack([f.result() for f in futs]))
        for key, grid in expert_futs.items():
            params["blocks"][key] = jnp.asarray(np.stack(
                [np.stack([f.result() for f in row]) for row in grid]))
        for key, futs in expert_stacked_futs.items():
            params["blocks"][key] = jnp.asarray(
                np.stack([f.result() for f in futs]))
    finally:
        pool.shutdown(wait=False)

    return cfg, params


def flatten_to_hf(cfg: ModelConfig, params: dict) -> Dict[str, np.ndarray]:
    """Our pytree → flat {canonical HF name: numpy [out,in] tensor}."""
    out: Dict[str, np.ndarray] = {}

    def conv(arr, transpose):
        a = np.asarray(arr)
        if transpose and a.ndim == 2:
            a = a.T
        return np.ascontiguousarray(a)

    for key, templates, tp in _global_specs(cfg):
        out[templates[0]] = conv(params[key], tp)
    for key, templates, tp in _layer_specs(cfg):
        stacked = np.asarray(params["blocks"][key])
        for i in range(cfg.num_layers):
            out[templates[0].format(i=i)] = conv(stacked[i], tp)
    if cfg.is_moe:
        for key, templates, _stacked, tp in _expert_specs():
            stacked = np.asarray(params["blocks"][key])
            for i in range(cfg.num_layers):
                for e in range(cfg.num_experts):
                    out[templates[0].format(i=i, e=e)] = conv(stacked[i, e], tp)
    return out


def _hf_config_dict(cfg: ModelConfig) -> dict:
    d = {
        "model_type": cfg.name,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.intermediate_size,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_seq_len,
        "attention_bias": cfg.attention_bias,
        "use_qk_norm": cfg.qk_norm,
        "tie_word_embeddings": cfg.tie_embeddings,
        "mask_token_id": cfg.mask_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
        "torch_dtype": "bfloat16" if cfg.dtype == "bfloat16" else cfg.dtype,
    }
    if cfg.logit_shift:
        d["logit_shift"] = True
    if cfg.is_moe:
        d.update(
            num_experts=cfg.num_experts,
            num_experts_per_tok=cfg.num_experts_per_tok,
            moe_intermediate_size=cfg.moe_intermediate_size,
            num_shared_experts=cfg.num_shared_experts,
            norm_topk_prob=cfg.norm_topk_prob,
        )
    return d


def save_checkpoint(
    model_dir: str | Path,
    cfg: ModelConfig,
    params: dict,
    max_shard_size: int = 1 << 30,
) -> None:
    """Export to HF layout: config.json + sharded safetensors + index.

    Mirrors the reference's optimized save (sharded ``max_shard_size="1GB"``
    safetensors, train.py:355-376).
    """
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)

    flat = flatten_to_hf(cfg, params)
    shards = list(shard_tensors(flat, max_shard_size))

    if len(shards) == 1:
        save_safetensors(model_dir / WEIGHTS_SINGLE, shards[0],
                         metadata={"format": "pt"})
    else:
        weight_map = {}
        total = 0
        for n, shard in enumerate(shards, start=1):
            shard_name = f"model-{n:05d}-of-{len(shards):05d}.safetensors"
            save_safetensors(model_dir / shard_name, shard, metadata={"format": "pt"})
            for name, arr in shard.items():
                weight_map[name] = shard_name
                total += np.asarray(arr).nbytes
        with open(model_dir / WEIGHTS_INDEX, "w") as f:
            json.dump({"metadata": {"total_size": total},
                       "weight_map": weight_map}, f, indent=2)

    with open(model_dir / "config.json", "w") as f:
        json.dump(_hf_config_dict(cfg), f, indent=2)


# ---------------------------------------------------------------------------
# ctdb-native int8 serving checkpoints (ops/quant.py trees)
# ---------------------------------------------------------------------------
# A quantized tree's {q, s} dict leaves have no HF-layout equivalent (the
# reference serves bf16 only), so int8 checkpoints use a ctdb-native format:
# safetensors keyed by dotted TREE PATH (``blocks.wq.q`` int8,
# ``blocks.wq.s`` f32) plus a ``ctdb_quant: "int8"`` marker in config.json.
# Quantize once on disk (tools/quantize_ckpt.py), serve many times: loading
# skips both the bf16 host→device transfer of the big tree and the on-load
# quantization pass.

_QUANT_MARKER = "ctdb_quant"


def save_quantized_checkpoint(model_dir: str | Path, cfg: ModelConfig,
                              qparams: dict,
                              max_shard_size: int = 1 << 30) -> None:
    """Write a quantized param tree (ops/quant.py layout) as a ctdb-native
    int8 checkpoint."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)

    flat: Dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", qparams)

    shards = list(shard_tensors(flat, max_shard_size))
    if len(shards) == 1:
        save_safetensors(model_dir / WEIGHTS_SINGLE, shards[0],
                         metadata={"format": "ctdb-int8"})
    else:
        weight_map, total = {}, 0
        for n, shard in enumerate(shards, start=1):
            shard_name = f"model-{n:05d}-of-{len(shards):05d}.safetensors"
            save_safetensors(model_dir / shard_name, shard,
                             metadata={"format": "ctdb-int8"})
            for name, arr in shard.items():
                weight_map[name] = shard_name
                total += np.asarray(arr).nbytes
        with open(model_dir / WEIGHTS_INDEX, "w") as f:
            json.dump({"metadata": {"total_size": total},
                       "weight_map": weight_map}, f, indent=2)

    d = _hf_config_dict(cfg)
    d[_QUANT_MARKER] = "int8"
    with open(model_dir / "config.json", "w") as f:
        json.dump(d, f, indent=2)


def is_quantized_checkpoint(model_dir: str | Path) -> bool:
    cfg_path = Path(model_dir) / "config.json"
    if not cfg_path.exists():
        return False
    with open(cfg_path) as f:
        return json.load(f).get(_QUANT_MARKER) == "int8"


def load_quantized_checkpoint(
        model_dir: str | Path,
        cfg: Optional[ModelConfig] = None) -> tuple[ModelConfig, dict]:
    """Load a ctdb-native int8 checkpoint back into the {q, s} pytree."""
    model_dir = Path(model_dir)
    if cfg is None:
        cfg = config_from_hf(model_dir / "config.json", name=model_dir.name)
    tensors = _read_all_tensors(model_dir)
    params: dict = {}
    for name, arr in tensors.items():
        node = params
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.ascontiguousarray(arr))
    return cfg, params
