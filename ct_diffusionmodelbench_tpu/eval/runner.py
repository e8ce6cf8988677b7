"""ModelRunner: checkpoint + tokenizer + sampler behind one generate() call.

The uniform handle the eval/CLI layers drive.  Loads HF-layout checkpoint
dirs (io/checkpoint.py) or wraps an in-memory (cfg, params, tokenizer) —
the latter is how tests and random-weight benchmarks run offline.

Family dispatch:
- ``llada`` / ``llada-moe``: chat-template prompt + the block-diffusion
  sampler (C1),
- ``dream`` / ``diffucoder``: raw ``<|im_start|>`` prompt + the
  entropy-ordered ``diffusion_generate`` equivalent (C7), decode split at
  ``eos_token`` (dream.py:99) or ``<|dlm_pad|>`` (diffucoder.py:96).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint
from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer, resolve_mask_id
from ct_diffusionmodelbench_tpu.models.config import ModelConfig, get_config
from ct_diffusionmodelbench_tpu.models.transformer import make_forward_fn
from ct_diffusionmodelbench_tpu.sampling import dream_generate, llada_generate


def infer_family(cfg: ModelConfig) -> str:
    """Sampler-family dispatch: the explicit ``cfg.family`` (presets and
    config_from_hf set it from model_type) wins; the name heuristic is only
    the last-resort fallback for configs that carry neither."""
    if cfg.family:
        return cfg.family
    if cfg.logit_shift:
        return "dream" if "dream" in cfg.name else "diffucoder"
    return "llada-moe" if cfg.is_moe else "llada"


def _maybe_mesh(dp: int, tp: int):
    """(data=dp, model=tp) mesh, or None for the plain single-device path."""
    if dp * tp <= 1:
        return None
    from ct_diffusionmodelbench_tpu.parallel import make_mesh
    return make_mesh(data=dp, model=tp)


@dataclass
class GenResult:
    token_ids: np.ndarray       # [P+G] full sequence
    continuation_ids: np.ndarray
    text: str                   # decoded continuation (family-specific split)
    latency_sec: float


class ModelRunner:
    def __init__(self, cfg: ModelConfig, params, tokenizer: Tokenizer,
                 family: Optional[str] = None,
                 mask_id_override: Optional[int] = None,
                 prompt_bucket: int = 64,
                 mesh=None,
                 accel: Optional[str] = None,
                 quant: Optional[str] = None):
        """``mesh``: a (data, model) jax.sharding.Mesh — parameters are
        placed per the megatron-style TP rules (parallel/sharding.py) and
        the forward becomes the jitted TP/DP-sharded graph.  This is the
        serving path for checkpoints that exceed one chip's HBM (LLaDA-8B
        bf16 ≈ 16.3 GB vs 16 GB/chip on v5e — SURVEY.md §7 hard-part 7);
        replaces the reference's ``device_map="auto"`` sequential layer
        placement (Inference/chat_finetuned.py:138-144).  Batch sizes must
        be divisible by the mesh's ``data`` axis."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.family = family or infer_family(cfg)
        self.mesh = mesh
        # quant="int8": weight-only per-channel int8 serving (ops/quant.py)
        # — the single-chip answer to checkpoints that overflow one device
        # (LLaDA-8B bf16 16.3 GB > 16 GB HBM; the reference splits across
        # GPUs with device_map="auto", Inference/chat_finetuned.py:138-144).
        # Approximate
        # (weight rounding), so opt-in; TP>=2 bf16 remains the exact path.
        self.quant = quant
        if quant is not None:
            if quant != "int8":
                raise ValueError(f"unknown quant mode {quant!r} "
                                 "(supported: 'int8')")
            if mesh is not None:
                raise NotImplementedError(
                    "quant='int8' is the single-chip alternative to a mesh "
                    "— drop --dp/--tp or the quant flag")
            from ct_diffusionmodelbench_tpu.ops.quant import (
                is_quantized, quantize_params)
            if not is_quantized(params["blocks"]["wq"]):
                params = quantize_params(params)
        if mesh is not None:
            from ct_diffusionmodelbench_tpu.parallel import (
                make_sharded_forward, shard_params)
            self.params = shard_params(cfg, params, mesh)
            self.forward_fn = make_sharded_forward(cfg, mesh)
        else:
            self.params = params
            self.forward_fn = make_forward_fn(cfg)
        # Left-pad prompts to a multiple of this so a 244-problem sweep
        # compiles the fused denoise loop for a handful of shape classes
        # instead of one per distinct prompt length (padding is numerically
        # transparent: mask-aware attention + RoPE position restart; set 1 to
        # disable for strict single-shape parity runs).
        self.prompt_bucket = max(prompt_bucket, 1)
        self.mask_id = resolve_mask_id(
            config_mask_id=cfg.mask_token_id,
            tokenizer=tokenizer,
            vocab_size=cfg.vocab_size,
            override=mask_id_override,
        )
        self.eos_token_id = (tokenizer.eos_token_id
                             if tokenizer.eos_token_id is not None
                             else cfg.eos_token_id)
        # accel="block-cache": Fast-dLLM-style dual-KV-cache decode
        # (models/block_cache.py) — approximate for deep models, single-chip
        # only, LLaDA families only.  None (default) = the exact sampler.
        self.accel = accel
        # Default confidence threshold for parallel decoding (None = fixed
        # schedule); per-call parallel_threshold= overrides.  Set via
        # --parallel-threshold on the serving CLIs.
        self.parallel_threshold = None
        self.cached_fns = None
        if accel is not None:
            if accel != "block-cache":
                raise ValueError(f"unknown accel mode {accel!r} "
                                 "(supported: 'block-cache')")
            if mesh is not None:
                raise NotImplementedError(
                    "accel='block-cache' is single-chip only — drop --dp/--tp "
                    "or the accel flag")
            if self.family not in ("llada", "llada-moe"):
                raise NotImplementedError(
                    "accel='block-cache' supports the LLaDA block sampler "
                    "families only (Dream/DiffuCoder use shifted logits)")
            from ct_diffusionmodelbench_tpu.models.block_cache import (
                make_cached_fns)
            self.cached_fns = make_cached_fns(cfg)

    # -- constructors --------------------------------------------------

    @classmethod
    def from_dir(cls, model_dir: str | Path, family: Optional[str] = None,
                 mask_id_override: Optional[int] = None,
                 dtype: Optional[str] = None,
                 dp: int = 1, tp: int = 1,
                 accel: Optional[str] = None,
                 quant: Optional[str] = None) -> "ModelRunner":
        # load_checkpoint returns HOST arrays; with quant, quantize_params
        # moves them to the device leaf-by-leaf, so the device never holds
        # the bf16 tree (one transient leaf at a time).
        from ct_diffusionmodelbench_tpu.io.checkpoint import (
            is_quantized_checkpoint, load_quantized_checkpoint)
        if is_quantized_checkpoint(model_dir):
            # ctdb-native int8 dir (tools/quantize_ckpt.py): already-
            # quantized tree, no bf16 transit and no on-load quantize pass.
            cfg, params = load_quantized_checkpoint(model_dir)
            quant = quant or "int8"
        else:
            cfg, params = load_checkpoint(model_dir, dtype=dtype)
        try:
            tokenizer = Tokenizer.from_pretrained(model_dir)
        except Exception:
            tokenizer = Tokenizer.byte_fallback(
                vocab_size=cfg.vocab_size,
                eos_token_id=cfg.eos_token_id or 2)
        return cls(cfg, params, tokenizer, family=family,
                   mask_id_override=mask_id_override,
                   mesh=_maybe_mesh(dp, tp), accel=accel, quant=quant)

    @classmethod
    def random_init(cls, preset: str, seed: int = 0,
                    family: Optional[str] = None,
                    dp: int = 1, tp: int = 1,
                    accel: Optional[str] = None,
                    quant: Optional[str] = None) -> "ModelRunner":
        from ct_diffusionmodelbench_tpu.models.transformer import init_params

        cfg = get_config(preset)
        if jax.default_backend() != "tpu" and cfg.dtype == "bfloat16":
            # CPU XLA lacks bf16 dot thunks for some ops (e.g. ragged_dot).
            cfg = cfg.replace(dtype="float32")
        leaf_transform = None
        if quant == "int8":
            # Quantize each leaf AS it is built: a full-size LLaDA-8B init
            # never materializes the 16.3 GB bf16 tree its int8 form replaces.
            from ct_diffusionmodelbench_tpu.ops.quant import (
                quantized_leaf_transform)
            leaf_transform = quantized_leaf_transform
        params = init_params(cfg, jax.random.key(seed),
                             leaf_transform=leaf_transform)
        tokenizer = Tokenizer.byte_fallback(vocab_size=cfg.vocab_size,
                                            eos_token_id=cfg.eos_token_id or 2)
        return cls(cfg, params, tokenizer, family=family,
                   mesh=_maybe_mesh(dp, tp), accel=accel, quant=quant)

    # -- generation ----------------------------------------------------

    def generate_ids(
        self,
        prompt_ids: np.ndarray,
        *,
        gen_length: int = 128,
        steps: int = 128,
        block_length: int = 32,
        temperature: float = 0.0,
        cfg_scale: float = 0.0,
        remasking: str = "low_confidence",
        avoid_eos: bool = False,
        top_p: Optional[float] = 0.95,
        alg: str = "entropy",
        alg_temp: float = 0.0,
        exact: bool = False,
        batch_mean_counts: bool = False,
        parallel_threshold: Optional[float] = None,
        seed: int = 0,
        attn_mask=None,
    ) -> np.ndarray:
        prompt = jnp.asarray(prompt_ids)[None] if np.ndim(prompt_ids) == 1 \
            else jnp.asarray(prompt_ids)
        if attn_mask is not None:
            attn_mask = jnp.asarray(attn_mask)
            if attn_mask.ndim == 1:
                attn_mask = attn_mask[None]
        key = jax.random.key(seed)
        if self.family in ("llada", "llada-moe"):
            out = llada_generate(
                self.forward_fn, self.params, prompt,
                steps=steps, gen_length=gen_length, block_length=block_length,
                temperature=temperature, cfg_scale=cfg_scale,
                remasking=remasking, mask_id=self.mask_id,
                avoid_eos=avoid_eos, eos_token_id=self.eos_token_id,
                block_cache=self.cached_fns is not None,
                cached_fns=self.cached_fns,
                parallel_threshold=(parallel_threshold
                                    if parallel_threshold is not None
                                    else self.parallel_threshold),
                attn_mask=attn_mask, key=key)
        else:
            if (parallel_threshold is not None
                    or self.parallel_threshold is not None):
                # Mirror --accel: silently running Dream's fixed schedule
                # while the user asked for threshold decoding would label a
                # wrong measurement.
                raise NotImplementedError(
                    "--parallel-threshold is a LLaDA-family decode "
                    "(confidence-threshold parallel unmasking); the Dream/"
                    "DiffuCoder sampler has no equivalent")
            out, _ = dream_generate(
                self.forward_fn, self.params, prompt,
                steps=steps, max_new_tokens=gen_length,
                temperature=temperature, top_p=top_p, alg=alg,
                alg_temp=alg_temp, mask_id=self.mask_id,
                exact=exact, batch_mean_counts=batch_mean_counts,
                attn_mask=attn_mask, key=key)
        return np.asarray(out)

    def generate(self, prompt_text: str, *, max_length: int = 2048,
                 truncate_at_eos: bool = False, skip_special_tokens: bool = True,
                 **kw) -> GenResult:
        ids = np.asarray(self.tokenizer.encode(prompt_text, max_length=max_length),
                         np.int32)
        attn_mask = None
        p = len(ids)
        b = self.prompt_bucket
        if b > 1 and p % b:
            padded_len = (p + b - 1) // b * b
            pad = padded_len - p
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.concatenate([np.full(pad, pad_id, np.int32), ids])
            attn_mask = np.concatenate([np.zeros(pad, np.int32),
                                        np.ones(p, np.int32)])
        t0 = time.time()
        out = self.generate_ids(ids, attn_mask=attn_mask, **kw)[0]
        latency = time.time() - t0

        cont = out[len(ids):]
        if truncate_at_eos and self.eos_token_id is not None:
            # Post-hoc EOS truncation (chat_finetuned.py:176-182).
            hits = np.nonzero(cont == self.eos_token_id)[0]
            if hits.size:
                cont = cont[: int(hits[0])]

        text = self.tokenizer.decode(cont, skip_special_tokens=skip_special_tokens)
        if self.family == "dream" and self.tokenizer.eos_token:
            text = text.split(self.tokenizer.eos_token)[0]
        elif self.family == "diffucoder":
            text = text.split("<|dlm_pad|>")[0]
        return GenResult(out, cont, text, round(latency, 4))

    def generate_batch(self, prompt_texts: list[str], *, max_length: int = 2048,
                       truncate_at_eos: bool = False,
                       skip_special_tokens: bool = True, **kw) -> list[GenResult]:
        """Data-parallel multi-prompt generation (BASELINE config 5).

        Prompts are left-padded to the batch max so every generated region
        is contiguous and the fused loop stays one static shape; the
        attention mask excludes pads and RoPE positions restart at the first
        real token (so each row decodes exactly as its unpadded single run).
        Under an active mesh the batch shards over the ``data`` axis.
        """
        import numpy as np

        encoded = [self.tokenizer.encode(t, max_length=max_length)
                   for t in prompt_texts]
        b = len(encoded)
        p = max(len(e) for e in encoded)
        bk = self.prompt_bucket
        p = (p + bk - 1) // bk * bk  # bucket the batch width too
        pad = self.tokenizer.pad_token_id or 0
        ids = np.full((b, p), pad, np.int32)
        mask = np.zeros((b, p), np.int32)
        for r, e in enumerate(encoded):
            ids[r, p - len(e):] = e
            mask[r, p - len(e):] = 1

        t0 = time.time()
        prompt = jnp.asarray(ids)
        key = jax.random.key(kw.pop("seed", 0))
        gen_length = kw.pop("gen_length", 128)
        if self.family in ("llada", "llada-moe"):
            out = llada_generate(
                self.forward_fn, self.params, prompt,
                steps=kw.pop("steps", 128), gen_length=gen_length,
                block_length=kw.pop("block_length", 32),
                temperature=kw.pop("temperature", 0.0),
                cfg_scale=kw.pop("cfg_scale", 0.0),
                remasking=kw.pop("remasking", "low_confidence"),
                mask_id=self.mask_id,
                avoid_eos=kw.pop("avoid_eos", False),
                eos_token_id=self.eos_token_id,
                block_cache=self.cached_fns is not None,
                cached_fns=self.cached_fns,
                parallel_threshold=kw.pop("parallel_threshold",
                                          self.parallel_threshold),
                attn_mask=jnp.asarray(mask), key=key)
        else:
            out, _ = dream_generate(
                self.forward_fn, self.params, prompt,
                steps=kw.pop("steps", 128), max_new_tokens=gen_length,
                temperature=kw.pop("temperature", 0.0),
                top_p=kw.pop("top_p", 0.95), alg=kw.pop("alg", "entropy"),
                alg_temp=kw.pop("alg_temp", 0.0), mask_id=self.mask_id,
                exact=kw.pop("exact", False),
                batch_mean_counts=kw.pop("batch_mean_counts", False),
                attn_mask=jnp.asarray(mask), key=key)
        out = np.asarray(out)
        latency = round((time.time() - t0) / b, 4)  # amortized per sample

        results = []
        for r in range(b):
            cont = out[r, p:]
            if truncate_at_eos and self.eos_token_id is not None:
                hits = np.nonzero(cont == self.eos_token_id)[0]
                if hits.size:
                    cont = cont[: int(hits[0])]
            text = self.tokenizer.decode(cont,
                                         skip_special_tokens=skip_special_tokens)
            if self.family == "dream" and self.tokenizer.eos_token:
                text = text.split(self.tokenizer.eos_token)[0]
            elif self.family == "diffucoder":
                text = text.split("<|dlm_pad|>")[0]
            results.append(GenResult(out[r], cont, text, latency))
        return results
