"""Parameter/activation sharding rules (megatron-style TP + DP batching).

Rules over the stacked-layer pytree (models/transformer.py):

- Q/K/V projections column-parallel over attention heads, output projection
  row-parallel → one psum per attention block.
- MLP gate/up column-parallel over the hidden, down row-parallel → one psum
  per FFN.
- MoE: routed experts shard over ``model`` (expert parallelism); the router
  and shared expert replicate.
- Embedding and LM head shard over the vocab; norms replicate.
- Activations shard the batch over ``data``.

This is what the reference *claims* but never implements — its
``device_map="auto"`` places whole layers on different GPUs sequentially
(Training/Training_0to1k/train.py:116-122; SURVEY.md §2.4 P2).  Needed for
real deployments: LLaDA-8B bf16 (~16.3 GB) exceeds one v5e chip's 16 GB HBM,
so TP ≥ 2 is mandatory at full size (SURVEY.md §7 hard-part 7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ct_diffusionmodelbench_tpu.models.config import ModelConfig
from ct_diffusionmodelbench_tpu.models.transformer import forward
from ct_diffusionmodelbench_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, SEQ_AXIS, use_mesh)


def param_specs(cfg: ModelConfig) -> dict:
    """PartitionSpec pytree matching the params structure."""
    m = MODEL_AXIS
    blocks = {
        "attn_norm": P(),
        "wq": P(None, None, m),
        "wk": P(None, None, m),
        "wv": P(None, None, m),
        "wo": P(None, m, None),
        "ffn_norm": P(),
    }
    if cfg.attention_bias:
        blocks.update(bq=P(None, m), bk=P(None, m), bv=P(None, m))
    if cfg.qk_norm:
        blocks.update(q_norm=P(), k_norm=P())
    if cfg.is_moe:
        blocks.update(
            router=P(),
            we_gate=P(None, m, None, None),
            we_up=P(None, m, None, None),
            we_down=P(None, m, None, None),
        )
        if cfg.num_shared_experts:
            blocks.update(
                ws_gate=P(None, None, m),
                ws_up=P(None, None, m),
                ws_down=P(None, m, None),
            )
    else:
        blocks.update(
            w_gate=P(None, None, m),
            w_up=P(None, None, m),
            w_down=P(None, m, None),
        )
    specs = {
        "embed": P(m, None),
        "blocks": blocks,
        "final_norm": P(),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, m)
    return specs


def data_spec() -> P:
    return P(DATA_AXIS)


def shard_params(cfg: ModelConfig, params: dict, mesh: jax.sharding.Mesh) -> dict:
    """Place a parameter pytree onto the mesh per the TP rules."""
    specs = param_specs(cfg)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_sharded_forward(cfg: ModelConfig, mesh: jax.sharding.Mesh,
                         remat: bool = False, attn_impl: str = "auto"):
    """jit-compiled forward with TP param shardings + DP batch sharding.

    ``attn_impl='auto'`` uses the Pallas flash kernel on TPU via its
    shard_map wrapper (heads over 'model', batch over 'data'; falls back to
    the jnp reference if head counts don't divide the model axis) and the
    jnp reference elsewhere.
    Returns ``f(params, input_ids, attn_mask=None) -> (logits, aux)``.
    """
    cfg = cfg.replace(attn_impl=attn_impl)
    specs = param_specs(cfg)
    pshard = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                          is_leaf=lambda x: isinstance(x, P))
    dp = mesh.shape[DATA_AXIS]

    jitted = {}  # keyed by (logit_length or None, batch_divisible_by_dp)

    def _build(logit_length, batch_sharded, seq_sharded=False):
        # Batches not divisible by the data axis (single-prompt chat under
        # --dp, eval tail batches) replicate over 'data' instead of
        # sharding — TP stays active, DP is simply unused for that call.
        # Forcing P('data') unconditionally raised a pjit divisibility
        # error and killed the run.
        # Explicit per-dim entries: a P() batch spec must not collapse and
        # shift the seq axis onto the batch dim (dim positions are
        # load-bearing; None = replicated batch for non-divisible tails).
        batch_entry = DATA_AXIS if batch_sharded else None
        # Sequence-parallel meshes keep the sequence dim sharded through the
        # forward (ring attention handles the cross-shard softmax).
        seq_ax = SEQ_AXIS if seq_sharded else None
        dshard = NamedSharding(mesh, P(batch_entry, seq_ax))
        # Sliced-head outputs ([B, logit_length, V]) are block-sized, not
        # ring-aligned — replicate their seq dim.
        logits_shard = NamedSharding(
            mesh, P(batch_entry, seq_ax if logit_length is None else None,
                    MODEL_AXIS))

        @partial(
            jax.jit,
            in_shardings=(pshard, dshard, None, None),
            out_shardings=(logits_shard, NamedSharding(mesh, P())),
        )
        def fn(params, input_ids, attn_mask, logit_start):
            with use_mesh(mesh):
                logits, aux = forward(cfg, params, input_ids,
                                      attn_mask=attn_mask, remat=remat,
                                      logit_start=logit_start,
                                      logit_length=logit_length)
            logits = jax.lax.with_sharding_constraint(logits, logits_shard)
            return logits, aux
        return fn

    sp = dict(mesh.shape).get(SEQ_AXIS, 1)

    def wrapper(params, input_ids, attn_mask=None, logit_start=None,
                logit_length=None):
        ll = logit_length if logit_start is not None else None
        key = (ll, input_ids.shape[0] % dp == 0,
               sp > 1 and input_ids.shape[1] % sp == 0)
        if key not in jitted:
            jitted[key] = _build(*key)
        return jitted[key](params, input_ids, attn_mask,
                           logit_start if ll is not None else None)

    return wrapper
