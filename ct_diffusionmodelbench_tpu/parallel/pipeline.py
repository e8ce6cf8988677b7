"""Pipeline parallelism — GPipe-style microbatched stages over a mesh axis.

The reference's closest analogue is ``device_map="auto"`` sequential layer
placement (Training/Training_0to1k/train.py:116-122) — layers spread across
GPUs but only ONE device computes at a time.  This module is the real thing,
built the TPU way on top of this repo's stacked-layer parameter pytree
(models/transformer.py): the leading ``[L, ...]`` layer axis of every block
leaf shards over a ``stage`` mesh axis, so each device physically holds only
its own L/S layers, and a ``shard_map`` runs the classic GPipe schedule —
``M`` microbatches flow through ``S`` stages over ``M + S - 1`` ticks, with a
neighbor ``ppermute`` handing activations to the next stage each tick.  Fill
and drain bubbles execute masked garbage (standard GPipe; efficiency
``M / (M + S - 1)``).

Differentiable end-to-end (scan + ppermute + psum), so ``jax.grad`` through
``pp_forward`` yields the reverse pipeline schedule automatically — the
module trains, not just serves.

Composability: the mesh is ``(data, stage, model)`` — batch sharding over
``data`` composes freely since the pipeline is batch-elementwise, and
``model > 1`` adds megatron tensor parallelism WITHIN each stage for dense
blocks: wq/wk/wv/w_gate/w_up shard column-parallel (whole heads / FFN
columns per shard), wo/w_down row-parallel, and the stage body psums the
two row-parallel partials before their residual adds
(models/transformer.py::_block_forward ``tp_axis``).  MoE stages keep
``model == 1`` here — expert parallelism lives on the GSPMD path
(parallel/sharding.py), which a pipeline stage cannot nest.

MoE aux loss note: the load-balancing loss is computed per microbatch and
averaged, where the dense forward computes it over the full batch — equal in
expectation, not bitwise (the standard GPipe approximation); tests pin the
logits exactly and the aux loss to a tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ct_diffusionmodelbench_tpu.models.config import ModelConfig
from ct_diffusionmodelbench_tpu.models.layers import rms_norm, rope_angles
from ct_diffusionmodelbench_tpu.models.transformer import (
    _block_forward, token_positions)
from ct_diffusionmodelbench_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

STAGE_AXIS = "stage"


def make_pp_mesh(stages: int, data: int = 1,
                 model: int = 1) -> jax.sharding.Mesh:
    """(data, stage, model) mesh for pipeline runs; ``model > 1`` turns on
    TP-within-stage (dense blocks only, see module doc)."""
    n = len(jax.devices())
    if data * stages * model > n:
        raise ValueError(f"mesh {data}x{stages}x{model} needs "
                         f"{data*stages*model} devices, have {n}")
    auto = (jax.sharding.AxisType.Auto,) * 3
    return jax.make_mesh((data, stages, model),
                         (DATA_AXIS, STAGE_AXIS, MODEL_AXIS),
                         axis_types=auto,
                         devices=jax.devices()[: data * stages * model])


def _mesh_tp(mesh: jax.sharding.Mesh) -> int:
    return dict(mesh.shape).get(MODEL_AXIS, 1)


def pp_param_specs(cfg: ModelConfig, tp: int = 1) -> dict:
    """Blocks shard their leading layer axis over 'stage'; everything else
    (embed, final norm, LM head) replicates — stages 0 and S-1 use them.

    ``tp > 1`` (dense blocks only): QKV and FFN up-projections additionally
    shard their OUTPUT dim over 'model' (column-parallel — each shard owns
    whole heads / FFN columns), wo/w_down their INPUT dim (row-parallel);
    norms and head-dim vectors replicate over 'model'."""
    col = P(STAGE_AXIS, None, MODEL_AXIS) if tp > 1 else P(STAGE_AXIS)
    row = P(STAGE_AXIS, MODEL_AXIS, None) if tp > 1 else P(STAGE_AXIS)
    vec = P(STAGE_AXIS, MODEL_AXIS) if tp > 1 else P(STAGE_AXIS)
    blocks = {k: P(STAGE_AXIS) for k in (
        "attn_norm", "ffn_norm", "q_norm", "k_norm",
        "router", "we_gate", "we_up", "we_down",
        "ws_gate", "ws_up", "ws_down",
    )}
    blocks.update({k: col for k in ("wq", "wk", "wv", "w_gate", "w_up")})
    blocks.update({k: row for k in ("wo", "w_down")})
    blocks.update({k: vec for k in ("bq", "bk", "bv")})
    specs = {"embed": P(), "blocks": blocks, "final_norm": P()}
    return specs


def shard_params_pp(cfg: ModelConfig, params: dict,
                    mesh: jax.sharding.Mesh) -> dict:
    specs = pp_param_specs(cfg, tp=_mesh_tp(mesh))
    blocks = {k: jax.device_put(v, NamedSharding(mesh, specs["blocks"][k]))
              for k, v in params["blocks"].items()}
    out = {
        "embed": jax.device_put(params["embed"], NamedSharding(mesh, P())),
        "blocks": blocks,
        "final_norm": jax.device_put(params["final_norm"],
                                     NamedSharding(mesh, P())),
    }
    if "lm_head" in params:
        out["lm_head"] = jax.device_put(params["lm_head"],
                                        NamedSharding(mesh, P()))
    return out


def make_pp_forward(cfg: ModelConfig, mesh: jax.sharding.Mesh,
                    num_microbatches: int, remat: bool = False):
    """Build ``f(params, input_ids) -> (logits, aux)`` running the block
    stack as a GPipe pipeline over the mesh's 'stage' axis.

    Constraints (checked): num_layers % stages == 0, batch % (data *
    num_microbatches) == 0.  ``attn_mask`` ([B, S], 1 = real) is supported
    for left-padded batched eval: RoPE positions restart per row
    (token_positions), and each stage selects the cos/sin/mask slice of the
    microbatch it is processing that tick.
    """
    stages = mesh.shape[STAGE_AXIS]
    tp = _mesh_tp(mesh)
    m = num_microbatches
    if cfg.num_layers % stages:
        raise ValueError(
            f"num_layers={cfg.num_layers} must divide by stages={stages}")
    if tp > 1:
        if cfg.is_moe:
            raise ValueError(
                "TP-within-stage supports dense blocks only — MoE expert "
                "parallelism lives on the GSPMD path (parallel/sharding.py)")
        if (cfg.num_heads % tp or cfg.num_kv_heads % tp
                or cfg.intermediate_size % tp):
            raise ValueError(
                f"tp={tp} must divide num_heads={cfg.num_heads}, "
                f"num_kv_heads={cfg.num_kv_heads} and "
                f"intermediate_size={cfg.intermediate_size}")

    # Dispatch attention directly inside the stage body (current_mesh() is
    # deliberately NOT set here: the mesh axes are already manual inside
    # shard_map, and the dispatcher's shard_map wrappers must not nest).
    stage_cfg = cfg if cfg.attn_impl != "auto" else cfg.replace(
        attn_impl="reference" if jax.default_backend() != "tpu" else "auto")
    if tp > 1:
        # The stage body sees the PER-SHARD model: whole heads and FFN
        # columns, so attention and swiglu run unchanged on local slices;
        # _block_forward psums the row-parallel partials over 'model'.
        stage_cfg = stage_cfg.replace(
            num_heads=cfg.num_heads // tp,
            num_kv_heads=cfg.num_kv_heads // tp,
            intermediate_size=cfg.intermediate_size // tp)

    block_fn = partial(_block_forward, stage_cfg,
                       tp_axis=MODEL_AXIS if tp > 1 else None)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def run_local_layers(blocks_local, x, cos, sin, mask):
        def body(carry, lp):
            x, aux = carry
            x, aux_l = block_fn(x, lp, cos, sin, mask)
            return (x, aux + aux_l), None
        (x, aux), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.float32)), blocks_local)
        return x, aux

    def stage_loop(blocks_local, xs, cos, sin, mask=None):
        """Per-device GPipe schedule.  xs: [M, mb, S, D] microbatch stack
        (replicated over 'stage'); blocks_local: this stage's layers.

        ``cos``/``sin`` are microbatch-invariant ([mb, S, ...], the no-mask
        arange positions) unless ``mask`` is given — then all three arrive
        as full [M, ...] stacks and each stage selects the slice for the
        microbatch it is processing THIS tick (index t - sid), since with
        left-padded prompts RoPE positions differ per row."""
        sid = jax.lax.axis_index(STAGE_AXIS)
        ticks = m + stages - 1
        fwd_perm = [(i, i + 1) for i in range(stages - 1)]

        recv0 = jnp.zeros_like(xs[0])
        out0 = jnp.zeros_like(xs)
        aux0 = jnp.zeros((), jnp.float32)

        def tick(carry, t):
            recv, outputs, aux = carry
            ridx = jnp.clip(t, 0, m - 1)
            x_in = jnp.where(sid == 0,
                             jax.lax.dynamic_index_in_dim(xs, ridx, 0,
                                                          keepdims=False),
                             recv)
            if mask is None:
                cos_t, sin_t, mask_t = cos, sin, None
            else:
                midx = jnp.clip(t - sid, 0, m - 1)
                pick = lambda a: jax.lax.dynamic_index_in_dim(
                    a, midx, 0, keepdims=False)
                cos_t, sin_t, mask_t = pick(cos), pick(sin), pick(mask)
            y, aux_t = run_local_layers(blocks_local, x_in, cos_t, sin_t,
                                        mask_t)
            valid = jnp.logical_and(sid <= t, t < sid + m)
            aux = aux + jnp.where(valid, aux_t, 0.0)
            # Last stage banks its result at microbatch index t-(S-1);
            # non-final ticks (and every other stage) re-write the existing
            # row so the predicated update is shape-static.
            widx = jnp.clip(t - (stages - 1), 0, m - 1)
            old = jax.lax.dynamic_index_in_dim(outputs, widx, 0,
                                               keepdims=False)
            upd = jnp.where(t >= stages - 1, y, old)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, upd,
                                                          widx, 0)
            recv = jax.lax.ppermute(y, STAGE_AXIS, fwd_perm)
            return (recv, outputs, aux), None

        (recv, outputs, aux), _ = jax.lax.scan(
            tick, (recv0, out0, aux0), jnp.arange(ticks))
        # Only the last stage's banked outputs are real: zero the rest and
        # all-reduce (one [B, S, D] psum — final hidden states, not logits).
        last = (sid == stages - 1).astype(outputs.dtype)
        outputs = jax.lax.psum(outputs * last, STAGE_AXIS)
        # Sum over stages (each holds distinct layers); mean over data
        # shards (each saw distinct rows) so the P() out-spec's replication
        # assumption actually holds under DP.
        aux = jax.lax.psum(aux, STAGE_AXIS)
        aux = jax.lax.pmean(aux, DATA_AXIS)
        return outputs, aux

    if tp > 1:
        all_specs = pp_param_specs(cfg, tp=tp)["blocks"]
        keys = ["attn_norm", "wq", "wk", "wv", "wo", "ffn_norm"]
        if cfg.attention_bias:
            keys += ["bq", "bk", "bv"]
        if cfg.qk_norm:
            keys += ["q_norm", "k_norm"]
        keys += ["w_gate", "w_up", "w_down"]  # tp>1 is dense-only
        blocks_spec = {k: all_specs[k] for k in keys}
    else:
        blocks_spec = P(STAGE_AXIS)

    smap = jax.shard_map(
        stage_loop,
        mesh=mesh,
        in_specs=(blocks_spec, P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(None, DATA_AXIS), P()),
        check_vma=False,
    )
    smap_masked = jax.shard_map(
        stage_loop,
        mesh=mesh,
        in_specs=(blocks_spec, P(None, DATA_AXIS), P(None, DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=(P(None, DATA_AXIS), P()),
        check_vma=False,
    )

    def pp_forward(params, input_ids, attn_mask=None):
        b, s = input_ids.shape
        if b % m:
            raise ValueError(f"batch={b} must divide by microbatches={m}")
        mb = b // m
        x = jnp.take(params["embed"], input_ids, axis=0)
        positions = token_positions(attn_mask, b, s)
        cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)

        xs = x.reshape(m, mb, s, -1)
        if attn_mask is None:
            cos_mb = cos.reshape(m, mb, s, -1)[0]
            sin_mb = sin.reshape(m, mb, s, -1)[0]
            hidden, aux = smap(params["blocks"], xs, cos_mb, sin_mb)
        else:
            hidden, aux = smap_masked(
                params["blocks"], xs,
                cos.reshape(m, mb, s, -1), sin.reshape(m, mb, s, -1),
                attn_mask.reshape(m, mb, s))
        hidden = hidden.reshape(b, s, -1)

        hidden = rms_norm(hidden, params["final_norm"], cfg.norm_eps)
        head = params.get("lm_head")
        if head is None:
            head = params["embed"].T
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        if cfg.logit_shift:
            logits = jnp.concatenate([logits[:, :1], logits[:, :-1]], axis=1)
        # Mean over layers like transformer.forward; microbatch aux values
        # are additionally averaged (GPipe approximation, see module doc).
        aux = aux / max(cfg.num_layers, 1) / m
        return logits, aux

    return pp_forward
