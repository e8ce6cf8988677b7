"""Pipeline parallelism (GPipe over the 'stage' mesh axis) vs the dense
forward.

The reference's only analogue is device_map="auto" sequential layer
placement (SURVEY §2.4 P3 — one GPU computing at a time); these tests pin
the real pipeline: logits exactly equal the single-device forward, gradients
flow (reverse schedule via jax.grad), DP x PP composes, and MoE stages run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.models import (
    get_config, init_params, make_forward_fn)
from ct_diffusionmodelbench_tpu.parallel.pipeline import (
    make_pp_forward, make_pp_mesh, shard_params_pp)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _setup(name="llada-tiny", layers=4, seed=0):
    cfg = get_config(name, dtype="float32").replace(num_layers=layers)
    params = init_params(cfg, jax.random.key(seed))
    ids = jax.random.randint(jax.random.key(seed + 1), (4, 32), 3,
                             cfg.vocab_size - 2)
    return cfg, params, ids


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 1)])
def test_pp_logits_match_dense(stages, micro):
    cfg, params, ids = _setup(layers=4)
    want, _ = make_forward_fn(cfg)(params, ids)

    mesh = make_pp_mesh(stages)
    pp_params = shard_params_pp(cfg, params, mesh)
    pp = jax.jit(make_pp_forward(cfg, mesh, num_microbatches=micro))
    got, _ = pp(pp_params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_composes_with_dp():
    cfg, params, ids = _setup(layers=4)
    want, _ = make_forward_fn(cfg)(params, ids)

    mesh = make_pp_mesh(stages=4, data=2)
    pp_params = shard_params_pp(cfg, params, mesh)
    pp = jax.jit(make_pp_forward(cfg, mesh, num_microbatches=2))
    got, _ = pp(pp_params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_moe_stage_runs_and_matches():
    cfg, params, ids = _setup(name="llada-moe-tiny", layers=4, seed=2)
    want, _ = make_forward_fn(cfg)(params, ids)

    mesh = make_pp_mesh(stages=2)
    pp_params = shard_params_pp(cfg, params, mesh)
    pp = jax.jit(make_pp_forward(cfg, mesh, num_microbatches=2))
    got, aux = pp(pp_params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_pp_gradients_match_dense():
    """jax.grad through the pipeline = the reverse GPipe schedule; grads on
    every layer's weights must equal the dense forward's."""
    cfg, params, ids = _setup(layers=4)
    fwd = make_forward_fn(cfg)

    def loss_dense(p):
        logits, _ = fwd(p, ids)
        return jnp.mean(jnp.tanh(logits[..., :64]))

    mesh = make_pp_mesh(stages=4)
    pp = make_pp_forward(cfg, mesh, num_microbatches=2)

    def loss_pp(p):
        logits, _ = pp(p, ids)
        return jnp.mean(jnp.tanh(logits[..., :64]))

    g_dense = jax.grad(loss_dense)(params)
    pp_params = shard_params_pp(cfg, params, mesh)
    g_pp = jax.jit(jax.grad(loss_pp))(pp_params)
    flat_d = jax.tree_util.tree_leaves_with_path(g_dense)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf),
            rtol=5e-5, atol=5e-6, err_msg=str(path))


@pytest.mark.parametrize("name,stages,tp,data", [
    ("llada-tiny", 2, 2, 1),    # plain GQA dense
    ("llada-tiny", 2, 4, 1),    # wider TP than heads-per-stage is fine
    ("llada-tiny", 2, 2, 2),    # full 3-axis dp x pp x tp
    ("dream-tiny", 2, 2, 1),    # attention_bias + qk_norm param slicing
])
def test_pp_tp_logits_match_dense(name, stages, tp, data):
    """TP-within-stage (megatron column/row split + in-block psum over the
    'model' mesh axis) against the dense forward.  The reference has no
    tensor-within-pipeline analogue at all — device_map='auto' places whole
    layers (Training_0to1k/train.py:116-122)."""
    cfg, params, ids = _setup(name=name, layers=4)
    want, _ = make_forward_fn(cfg)(params, ids)

    mesh = make_pp_mesh(stages, data=data, model=tp)
    pp_params = shard_params_pp(cfg, params, mesh)
    pp = jax.jit(make_pp_forward(cfg, mesh, num_microbatches=2))
    got, _ = pp(pp_params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert (np.argmax(np.asarray(got), -1)
            == np.argmax(np.asarray(want), -1)).all()


def test_pp_tp_gradients_match_dense():
    """Reverse schedule through the TP psums: psum's transpose is identity
    broadcast, so column/row shards must receive exactly their slice of the
    dense gradient."""
    cfg, params, ids = _setup(layers=4)
    fwd = make_forward_fn(cfg)

    def loss_dense(p):
        logits, _ = fwd(p, ids)
        return jnp.mean(jnp.tanh(logits[..., :64]))

    mesh = make_pp_mesh(2, model=2)
    pp = make_pp_forward(cfg, mesh, num_microbatches=2)

    def loss_pp(p):
        logits, _ = pp(p, ids)
        return jnp.mean(jnp.tanh(logits[..., :64]))

    g_dense = jax.grad(loss_dense)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(shard_params_pp(cfg, params, mesh))
    flat_d = jax.tree_util.tree_leaves_with_path(g_dense)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf),
            rtol=5e-5, atol=5e-6, err_msg=str(path))


@pytest.mark.parametrize("name,tp", [
    ("llada-tiny", 1), ("llada-tiny", 2), ("llada-moe-tiny", 1)])
def test_pp_masked_batch_matches_dense(name, tp):
    """Left-padded prompts through the pipeline: per-row RoPE restart means
    cos/sin/mask differ per microbatch, so each stage must select the slice
    of the microbatch it is processing that tick (reference analogue:
    batched eval left-pads, bench_models/llada.py tokenizer padding)."""
    cfg, params, ids = _setup(name=name, layers=4)
    mask = np.ones(ids.shape, np.int32)
    mask[0, :7] = 0   # rows with different left-pad lengths
    mask[2, :3] = 0
    mask = jnp.asarray(mask)
    want, _ = make_forward_fn(cfg)(params, ids, attn_mask=mask)

    mesh = make_pp_mesh(2, model=tp)
    pp_params = shard_params_pp(cfg, params, mesh)
    pp = jax.jit(make_pp_forward(cfg, mesh, num_microbatches=2))
    got, _ = pp(pp_params, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_tp_validates():
    cfg, params, ids = _setup(name="llada-moe-tiny", layers=4)
    mesh = make_pp_mesh(2, model=2)
    with pytest.raises(ValueError, match="dense blocks only"):
        make_pp_forward(cfg, mesh, num_microbatches=2)

    dense_cfg, _, _ = _setup(layers=4)
    bad = dense_cfg.replace(num_heads=3, num_kv_heads=3)
    with pytest.raises(ValueError, match="must divide"):
        make_pp_forward(bad, mesh, num_microbatches=2)


def test_pp_validates_divisibility():
    cfg, params, ids = _setup(layers=4)
    mesh = make_pp_mesh(stages=4)
    with pytest.raises(ValueError):
        make_pp_forward(cfg.replace(num_layers=3), mesh, num_microbatches=2)
    pp = make_pp_forward(cfg, mesh, num_microbatches=3)
    with pytest.raises(ValueError):
        pp(shard_params_pp(cfg, params, mesh), ids)  # 4 % 3 != 0
