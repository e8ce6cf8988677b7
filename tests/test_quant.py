"""Weight-only int8 quantization (ops/quant.py).

Replaces the reference's multi-GPU ``device_map="auto"`` fallback for
models that overflow one device (Inference/chat_finetuned.py:138-144)
with single-chip int8 serving; these tests pin the numerics contract:
per-channel symmetric quantization, scale-commuting qdot, and end-to-end
forwards/samplers on quantized trees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.models import (
    get_config,
    init_params,
    make_forward_fn,
)
from ct_diffusionmodelbench_tpu.ops.quant import (
    dequantize_tensor,
    is_quantized,
    qdot,
    quantize_params,
    quantize_tensor,
    quantized_leaf_transform,
)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.key(0), (3, 64, 48), jnp.float32) * 0.3
    t = quantize_tensor(w)
    assert t["q"].dtype == jnp.int8 and t["q"].shape == w.shape
    assert t["s"].shape == (3, 48)
    deq = dequantize_tensor(t, jnp.float32)
    # Symmetric rounding: |w - deq| <= s/2 per output channel (+ bf16 slack
    # is absent here: dequantize in f32).
    err = np.abs(np.asarray(w - deq))
    bound = np.asarray(t["s"])[:, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_qdot_matches_dequantized_dot():
    key = jax.random.key(1)
    x = jax.random.normal(key, (5, 64), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (64, 32), jnp.float32) * 0.1
    t = quantize_tensor(w)
    want = jnp.dot(x, dequantize_tensor(t, jnp.float32),
                   preferred_element_type=jnp.float32)
    got = qdot(x, t)
    # Same math up to bf16 rounding of the dequantized operand.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # Plain arrays pass through to jnp.dot exactly.
    np.testing.assert_array_equal(
        np.asarray(qdot(x, w)),
        np.asarray(jnp.dot(x, w, preferred_element_type=jnp.float32)))


def _dequantize_tree(params):
    def walk(d):
        out = {}
        for k, v in d.items():
            if is_quantized(v):
                out[k] = dequantize_tensor(v, jnp.float32)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out
    return walk(params)


@pytest.mark.parametrize("preset", ["llada-tiny", "llada-moe-tiny",
                                    "dream-tiny"])
def test_quantized_forward_matches_dequantized_forward(preset):
    """forward(quantized tree) == forward(explicitly dequantized tree) up to
    the bf16 cast inside qdot — quantization plumbing adds no other change."""
    cfg = get_config(preset, dtype="float32")
    params = init_params(cfg, jax.random.key(3))
    qparams = quantize_params(params)
    assert is_quantized(qparams["blocks"]["wq"])
    fwd = make_forward_fn(cfg)
    ids = jax.random.randint(jax.random.key(4), (2, 16), 0, cfg.vocab_size)
    logits_q, _ = fwd(qparams, ids)
    logits_d, _ = fwd(_dequantize_tree(qparams), ids)
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits_d),
                               rtol=5e-2, atol=5e-2)
    # And the quantized forward stays close to the bf16/f32 original.
    logits_o, _ = fwd(params, ids)
    ref = np.abs(np.asarray(logits_o)).mean()
    err = np.abs(np.asarray(logits_q) - np.asarray(logits_o)).mean()
    assert err < 0.1 * ref + 0.1


def test_quantized_init_leaf_transform_structure():
    """Streaming init: leaves are quantized as they are built — the tree
    never holds the bf16 originals (the LLaDA-8B-on-one-chip path)."""
    cfg = get_config("llada-moe-tiny", dtype="bfloat16")
    qparams = init_params(cfg, jax.random.key(5),
                          leaf_transform=quantized_leaf_transform)
    blocks = qparams["blocks"]
    for k in ("wq", "wk", "wv", "wo", "we_gate", "we_up", "we_down"):
        assert is_quantized(blocks[k]), k
        assert blocks[k]["q"].dtype == jnp.int8
    assert not is_quantized(blocks["router"])
    assert not is_quantized(qparams["embed"])
    # Same seed, same leaves: streaming == quantize-after-init.
    want = quantize_params(init_params(cfg, jax.random.key(5)))
    got_q = np.asarray(qparams["blocks"]["we_gate"]["q"])
    want_q = np.asarray(want["blocks"]["we_gate"]["q"])
    np.testing.assert_array_equal(got_q, want_q)


def test_quantized_llada_generate_runs():
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    cfg = get_config("llada-tiny", dtype="float32")
    params = quantize_params(init_params(cfg, jax.random.key(6)))
    fwd = make_forward_fn(cfg)
    prompt = jnp.array([[5, 6, 7, 8]], jnp.int32)
    out = llada_generate(fwd, params, prompt, steps=4, gen_length=8,
                         block_length=4, mask_id=cfg.mask_token_id,
                         key=jax.random.key(7))
    toks = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert toks.shape[-1] == prompt.shape[-1] + 8
    assert (toks != cfg.mask_token_id).all()


# CPU XLA has no bf16 x bf16 -> f32 dot thunk; the kernels' working buffers
# follow the activation dtype, so interpret-mode tests run the same code in
# f32 while TPU runs bf16.
_ACT_DT = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _moe_inputs(key, n, k, e, d, fm):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (n, d), jnp.float32) * 0.5
    probs = jax.nn.softmax(jax.random.normal(ks[1], (n, k)), -1)
    idx = jax.random.randint(ks[2], (n, k), 0, e)
    wg = jax.random.normal(ks[3], (e, d, fm), jnp.float32) * 0.05
    wu = jax.random.normal(ks[4], (e, d, fm), jnp.float32) * 0.05
    wd = jax.random.normal(ks[5], (e, fm, d), jnp.float32) * 0.05
    return x, probs, idx, wg, wu, wd


def test_int8_grouped_ffn_matches_dequantized_dense():
    """The int8 manual-DMA grouped kernels (run-start cast + epilogue
    scale) against the one-hot dense einsum on the dequantized weights —
    interpret mode, lane-aligned shape."""
    from ct_diffusionmodelbench_tpu.models.moe import _experts_dense
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    n, k, e, d, fm = 48, 2, 4, 128, 128
    x, probs, idx, wg, wu, wd = _moe_inputs(jax.random.key(0), n, k, e, d, fm)
    qg, qu, qd = (quantize_tensor(w) for w in (wg, wu, wd))
    want = _experts_dense(
        x.astype(_ACT_DT), probs, idx,
        dequantize_tensor(qg), dequantize_tensor(qu), dequantize_tensor(qd))
    got = grouped_expert_ffn_pallas(
        x.astype(_ACT_DT), probs, idx, qg, qu, qd)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_int8_grouped_ffn_stacked_layer_index():
    """4-D int8 expert stacks indexed by a traced layer id — each layer's
    result matches the per-layer 3-D call."""
    from ct_diffusionmodelbench_tpu.ops.grouped_gemm_pallas import (
        grouped_expert_ffn_pallas)

    n, k, e, d, fm, L = 32, 2, 3, 128, 128, 2
    per_layer = [_moe_inputs(jax.random.key(i), n, k, e, d, fm)
                 for i in range(L)]
    x, probs, idx = per_layer[0][:3]
    qstack = {}
    for name, pos in (("wg", 3), ("wu", 4), ("wd", 5)):
        qs = [quantize_tensor(pl_[pos]) for pl_ in per_layer]
        qstack[name] = {"q": jnp.stack([t["q"] for t in qs]),
                        "s": jnp.stack([t["s"] for t in qs])}
    for li in range(L):
        want = grouped_expert_ffn_pallas(
            x.astype(_ACT_DT), probs, idx,
            quantize_tensor(per_layer[li][3]),
            quantize_tensor(per_layer[li][4]),
            quantize_tensor(per_layer[li][5]))
        got = grouped_expert_ffn_pallas(
            x.astype(_ACT_DT), probs, idx,
            qstack["wg"], qstack["wu"], qstack["wd"],
            layer_index=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_int8_checkpoint_roundtrip(tmp_path):
    """save_quantized_checkpoint -> load_quantized_checkpoint is
    bit-identical, and ModelRunner.from_dir auto-detects the format
    (the tools/quantize_ckpt.py serve-from-disk path)."""
    from ct_diffusionmodelbench_tpu.io.checkpoint import (
        is_quantized_checkpoint,
        load_quantized_checkpoint,
        save_quantized_checkpoint,
    )

    cfg = get_config("llada-moe-tiny", dtype="float32")
    qparams = quantize_params(init_params(cfg, jax.random.key(8)))
    d = tmp_path / "int8_ckpt"
    save_quantized_checkpoint(d, cfg, qparams)
    assert is_quantized_checkpoint(d)

    cfg2, loaded = load_quantized_checkpoint(d)
    assert cfg2.is_moe and cfg2.num_layers == cfg.num_layers
    want = jax.tree.leaves_with_path(qparams)
    got = {jax.tree_util.keystr(k): v
           for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    for path, leaf in want:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(got[key]),
                                      err_msg=key)

    from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner
    runner = ModelRunner.from_dir(d)
    assert runner.quant == "int8"
    assert is_quantized(runner.params["blocks"]["wq"])
    out = runner.generate_ids(np.array([3, 4, 5], np.int32), gen_length=8,
                              steps=4, block_length=4)
    assert out.shape[-1] == 11
