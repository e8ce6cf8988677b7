"""Dual-KV-cache accelerated decode (models/block_cache.py).

Correctness anchors (see the module docstring's approximation contract):

1. **1-layer exactness** — with a single transformer layer, frozen
   positions' K/V depend only on their own embeddings, so the cached step
   is mathematically identical to the full forward: cache-mode tokens must
   EQUAL exact-sampler tokens.
2. **steps_per_block == 1 degeneracy** — every step is a refresh, so the
   mode degrades to the exact sampler for ANY depth.
3. **Cached-step logits vs full forward** — direct numerical check of the
   block-only pass against forward() on the same state (1 layer).
4. Deep-model smoke: decode completes, all masks resolved, and the
   unsupported configs raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn
from ct_diffusionmodelbench_tpu.models.block_cache import (
    forward_cached_step,
    forward_refresh,
    make_cached_fns,
)
from ct_diffusionmodelbench_tpu.sampling import llada_generate


def _setup(num_layers, seed=0):
    cfg = get_config("llada-tiny").replace(num_layers=num_layers,
                                           dtype="float32")
    params = init_params(cfg, jax.random.key(seed))
    fwd = make_forward_fn(cfg)
    return cfg, params, fwd


def _gen(cfg, params, fwd, *, block_cache, attn_mask=None, temperature=0.0,
         steps=8, gen_length=32, block_length=8, B=2, prompt_len=16):
    prompt = jax.random.randint(jax.random.key(7), (B, prompt_len), 0,
                                cfg.vocab_size - 2)
    cached = make_cached_fns(cfg) if block_cache else None
    return np.asarray(llada_generate(
        fwd, params, prompt, steps=steps, gen_length=gen_length,
        block_length=block_length, temperature=temperature,
        mask_id=cfg.mask_token_id, block_cache=block_cache,
        cached_fns=cached, attn_mask=attn_mask, key=jax.random.key(3)))


def test_one_layer_exact():
    cfg, params, fwd = _setup(num_layers=1)
    exact = _gen(cfg, params, fwd, block_cache=False)
    cached = _gen(cfg, params, fwd, block_cache=True)
    np.testing.assert_array_equal(exact, cached)


def test_one_layer_exact_with_mask():
    cfg, params, fwd = _setup(num_layers=1)
    B, P = 2, 16
    mask = np.ones((B, P), np.int32)
    mask[0, :5] = 0  # row 0 left-padded
    exact = _gen(cfg, params, fwd, block_cache=False, attn_mask=jnp.asarray(mask))
    cached = _gen(cfg, params, fwd, block_cache=True, attn_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(exact, cached)


def test_spb_one_degenerates_to_exact():
    # steps == num_blocks → steps_per_block 1 → every step refreshes: equal
    # for a DEEP model too.
    cfg, params, fwd = _setup(num_layers=3)
    kw = dict(steps=4, gen_length=32, block_length=8)
    exact = _gen(cfg, params, fwd, block_cache=False, **kw)
    cached = _gen(cfg, params, fwd, block_cache=True, **kw)
    np.testing.assert_array_equal(exact, cached)


def test_cached_step_logits_match_forward_one_layer():
    cfg, params, fwd = _setup(num_layers=1)
    B, S, bl, bs = 2, 24, 8, 12
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    logits_full, _ = fwd(params, ids, None)
    ref = np.asarray(logits_full[:, bs:bs + bl])

    _, kc, vc = forward_refresh(cfg, params, ids, None, bs, bl)
    # Perturb the block's tokens: the cached step must recompute them fresh.
    new_blk = jax.random.randint(jax.random.key(2), (B, bl), 0, cfg.vocab_size)
    ids2 = ids.at[:, bs:bs + bl].set(new_blk)
    logits2_full, _ = fwd(params, ids2, None)
    got = np.asarray(forward_cached_step(cfg, params, new_blk, bs, kc, vc, None))
    np.testing.assert_allclose(got, np.asarray(logits2_full[:, bs:bs + bl]),
                               rtol=2e-4, atol=2e-4)


def test_deep_model_decodes_all_masks():
    cfg, params, fwd = _setup(num_layers=3)
    out = _gen(cfg, params, fwd, block_cache=True, steps=8)
    assert out.shape == (2, 16 + 32)
    assert not (out[:, 16:] == cfg.mask_token_id).any()


def test_temperature_path_runs():
    cfg, params, fwd = _setup(num_layers=2)
    out = _gen(cfg, params, fwd, block_cache=True, temperature=0.7)
    assert not (out[:, 16:] == cfg.mask_token_id).any()


def test_unsupported_configs_raise():
    from ct_diffusionmodelbench_tpu.sampling.llada import LLaDASamplerConfig

    with pytest.raises(NotImplementedError):
        make_cached_fns(get_config("dream-tiny"))
    with pytest.raises(NotImplementedError):
        LLaDASamplerConfig(block_cache=True, cfg_scale=1.0)


def test_runner_accel_flag():
    from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

    runner = ModelRunner.random_init("llada-tiny", accel="block-cache")
    res = runner.generate("hello world", gen_length=16, steps=4,
                          block_length=8)
    assert len(res.continuation_ids) == 16

    with pytest.raises(NotImplementedError):
        ModelRunner.random_init("dream-tiny", accel="block-cache")
    with pytest.raises(ValueError):
        ModelRunner.random_init("llada-tiny", accel="nope")


# ---------------------------------------------------------------------------
# Confidence-threshold parallel decoding (sampling/llada.py
# parallel_threshold) — the second Fast-dLLM technique.
# ---------------------------------------------------------------------------

def test_parallel_threshold_above_one_equals_one_per_step():
    # A threshold no probability can clear forces exactly one (the most
    # confident) unmask per step — identical to the exact sampler run with
    # steps == gen_length (schedule of all-ones, same greedy top-1 pick).
    cfg, params, fwd = _setup(num_layers=2)
    exact = _gen(cfg, params, fwd, block_cache=False,
                 steps=32, gen_length=32, block_length=8)
    par = np.asarray(llada_generate(
        fwd, params,
        jax.random.randint(jax.random.key(7), (2, 16), 0, cfg.vocab_size - 2),
        steps=32, gen_length=32, block_length=8, temperature=0.0,
        mask_id=cfg.mask_token_id, parallel_threshold=1.5,
        key=jax.random.key(3)))
    np.testing.assert_array_equal(exact, par)


def test_parallel_threshold_zero_unmasks_block_per_step():
    # Threshold 0: every masked position clears it → each block resolves in
    # one forward.
    cfg, params, fwd = _setup(num_layers=2)
    out = np.asarray(llada_generate(
        fwd, params,
        jax.random.randint(jax.random.key(7), (2, 16), 0, cfg.vocab_size - 2),
        steps=8, gen_length=32, block_length=8, temperature=0.0,
        mask_id=cfg.mask_token_id, parallel_threshold=0.0,
        key=jax.random.key(3)))
    assert not (out[:, 16:] == cfg.mask_token_id).any()


def test_parallel_threshold_with_cache():
    cfg, params, fwd = _setup(num_layers=2)
    cached = make_cached_fns(cfg)
    out = np.asarray(llada_generate(
        fwd, params,
        jax.random.randint(jax.random.key(7), (2, 16), 0, cfg.vocab_size - 2),
        steps=8, gen_length=32, block_length=8, temperature=0.0,
        mask_id=cfg.mask_token_id, parallel_threshold=0.9,
        block_cache=True, cached_fns=cached, key=jax.random.key(3)))
    assert not (out[:, 16:] == cfg.mask_token_id).any()


def test_parallel_threshold_runner_flag():
    from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

    runner = ModelRunner.random_init("llada-tiny")
    runner.parallel_threshold = 0.5
    res = runner.generate("theorem", gen_length=16, steps=4, block_length=8)
    assert len(res.continuation_ids) == 16
    assert not (res.continuation_ids == runner.mask_id).any()


def test_runner_quant_composes_with_block_cache():
    """--quant int8 + --accel block-cache together: the cached forward's
    qdot path accepts quantized leaves (models/block_cache.py), so the two
    opt-in serving modes compose on one chip."""
    from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

    runner = ModelRunner.random_init("llada-tiny", accel="block-cache",
                                     quant="int8")
    from ct_diffusionmodelbench_tpu.ops.quant import is_quantized
    assert is_quantized(runner.params["blocks"]["wq"])
    res = runner.generate("hello world", gen_length=16, steps=4,
                          block_length=8)
    assert len(res.continuation_ids) == 16

    # quant + mesh is the documented exclusion (TP bf16 is the exact path)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        ModelRunner.random_init("llada-tiny", quant="int8", tp=2)
