import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.sampling import llada_generate
from tests.reference_impl import np_llada_generate


def _np_logits_fn(fwd, params, avoid=None):
    def fn(x_np):
        logits, _ = fwd(params, jnp.asarray(x_np))
        return np.asarray(logits, dtype=np.float64)
    return fn


MASK = 500  # llada-tiny mask_token_id


def test_greedy_matches_numpy_reference(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = np.asarray(
        jax.random.randint(jax.random.key(21), (1, 9), 3, cfg.vocab_size - 2))
    ref = np_llada_generate(_np_logits_fn(fwd, params), prompt,
                            steps=12, gen_length=12, block_length=4, mask_id=MASK)
    ours = llada_generate(fwd, params, jnp.asarray(prompt),
                          steps=12, gen_length=12, block_length=4, mask_id=MASK)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_greedy_matches_reference_with_cfg(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = np.asarray(
        jax.random.randint(jax.random.key(22), (1, 7), 3, cfg.vocab_size - 2))
    ref = np_llada_generate(_np_logits_fn(fwd, params), prompt,
                            steps=8, gen_length=8, block_length=4, mask_id=MASK,
                            cfg_scale=1.5)
    ours = llada_generate(fwd, params, jnp.asarray(prompt),
                          steps=8, gen_length=8, block_length=4, mask_id=MASK,
                          cfg_scale=1.5)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_greedy_matches_reference_avoid_eos(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = np.asarray(
        jax.random.randint(jax.random.key(23), (1, 6), 3, cfg.vocab_size - 2))
    ref = np_llada_generate(_np_logits_fn(fwd, params), prompt,
                            steps=8, gen_length=8, block_length=2, mask_id=MASK,
                            avoid_eos=True, eos_token_id=2)
    ours = llada_generate(fwd, params, jnp.asarray(prompt),
                          steps=8, gen_length=8, block_length=2, mask_id=MASK,
                          avoid_eos=True, eos_token_id=2)
    np.testing.assert_array_equal(np.asarray(ours), ref)
    assert not (np.asarray(ours)[0, 6:] == 2).any()


def test_batched_rows_match_single(tiny_dense):
    """Each row of a batched greedy run equals its single-row run."""
    cfg, params, fwd = tiny_dense
    prompts = np.asarray(
        jax.random.randint(jax.random.key(24), (3, 8), 3, cfg.vocab_size - 2))
    batched = np.asarray(llada_generate(
        fwd, params, jnp.asarray(prompts),
        steps=8, gen_length=8, block_length=4, mask_id=MASK))
    for j in range(3):
        single = np.asarray(llada_generate(
            fwd, params, jnp.asarray(prompts[j:j + 1]),
            steps=8, gen_length=8, block_length=4, mask_id=MASK))
        np.testing.assert_array_equal(batched[j], single[0])


def test_block_order_is_semi_autoregressive(tiny_dense):
    """Steps in block b never unmask positions in later blocks: run with
    steps == num_blocks (1 step per block) and check every position filled."""
    cfg, params, fwd = tiny_dense
    prompt = jax.random.randint(jax.random.key(25), (1, 5), 3, cfg.vocab_size - 2)
    out = llada_generate(fwd, params, prompt,
                         steps=4, gen_length=16, block_length=4, mask_id=MASK)
    assert not (np.asarray(out) == MASK).any()


def test_deterministic_across_calls(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = jax.random.randint(jax.random.key(26), (1, 8), 3, cfg.vocab_size - 2)
    a = np.asarray(llada_generate(fwd, params, prompt, steps=8, gen_length=8,
                                  block_length=4, mask_id=MASK))
    b = np.asarray(llada_generate(fwd, params, prompt, steps=8, gen_length=8,
                                  block_length=4, mask_id=MASK))
    np.testing.assert_array_equal(a, b)


def test_temperature_seeded_reproducible(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = jax.random.randint(jax.random.key(27), (1, 8), 3, cfg.vocab_size - 2)
    kw = dict(steps=8, gen_length=8, block_length=4, mask_id=MASK, temperature=0.9)
    a = np.asarray(llada_generate(fwd, params, prompt, key=jax.random.key(7), **kw))
    b = np.asarray(llada_generate(fwd, params, prompt, key=jax.random.key(7), **kw))
    c = np.asarray(llada_generate(fwd, params, prompt, key=jax.random.key(8), **kw))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_invalid_configs_raise():
    from ct_diffusionmodelbench_tpu.sampling import LLaDASamplerConfig
    with pytest.raises(ValueError):
        LLaDASamplerConfig(gen_length=10, block_length=4)
    with pytest.raises(ValueError):
        LLaDASamplerConfig(steps=10, gen_length=16, block_length=4)
    with pytest.raises(NotImplementedError):
        LLaDASamplerConfig(remasking="entropy")


def test_confidence_dtype_parity_knob(tiny_dense):
    """bf16 confidence rounding (docs/PARITY.md §5) runs, is deterministic,
    and fills every mask."""
    cfg, params, fwd = tiny_dense
    prompt = jax.random.randint(jax.random.key(29), (1, 8), 3, cfg.vocab_size - 2)
    kw = dict(steps=8, gen_length=8, block_length=4, mask_id=MASK,
              confidence_dtype="bfloat16")
    a = np.asarray(llada_generate(fwd, params, prompt, **kw))
    b = np.asarray(llada_generate(fwd, params, prompt, **kw))
    np.testing.assert_array_equal(a, b)
    assert not (a == MASK).any()


def test_random_remasking_fills_all(tiny_dense):
    cfg, params, fwd = tiny_dense
    prompt = jax.random.randint(jax.random.key(28), (1, 8), 3, cfg.vocab_size - 2)
    out = llada_generate(fwd, params, prompt, steps=8, gen_length=8, block_length=4,
                         mask_id=MASK, remasking="random", key=jax.random.key(3))
    assert not (np.asarray(out) == MASK).any()
