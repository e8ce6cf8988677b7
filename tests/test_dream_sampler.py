import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.sampling import dream_generate
from ct_diffusionmodelbench_tpu.sampling.dream import (
    DreamSamplerConfig,
    _filter_and_sample,
)

MASK = 500  # dream-tiny mask_token_id


def test_all_algs_fill_every_mask(tiny_dream):
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(30), (2, 6), 3, cfg.vocab_size - 2)
    for alg in ("origin", "maskgit_plus", "topk_margin", "entropy"):
        seq, _ = dream_generate(fwd, params, prompt, steps=6, max_new_tokens=12,
                                temperature=0.4, top_p=0.95, alg=alg,
                                mask_id=MASK, key=jax.random.key(1))
        out = np.asarray(seq)
        assert not (out == MASK).any(), alg
        np.testing.assert_array_equal(out[:, :6], np.asarray(prompt))


def test_prompt_never_modified(tiny_dream):
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(31), (1, 8), 3, cfg.vocab_size - 2)
    seq, _ = dream_generate(fwd, params, prompt, steps=4, max_new_tokens=8,
                            temperature=0.0, alg="entropy", mask_id=MASK)
    np.testing.assert_array_equal(np.asarray(seq)[0, :8], np.asarray(prompt)[0])


def test_history_records_progressive_unmasking(tiny_dream):
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(32), (1, 5), 3, cfg.vocab_size - 2)
    seq, hist = dream_generate(fwd, params, prompt, steps=5, max_new_tokens=10,
                               temperature=0.0, alg="entropy", mask_id=MASK,
                               output_history=True)
    h = np.asarray(hist)
    assert h.shape == (5, 1, 15)
    remaining = [(h[i] == MASK).sum() for i in range(5)]
    assert remaining == sorted(remaining, reverse=True)
    assert remaining[-1] == 0
    np.testing.assert_array_equal(h[-1], np.asarray(seq))


def test_greedy_is_deterministic(tiny_dream):
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(33), (1, 6), 3, cfg.vocab_size - 2)
    kw = dict(steps=4, max_new_tokens=8, temperature=0.0, alg="entropy", mask_id=MASK)
    a, _ = dream_generate(fwd, params, prompt, **kw)
    b, _ = dream_generate(fwd, params, prompt, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_filter_and_sample_greedy_is_argmax():
    sc = DreamSamplerConfig(temperature=0.0, top_p=None, alg="maskgit_plus", steps=4)
    logits = jax.random.normal(jax.random.key(34), (1, 6, 40)) * 3
    x0, conf = _filter_and_sample(logits, sc, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(jnp.argmax(logits, -1)))
    ref_conf = np.max(np.asarray(jax.nn.softmax(logits, -1)), axis=-1)
    np.testing.assert_allclose(np.asarray(conf), ref_conf, rtol=1e-5)


def test_filter_and_sample_entropy_score():
    sc = DreamSamplerConfig(temperature=0.0, top_p=None, alg="entropy", steps=4)
    logits = jax.random.normal(jax.random.key(35), (1, 4, 25))
    _, conf = _filter_and_sample(logits, sc, jax.random.key(0))
    p = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    ref = np.sum(p * np.log(p + 1e-10), axis=-1)
    np.testing.assert_allclose(np.asarray(conf), ref, rtol=1e-4)


def test_top_p_restricts_support():
    """With a peaked distribution and small top_p, sampling must always pick
    the dominant token."""
    sc = DreamSamplerConfig(temperature=1.0, top_p=0.5, alg="maskgit_plus", steps=4)
    logits = jnp.zeros((1, 1, 10)).at[0, 0, 3].set(5.0)
    picks = set()
    for i in range(50):
        x0, _ = _filter_and_sample(logits, sc, jax.random.key(i))
        picks.add(int(x0[0, 0]))
    assert picks == {3}


def test_top_k_restricts_support():
    sc = DreamSamplerConfig(temperature=1.0, top_p=None, top_k=2, alg="maskgit_plus", steps=4)
    logits = jnp.array([[[1.0, 0.9, -5.0, -5.0, -5.0]]])
    picks = set()
    for i in range(60):
        x0, _ = _filter_and_sample(logits, sc, jax.random.key(i))
        picks.add(int(x0[0, 0]))
    assert picks <= {0, 1} and len(picks) == 2


def test_invalid_alg_raises():
    with pytest.raises(NotImplementedError):
        DreamSamplerConfig(alg="not-an-alg")


def test_alg_temp_positions_sampled(tiny_dream):
    """alg_temp > 0 samples unmask positions (Gumbel-top-k) instead of
    deterministic top-k: different keys produce different unmask orders but
    all masks still fill."""
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(36), (1, 6), 3, cfg.vocab_size - 2)
    kw = dict(steps=4, max_new_tokens=8, temperature=0.0, alg="entropy",
              alg_temp=2.0, mask_id=MASK, output_history=True)
    _, h1 = dream_generate(fwd, params, prompt, key=jax.random.key(1), **kw)
    _, h2 = dream_generate(fwd, params, prompt, key=jax.random.key(2), **kw)
    seq1, seq2 = np.asarray(h1)[-1], np.asarray(h2)[-1]
    assert not (seq1 == MASK).any() and not (seq2 == MASK).any()
    # intermediate unmask order differs between keys
    assert (np.asarray(h1) != np.asarray(h2)).any()
