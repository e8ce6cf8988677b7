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


def test_entropy_conf_uses_filtered_distribution():
    """With top-p active, entropy confidence must be computed on the
    *filtered renormalized* distribution (published sample_tokens semantics),
    not the full softmax (ADVICE round-1, medium)."""
    from tests.reference_impl import np_dream_filter_stats

    sc = DreamSamplerConfig(temperature=0.0, top_p=0.9, alg="entropy", steps=4)
    logits = jax.random.normal(jax.random.key(40), (2, 5, 40)) * 3
    x0, conf = _filter_and_sample(logits, sc, jax.random.key(0))
    ref_x0, ref_conf = np_dream_filter_stats(np.asarray(logits), top_p=0.9,
                                             alg="entropy")
    np.testing.assert_array_equal(np.asarray(x0), ref_x0)
    np.testing.assert_allclose(np.asarray(conf), ref_conf, rtol=1e-4)
    # and it genuinely differs from the full-distribution entropy
    p_full = np.asarray(jax.nn.softmax(logits, -1), np.float64)
    full_entropy = np.sum(p_full * np.log(p_full + 1e-10), axis=-1)
    assert not np.allclose(np.asarray(conf), full_entropy, rtol=1e-3)


def test_topk_margin_conf_matches_oracle():
    from tests.reference_impl import np_dream_filter_stats

    sc = DreamSamplerConfig(temperature=0.0, top_p=0.8, alg="topk_margin", steps=4)
    logits = jax.random.normal(jax.random.key(41), (1, 7, 30)) * 2
    x0, conf = _filter_and_sample(logits, sc, jax.random.key(0))
    ref_x0, ref_conf = np_dream_filter_stats(np.asarray(logits), top_p=0.8,
                                             alg="topk_margin")
    np.testing.assert_array_equal(np.asarray(x0), ref_x0)
    np.testing.assert_allclose(np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-6)


def test_greedy_with_filter_is_exact_argmax():
    """temperature<=0 must use exact top_k even when a filter forces the
    prefilter path (ADVICE round-1, low): V > 4*K would otherwise take
    approx_max_k whose slot 0 can miss the true argmax."""
    sc = DreamSamplerConfig(temperature=0.0, top_p=0.95, alg="maskgit_plus", steps=4)
    logits = jax.random.normal(jax.random.key(42), (1, 8, 512)) * 4
    x0, _ = _filter_and_sample(logits, sc, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(x0),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_exact_mode_matches_prefilter_on_peaked_logits():
    """exact=True (full-vocab sort) and the K=64 prefilter agree whenever the
    nucleus fits the prefilter — peaked, trained-LM-shaped logits."""
    V = 512
    key = jax.random.key(43)
    base = jax.random.normal(key, (2, 6, V))
    # peak ~13 nats above the noise floor → top-1 prob ≈ 0.999, so the 0.95
    # nucleus is a handful of tokens and comfortably fits the K=64 prefilter
    # (the trained-LM regime the prefilter is designed for).
    peaked = base * 1.0 + 13.0 * jax.nn.one_hot(
        jax.random.randint(jax.random.key(44), (2, 6), 0, V), V)
    for alg in ("maskgit_plus", "entropy", "topk_margin"):
        sc_a = DreamSamplerConfig(temperature=0.0, top_p=0.95, alg=alg, steps=4)
        sc_e = DreamSamplerConfig(temperature=0.0, top_p=0.95, alg=alg, steps=4,
                                  exact=True)
        x0_a, conf_a = _filter_and_sample(peaked, sc_a, jax.random.key(0))
        x0_e, conf_e = _filter_and_sample(peaked, sc_e, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(x0_a), np.asarray(x0_e), alg)
        np.testing.assert_allclose(np.asarray(conf_a), np.asarray(conf_e),
                                   rtol=1e-4, atol=1e-6, err_msg=alg)


def test_exact_mode_entropy_conf_independent_of_sampling_noise():
    """At temperature>0 the entropy score depends only on the filtered
    distribution, so exact and approx paths must agree on conf even though
    their Gumbel draws differ."""
    V = 512
    peaked = jax.random.normal(jax.random.key(45), (1, 5, V)) + \
        9.0 * jax.nn.one_hot(jax.random.randint(jax.random.key(46), (1, 5), 0, V), V)
    sc_a = DreamSamplerConfig(temperature=0.4, top_p=0.95, alg="entropy", steps=4)
    sc_e = DreamSamplerConfig(temperature=0.4, top_p=0.95, alg="entropy", steps=4,
                              exact=True)
    _, conf_a = _filter_and_sample(peaked, sc_a, jax.random.key(7))
    _, conf_e = _filter_and_sample(peaked, sc_e, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(conf_a), np.asarray(conf_e),
                               rtol=1e-4, atol=1e-6)


def _tabular_forward(V, S_max, seed=0):
    """Deterministic black-box forward: logits[b,s] = W[x[b,s]] + Pos[s]."""
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(V, V)).astype(np.float32) * 2
    Pos = rng.normal(size=(S_max, V)).astype(np.float32)

    def np_fn(x):
        return W[x] + Pos[: x.shape[1]]

    def jx_fn(params, ids, attn_mask=None):
        return jnp.asarray(W)[ids] + jnp.asarray(Pos)[: ids.shape[1]], jnp.float32(0)

    return np_fn, jx_fn


def test_generate_matches_numpy_oracle_per_row_counts():
    from tests.reference_impl import np_dream_generate

    V, MASKV = 40, 39
    np_fn, jx_fn = _tabular_forward(V, 24, seed=3)
    prompt = np.array([[3, 7, MASKV, 11, 5, MASKV],
                       [9, 2, 4, 6, 8, 10]], np.int32)
    seq, _ = dream_generate(jx_fn, None, jnp.asarray(prompt), steps=5,
                            max_new_tokens=10, temperature=0.0, top_p=0.9,
                            alg="entropy", mask_id=MASKV, exact=True)
    ref = np_dream_generate(np_fn, prompt, steps=5, max_new_tokens=10,
                            mask_id=MASKV, top_p=0.9, alg="entropy",
                            batch_mean=False)
    np.testing.assert_array_equal(np.asarray(seq), ref)


def test_generate_matches_numpy_oracle_batch_mean_counts():
    """batch_mean_counts=True reproduces the remote code's batch-averaged
    transfer count at batch>1 with uneven per-row mask counts (prompt masks
    make row 0 carry 2 extra masks)."""
    from tests.reference_impl import np_dream_generate

    V, MASKV = 40, 39
    np_fn, jx_fn = _tabular_forward(V, 24, seed=4)
    prompt = np.array([[3, 7, MASKV, 11, 5, MASKV],
                       [9, 2, 4, 6, 8, 10]], np.int32)
    seq, _ = dream_generate(jx_fn, None, jnp.asarray(prompt), steps=5,
                            max_new_tokens=10, temperature=0.0, top_p=0.9,
                            alg="entropy", mask_id=MASKV, exact=True,
                            batch_mean_counts=True)
    ref = np_dream_generate(np_fn, prompt, steps=5, max_new_tokens=10,
                            mask_id=MASKV, top_p=0.9, alg="entropy",
                            batch_mean=True)
    np.testing.assert_array_equal(np.asarray(seq), ref)
    # the two count modes genuinely diverge on this input
    ref_per_row = np_dream_generate(np_fn, prompt, steps=5, max_new_tokens=10,
                                    mask_id=MASKV, top_p=0.9, alg="entropy",
                                    batch_mean=False)
    assert (ref != ref_per_row).any()


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


def test_gen_region_slice_matches_full_width(tiny_dream):
    """The gen-region logit slice (model supports logit_start) decodes the
    same greedy tokens as a full-width run with identical filter math
    (slice support hidden from the sampler) for mask-free prompts."""
    cfg, params, fwd = tiny_dream
    prompt = jax.random.randint(jax.random.key(50), (2, 7), 3, cfg.vocab_size - 20)
    kw = dict(steps=4, max_new_tokens=8, temperature=0.0, top_p=0.9,
              alg="entropy", mask_id=MASK)
    sliced, _ = dream_generate(fwd, params, prompt, **kw)
    fwd_noslice = lambda p, ids, m=None: fwd(p, ids, m)  # hides logit_start
    full, _ = dream_generate(fwd_noslice, params, prompt, **kw)
    np.testing.assert_array_equal(np.asarray(sliced), np.asarray(full))


def test_gen_region_slice_prompt_mask_divergence_documented(tiny_dream):
    """Pathological prompts containing mask_id: exact mode unmasks them in
    place (remote-code behavior); the sliced fast path leaves them (same
    documented divergence as the LLaDA block-sliced head)."""
    cfg, params, fwd = tiny_dream
    prompt = jnp.array([[5, MASK, 9, 11]], jnp.int32)
    kw = dict(steps=4, max_new_tokens=8, temperature=0.0, alg="entropy",
              top_p=0.9, mask_id=MASK)
    full, _ = dream_generate(fwd, params, prompt, exact=True, **kw)
    assert not (np.asarray(full) == MASK).any()          # prompt mask decoded
    sliced, _ = dream_generate(fwd, params, prompt, **kw)
    s = np.asarray(sliced)
    assert s[0, 1] == MASK                               # left untouched
    assert not (s[:, 4:] == MASK).any()                  # gen region decoded
