import jax
import jax.numpy as jnp
import numpy as np

from ct_diffusionmodelbench_tpu.ops.sampling_ops import (
    gumbel_rescore,
    rank_topk_mask,
    token_confidence,
)


def test_gumbel_temperature_zero_is_identity():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    out = gumbel_rescore(logits, 0.0, None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_gumbel_argmax_matches_exp_ratio_form():
    """argmax(logits - T log(-log u)) == argmax(exp(logits) / (-log u)^T)."""
    key = jax.random.key(0)
    logits = jax.random.normal(jax.random.key(1), (64, 50)) * 3
    T = 0.8
    ours = jnp.argmax(gumbel_rescore(logits, T, key), axis=-1)
    u = jax.random.uniform(key, logits.shape, jnp.float32,
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    ref_scores = np.exp(np.asarray(logits, np.float64)) / (-np.log(np.asarray(u, np.float64))) ** T
    ref = np.argmax(ref_scores, axis=-1)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_gumbel_distribution_tracks_softmax():
    """At T=1 the Gumbel trick samples from softmax(logits)."""
    logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
    keys = jax.random.split(jax.random.key(2), 4000)
    picks = jax.vmap(lambda k: jnp.argmax(gumbel_rescore(logits, 1.0, k)))(keys)
    freqs = np.bincount(np.asarray(picks), minlength=3) / 4000
    np.testing.assert_allclose(freqs, [0.7, 0.2, 0.1], atol=0.03)


def test_token_confidence_equals_softmax_gather():
    logits = jax.random.normal(jax.random.key(3), (2, 7, 33)) * 4
    chosen = jnp.argmax(logits, axis=-1)
    ours = np.asarray(token_confidence(logits, chosen))
    full = jax.nn.softmax(logits, axis=-1)
    ref = np.take_along_axis(np.asarray(full), np.asarray(chosen)[..., None], -1)[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_rank_topk_dynamic_k_per_row():
    conf = jnp.array([
        [0.1, 0.9, 0.5, 0.7],
        [0.4, 0.3, 0.2, 0.1],
    ])
    k = jnp.array([2, 1])
    mask = np.asarray(rank_topk_mask(conf, k))
    np.testing.assert_array_equal(mask, [[False, True, False, True],
                                         [True, False, False, False]])


def test_rank_topk_tie_break_lowest_index():
    conf = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    mask = np.asarray(rank_topk_mask(conf, jnp.array([2])))
    np.testing.assert_array_equal(mask, [[True, True, False, False]])


def test_rank_topk_k_zero_and_full():
    conf = jnp.array([[3.0, 1.0, 2.0]])
    assert not np.asarray(rank_topk_mask(conf, jnp.array([0]))).any()
    assert np.asarray(rank_topk_mask(conf, jnp.array([3]))).all()
