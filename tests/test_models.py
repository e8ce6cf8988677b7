import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.models import (
    config_from_hf,
    forward,
    get_config,
    init_params,
)
from ct_diffusionmodelbench_tpu.models.moe import (
    _experts_dense,
    moe_block,
    router_probs,
)


def test_forward_shapes(tiny_dense):
    cfg, params, fwd = tiny_dense
    ids = jax.random.randint(jax.random.key(9), (2, 17), 0, cfg.vocab_size)
    logits, aux = fwd(params, ids)
    assert logits.shape == (2, 17, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert float(aux) == 0.0


def test_bidirectional_attention(tiny_dense):
    """Changing a late token must change logits at an early position
    (no causal mask — every denoise step sees the full sequence)."""
    cfg, params, fwd = tiny_dense
    ids = jax.random.randint(jax.random.key(4), (1, 12), 0, cfg.vocab_size)
    l1, _ = fwd(params, ids)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % cfg.vocab_size)
    l2, _ = fwd(params, ids2)
    assert not np.allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]))


def test_left_padding_invariance(tiny_dense):
    """With attn_mask, a left-padded prompt must produce the same logits at
    real positions as the unpadded prompt (position ids restart at the first
    real token)."""
    cfg, params, fwd = tiny_dense
    ids = jax.random.randint(jax.random.key(5), (1, 10), 3, cfg.vocab_size)
    logits, _ = fwd(params, ids)

    pad = 4
    padded = jnp.concatenate([jnp.zeros((1, pad), ids.dtype), ids], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, pad), jnp.int32),
                            jnp.ones((1, 10), jnp.int32)], axis=1)
    logits_p, _ = fwd(params, padded, mask)
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(logits_p[0, pad:]), rtol=2e-4, atol=2e-4
    )


def test_logit_shift(tiny_dream):
    """Dream convention: logits at position i come from position i-1's hidden
    state, so changing token i must not change (shifted) logits at i when
    attention can't see it... it can (bidirectional) — instead verify the
    shift structurally: unshifted forward at i-1 == shifted forward at i."""
    cfg, params, fwd = tiny_dream
    ids = jax.random.randint(jax.random.key(6), (1, 9), 0, cfg.vocab_size)
    shifted, _ = fwd(params, ids)
    unshifted, _ = forward(cfg.replace(logit_shift=False), params, ids)
    np.testing.assert_allclose(np.asarray(shifted[0, 1:]), np.asarray(unshifted[0, :-1]))
    np.testing.assert_allclose(np.asarray(shifted[0, 0]), np.asarray(unshifted[0, 0]))


def test_moe_aux_loss_positive(tiny_moe):
    cfg, params, fwd = tiny_moe
    ids = jax.random.randint(jax.random.key(7), (2, 8), 0, cfg.vocab_size)
    logits, aux = fwd(params, ids)
    assert logits.shape == (2, 8, cfg.vocab_size)
    # Balanced-routing lower bound is 1.0 (E * sum(f_e * P_e) >= 1).
    assert float(aux) >= 0.99


def test_grouped_gemm_matches_dense_oracle():
    """ragged-dot grouped expert FFN == one-hot dense einsum."""
    key = jax.random.key(11)
    N, D, E, Fm, K = 24, 16, 6, 8, 2
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N, D))
    we_gate = jax.random.normal(ks[1], (E, D, Fm)) / np.sqrt(D)
    we_up = jax.random.normal(ks[2], (E, D, Fm)) / np.sqrt(D)
    we_down = jax.random.normal(ks[3], (E, Fm, D)) / np.sqrt(Fm)
    w_router = jax.random.normal(ks[4], (D, E)) / np.sqrt(D)

    topk_probs, topk_idx, _ = router_probs(x, w_router, K, True)
    dense = _experts_dense(x, topk_probs, topk_idx, we_gate, we_up, we_down)

    from ct_diffusionmodelbench_tpu.ops.grouped_gemm import grouped_expert_ffn
    grouped = grouped_expert_ffn(x, topk_probs, topk_idx, we_gate, we_up, we_down)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped), rtol=1e-4, atol=1e-5)


def test_moe_block_grouped_equals_dense(tiny_moe):
    cfg, params, _ = tiny_moe
    lp = jax.tree.map(lambda a: a[0], params["blocks"])
    moe_params = {k: lp[k] for k in
                  ("router", "we_gate", "we_up", "we_down", "ws_gate", "ws_up", "ws_down")
                  if k in lp}
    x = jax.random.normal(jax.random.key(12), (32, cfg.hidden_size))
    out_d, aux_d = moe_block(x, moe_params, top_k=cfg.num_experts_per_tok,
                             norm_topk=cfg.norm_topk_prob, impl="dense")
    out_g, aux_g = moe_block(x, moe_params, top_k=cfg.num_experts_per_tok,
                             norm_topk=cfg.norm_topk_prob, impl="grouped")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_d), float(aux_g), rtol=1e-6)


def test_config_from_hf_llama_style():
    cfg = config_from_hf({
        "model_type": "llada", "vocab_size": 126464, "hidden_size": 4096,
        "num_hidden_layers": 32, "num_attention_heads": 32,
        "num_key_value_heads": 32, "intermediate_size": 12288,
        "rms_norm_eps": 1e-5, "rope_theta": 500000.0, "mask_token_id": 126336,
    })
    assert cfg.num_layers == 32 and cfg.head_dim == 128
    assert cfg.mask_token_id == 126336 and not cfg.logit_shift and not cfg.is_moe


def test_config_from_hf_moe_and_dream():
    moe = config_from_hf({
        "model_type": "lladamoe", "vocab_size": 157184, "hidden_size": 2048,
        "num_hidden_layers": 16, "num_attention_heads": 16,
        "num_key_value_heads": 4, "intermediate_size": 5632,
        "num_experts": 64, "num_experts_per_tok": 8,
        "moe_intermediate_size": 1408, "num_shared_experts": 1,
    })
    assert moe.is_moe and moe.num_experts == 64 and moe.num_shared_experts == 1
    dream = config_from_hf({
        "model_type": "dream", "vocab_size": 152064, "hidden_size": 3584,
        "num_hidden_layers": 28, "num_attention_heads": 28,
        "num_key_value_heads": 4, "intermediate_size": 18944,
        "mask_token_id": 151666,
    })
    assert dream.logit_shift and dream.attention_bias


def test_param_count_matches_tree(tiny_moe):
    cfg, params, _ = tiny_moe
    actual = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert actual == cfg.param_count()


def test_remat_forward_matches(tiny_dense):
    cfg, params, _ = tiny_dense
    ids = jax.random.randint(jax.random.key(8), (1, 11), 0, cfg.vocab_size)
    a, _ = forward(cfg, params, ids, remat=False)
    b, _ = forward(cfg, params, ids, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_out_of_vocab_ids_raise_under_debug_guard(tiny_dense):
    """CTDB_CHECK_VOCAB=1 (set by conftest) makes the mode="clip" embedding
    gather loud on out-of-range ids instead of silently clamping (ADVICE r2)."""
    cfg, params, fwd = tiny_dense
    bad = jnp.full((1, 8), cfg.vocab_size + 5, jnp.int32)
    with pytest.raises(ValueError, match="token id out of range"):
        np.asarray(fwd(params, bad)[0])
