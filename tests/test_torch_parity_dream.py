"""Dream-family cross-framework parity (VERDICT r2 missing item 2): the
Qwen-style shifted-logit + QKV-bias forward checked against an independent
torch implementation — logits parity through the HF checkpoint loader, the
shift-at-position-0 convention specifically, and dream-sampler token parity
(greedy, exact and batch-mean-counts modes).

Reference semantics being replaced: remote-code ``diffusion_generate``
(/root/reference/Pre-Trained/bench_models/dream.py:70-110)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint
from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors
from ct_diffusionmodelbench_tpu.models import make_forward_fn
from ct_diffusionmodelbench_tpu.sampling import dream_generate
from tests.reference_impl import np_dream_generate
from tests.torch_ref_model import TorchTinyDreamLM

MASK = 250

CFG = dict(vocab=256, hidden=64, layers=2, heads=4, kv_heads=2, head_dim=16,
           ffn=128, eps=1e-6, theta=10000.0, attention_bias=True,
           qk_norm=False)

HF_CONFIG = {
    "model_type": "dream", "vocab_size": CFG["vocab"],
    "hidden_size": CFG["hidden"], "num_hidden_layers": CFG["layers"],
    "num_attention_heads": CFG["heads"], "num_key_value_heads": CFG["kv_heads"],
    "head_dim": CFG["head_dim"], "intermediate_size": CFG["ffn"],
    "rms_norm_eps": CFG["eps"], "rope_theta": CFG["theta"],
    "mask_token_id": MASK, "eos_token_id": 2, "torch_dtype": "float32",
}


@pytest.fixture(scope="module")
def dream_checkpoint(tmp_path_factory):
    torch.manual_seed(7)
    model = TorchTinyDreamLM(CFG).eval()
    out = tmp_path_factory.mktemp("dream_ckpt")
    save_safetensors(out / "model.safetensors", model.hf_state_dict())
    (out / "config.json").write_text(json.dumps(HF_CONFIG))
    return model, out


def test_config_inferred_from_model_type(dream_checkpoint):
    _, ckpt_dir = dream_checkpoint
    cfg, _ = load_checkpoint(ckpt_dir, dtype="float32")
    assert cfg.logit_shift          # dream model_type implies the shift
    assert cfg.attention_bias       # Qwen2.5 QKV bias
    assert cfg.family == "dream"
    assert cfg.mask_token_id == MASK


def test_logits_match_torch(dream_checkpoint):
    model, ckpt_dir = dream_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(11)
    ids = rng.integers(3, CFG["vocab"] - 4, size=(2, 19)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).numpy()
    ours, _ = fwd(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_shift_at_position_zero_convention(dream_checkpoint):
    """Position 0 keeps its own logits; position i>0 carries position i-1's
    unshifted logits (PARITY.md §3 risk: shift-at-position-0)."""
    model, ckpt_dir = dream_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    fwd_shift = make_forward_fn(cfg)
    fwd_raw = make_forward_fn(cfg.replace(logit_shift=False))

    ids = np.random.default_rng(12).integers(
        3, CFG["vocab"] - 4, size=(1, 9)).astype(np.int64)
    shifted, _ = fwd_shift(params, jnp.asarray(ids, jnp.int32))
    raw, _ = fwd_raw(params, jnp.asarray(ids, jnp.int32))
    shifted, raw = np.asarray(shifted), np.asarray(raw)
    np.testing.assert_array_equal(shifted[:, 0], raw[:, 0])
    np.testing.assert_array_equal(shifted[:, 1:], raw[:, :-1])
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).numpy()
    np.testing.assert_allclose(shifted, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("batch_mean", [False, True])
def test_dream_sampler_token_parity_with_torch_logits(dream_checkpoint,
                                                      batch_mean):
    """Our fused dream sampler on our loaded checkpoint decodes the SAME
    tokens as the reference decoding algorithm driven by the torch model's
    logits (greedy, exact mode; both transfer-count conventions)."""
    model, ckpt_dir = dream_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(13)
    prompt = rng.integers(3, CFG["vocab"] - 4, size=(2, 6)).astype(np.int64)

    def torch_logits(x_np):
        with torch.no_grad():
            return model(torch.from_numpy(x_np)).numpy().astype(np.float64)

    ref = np_dream_generate(torch_logits, prompt, steps=5, max_new_tokens=10,
                            mask_id=MASK, top_p=None, alg="entropy",
                            batch_mean=batch_mean)
    ours, _ = dream_generate(fwd, params, jnp.asarray(prompt, jnp.int32),
                             steps=5, max_new_tokens=10, temperature=0.0,
                             top_p=None, alg="entropy", mask_id=MASK,
                             exact=True, batch_mean_counts=batch_mean)
    np.testing.assert_array_equal(np.asarray(ours), ref)
