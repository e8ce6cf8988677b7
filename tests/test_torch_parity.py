"""Cross-framework parity: torch-oracle checkpoint → our loader → our
forward → logits equal; and the full greedy sampler decodes the same tokens
when driven by the torch model's logits (SURVEY.md §7 hard-parts 1-2,
checkable offline)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint
from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors
from ct_diffusionmodelbench_tpu.models import make_forward_fn
from ct_diffusionmodelbench_tpu.sampling import llada_generate
from tests.reference_impl import np_llada_generate
from tests.torch_ref_model import TorchTinyLM

CFG = dict(vocab=256, hidden=64, layers=2, heads=4, kv_heads=2, head_dim=16,
           ffn=128, eps=1e-5, theta=10000.0, attention_bias=True, qk_norm=True)

HF_CONFIG = {
    "model_type": "llada", "vocab_size": CFG["vocab"],
    "hidden_size": CFG["hidden"], "num_hidden_layers": CFG["layers"],
    "num_attention_heads": CFG["heads"], "num_key_value_heads": CFG["kv_heads"],
    "head_dim": CFG["head_dim"], "intermediate_size": CFG["ffn"],
    "rms_norm_eps": CFG["eps"], "rope_theta": CFG["theta"],
    "attention_bias": True, "use_qk_norm": True,
    "mask_token_id": 250, "eos_token_id": 2, "torch_dtype": "float32",
}


@pytest.fixture(scope="module")
def torch_checkpoint(tmp_path_factory):
    torch.manual_seed(0)
    model = TorchTinyLM(CFG).eval()
    out = tmp_path_factory.mktemp("torch_ckpt")
    save_safetensors(out / "model.safetensors", model.hf_state_dict())
    (out / "config.json").write_text(json.dumps(HF_CONFIG))
    return model, out


def test_logits_match_torch(torch_checkpoint):
    model, ckpt_dir = torch_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    assert cfg.attention_bias and cfg.qk_norm
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(3, CFG["vocab"] - 4, size=(2, 21)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).numpy()
    ours, _ = fwd(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_greedy_sampler_token_parity_with_torch_logits(torch_checkpoint):
    """End-to-end north-star check at test scale: our fused jitted sampler on
    our loaded checkpoint decodes the SAME token ids as the reference
    algorithm driven by the torch model's logits."""
    model, ckpt_dir = torch_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(2)
    prompt = rng.integers(3, CFG["vocab"] - 4, size=(1, 7)).astype(np.int64)
    mask_id = 250

    def torch_logits(x_np):
        with torch.no_grad():
            return model(torch.from_numpy(x_np)).numpy().astype(np.float64)

    ref_tokens = np_llada_generate(
        torch_logits, prompt, steps=8, gen_length=8, block_length=4,
        mask_id=mask_id)
    ours = llada_generate(fwd, params, jnp.asarray(prompt, jnp.int32),
                          steps=8, gen_length=8, block_length=4,
                          mask_id=mask_id)
    np.testing.assert_array_equal(np.asarray(ours), ref_tokens)


def test_export_reimport_preserves_torch_parity(torch_checkpoint, tmp_path):
    """torch ckpt → our pytree → save_checkpoint → reload → still torch-equal
    (the HF-compatible export path the trainer uses)."""
    from ct_diffusionmodelbench_tpu.io.checkpoint import save_checkpoint

    model, ckpt_dir = torch_checkpoint
    cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
    save_checkpoint(tmp_path / "exported", cfg, params)
    cfg2, params2 = load_checkpoint(tmp_path / "exported", dtype="float32")

    ids = np.random.default_rng(3).integers(3, CFG["vocab"] - 4,
                                            size=(1, 13)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).numpy()
    ours, _ = make_forward_fn(cfg2.replace(dtype="float32"))(
        params2, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
