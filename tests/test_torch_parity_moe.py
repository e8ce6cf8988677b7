"""MoE cross-framework parity (VERDICT round-1 item 6): torch-oracle MoE
checkpoint → our loader → our forward → logits equal, across the expert
weight layouts real checkpoints use (per-expert, stacked 3-D, Mixtral
block_sparse_moe names); plus greedy sampler token parity driven by the
torch model's logits.  Extends the dense-only tests/test_torch_parity.py to
the LLaDA-MoE family (SURVEY.md §7 hard-part 2 / 5)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors
from ct_diffusionmodelbench_tpu.models import make_forward_fn
from ct_diffusionmodelbench_tpu.sampling import llada_generate
from tests.reference_impl import np_llada_generate
from tests.torch_ref_model import TorchTinyMoELM

CFG = dict(vocab=256, hidden=64, layers=2, heads=4, kv_heads=2, head_dim=16,
           ffn=128, eps=1e-5, theta=10000.0, attention_bias=False,
           qk_norm=True, experts=8, top_k=2, moe_ffn=32, norm_topk=True)

HF_CONFIG = {
    "model_type": "lladamoe", "vocab_size": CFG["vocab"],
    "hidden_size": CFG["hidden"], "num_hidden_layers": CFG["layers"],
    "num_attention_heads": CFG["heads"], "num_key_value_heads": CFG["kv_heads"],
    "head_dim": CFG["head_dim"], "intermediate_size": CFG["ffn"],
    "rms_norm_eps": CFG["eps"], "rope_theta": CFG["theta"],
    "attention_bias": False, "use_qk_norm": True,
    "num_experts": CFG["experts"], "num_experts_per_tok": CFG["top_k"],
    "moe_intermediate_size": CFG["moe_ffn"], "num_shared_experts": 1,
    "norm_topk_prob": True,
    "mask_token_id": 250, "eos_token_id": 2, "torch_dtype": "float32",
}


@pytest.fixture(scope="module")
def torch_moe():
    torch.manual_seed(1)
    return TorchTinyMoELM(CFG).eval()


def _write_ckpt(tmp_path, model, layout):
    out = tmp_path / f"ckpt_{layout}"
    out.mkdir(parents=True, exist_ok=True)
    save_safetensors(out / "model.safetensors",
                     model.hf_state_dict(expert_layout=layout))
    (out / "config.json").write_text(json.dumps(HF_CONFIG))
    return out


@pytest.mark.parametrize("layout", ["per_expert", "stacked", "mixtral"])
def test_moe_logits_match_torch_across_layouts(torch_moe, tmp_path, layout):
    ckpt = _write_ckpt(tmp_path, torch_moe, layout)
    cfg, params = load_checkpoint(ckpt, dtype="float32")
    assert cfg.is_moe and cfg.num_experts == CFG["experts"]
    assert cfg.family == "llada-moe"
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(3, CFG["vocab"] - 8, size=(2, 17)).astype(np.int64)
    with torch.no_grad():
        ref = torch_moe(torch.from_numpy(ids)).numpy()
    ours, aux = fwd(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)
    assert np.isfinite(float(aux))


def test_moe_layouts_load_identically(torch_moe, tmp_path):
    """All three expert layouts must produce the same parameter pytree."""
    ref = None
    for layout in ("per_expert", "stacked", "mixtral"):
        _, params = load_checkpoint(_write_ckpt(tmp_path, torch_moe, layout),
                                    dtype="float32")
        if ref is None:
            ref = params
        else:
            jax.tree.map(lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), ref, params)


def test_moe_greedy_sampler_token_parity_with_torch_logits(torch_moe, tmp_path):
    ckpt = _write_ckpt(tmp_path, torch_moe, "per_expert")
    cfg, params = load_checkpoint(ckpt, dtype="float32")
    fwd = make_forward_fn(cfg)

    rng = np.random.default_rng(5)
    prompt = rng.integers(3, CFG["vocab"] - 8, size=(1, 6)).astype(np.int64)
    mask_id = 250

    def torch_logits(x_np):
        with torch.no_grad():
            return torch_moe(torch.from_numpy(x_np)).numpy().astype(np.float64)

    ref_tokens = np_llada_generate(
        torch_logits, prompt, steps=8, gen_length=8, block_length=4,
        mask_id=mask_id)
    ours = llada_generate(fwd, params, jnp.asarray(prompt, jnp.int32),
                          steps=8, gen_length=8, block_length=4,
                          mask_id=mask_id)
    np.testing.assert_array_equal(np.asarray(ours), ref_tokens)


def test_moe_export_reimport_preserves_parity(torch_moe, tmp_path):
    """stacked torch ckpt → our pytree → save_checkpoint (canonical
    per-expert export) → reload → still torch-equal."""
    cfg, params = load_checkpoint(_write_ckpt(tmp_path, torch_moe, "stacked"),
                                  dtype="float32")
    save_checkpoint(tmp_path / "exported", cfg, params)
    cfg2, params2 = load_checkpoint(tmp_path / "exported", dtype="float32")

    ids = np.random.default_rng(6).integers(3, CFG["vocab"] - 8,
                                            size=(1, 11)).astype(np.int64)
    with torch.no_grad():
        ref = torch_moe(torch.from_numpy(ids)).numpy()
    ours, _ = make_forward_fn(cfg2.replace(dtype="float32"))(
        params2, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)
