"""The executable PARITY.md §3 checklist (tools/parity_probe.py) exercised
end-to-end on the tiny torch-oracle checkpoints — so the probe script itself
is verified in CI while the real checkpoints stay unreachable (zero egress)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors
from tools.parity_probe import run_probes
from tests.torch_ref_model import TorchTinyDreamLM, TorchTinyLM


def _mk_ckpt(tmp_path, model, hf_config):
    save_safetensors(tmp_path / "model.safetensors", model.hf_state_dict())
    (tmp_path / "config.json").write_text(json.dumps(hf_config))
    return tmp_path


def _torch_fn(model):
    def f(ids_np):
        with torch.no_grad():
            return model(torch.from_numpy(ids_np)).numpy()
    return f


CFG_LLADA = dict(vocab=256, hidden=64, layers=2, heads=4, kv_heads=2,
                 head_dim=16, ffn=128, eps=1e-5, theta=10000.0,
                 attention_bias=False, qk_norm=False)
HF_LLADA = {
    "model_type": "llada", "vocab_size": 256, "hidden_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "intermediate_size": 128,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "attention_bias": False,
    "mask_token_id": 250, "eos_token_id": 2,
}

CFG_DREAM = dict(CFG_LLADA, attention_bias=True)
HF_DREAM = dict(HF_LLADA, model_type="dream", attention_bias=True)


def _statuses(results):
    return {r["probe"]: r["status"] for r in results}


def test_all_probes_pass_on_llada_oracle(tmp_path):
    torch.manual_seed(0)
    model = TorchTinyLM(CFG_LLADA).eval()
    ckpt = _mk_ckpt(tmp_path, model, HF_LLADA)
    res = run_probes(ckpt, torch_model=_torch_fn(model), prompt_len=12,
                     try_transformers=False)
    st = _statuses(res)
    assert st["config"] == st["load"] == st["logits"] == st["sampler"] == "PASS", res
    assert st["shift-pos0"] == "SKIP"   # not a shifted-logit family


def test_all_probes_pass_on_dream_oracle(tmp_path):
    torch.manual_seed(1)
    model = TorchTinyDreamLM(CFG_DREAM).eval()
    ckpt = _mk_ckpt(tmp_path, model, HF_DREAM)
    res = run_probes(ckpt, torch_model=_torch_fn(model), prompt_len=12,
                     try_transformers=False)
    st = _statuses(res)
    for probe in ("config", "load", "logits", "shift-pos0", "sampler"):
        assert st[probe] == "PASS", res


def test_probe_detects_wrong_forward(tmp_path):
    """A torch forward with different weights must FAIL logits + sampler —
    the probe actually discriminates, not just rubber-stamps."""
    torch.manual_seed(2)
    model = TorchTinyLM(CFG_LLADA).eval()
    ckpt = _mk_ckpt(tmp_path, model, HF_LLADA)
    torch.manual_seed(99)
    other = TorchTinyLM(CFG_LLADA).eval()
    res = run_probes(ckpt, torch_model=_torch_fn(other), prompt_len=12,
                     try_transformers=False)
    st = _statuses(res)
    assert st["logits"] == "FAIL"


def test_probes_degrade_to_structural_without_torch(tmp_path):
    torch.manual_seed(3)
    model = TorchTinyLM(CFG_LLADA).eval()
    ckpt = _mk_ckpt(tmp_path, model, HF_LLADA)
    res = run_probes(ckpt, torch_model=None, try_transformers=False)
    st = _statuses(res)
    assert st["config"] == st["load"] == "PASS"
    assert st["logits"] == st["sampler"] == "SKIP"
