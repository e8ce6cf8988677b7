import json

import jax
import ml_dtypes
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.io.safetensors_io import (
    load_safetensors,
    read_metadata,
    save_safetensors,
    shard_tensors,
)
from ct_diffusionmodelbench_tpu.io.checkpoint import (
    flatten_to_hf,
    load_checkpoint,
    save_checkpoint,
)
from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer, resolve_mask_id
from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.normal(size=(4, 8)).astype(np.float32),
        "b.bf16": rng.normal(size=(16,)).astype(ml_dtypes.bfloat16),
        "c.int": rng.integers(0, 100, size=(3, 3, 3)).astype(np.int64),
    }
    p = tmp_path / "t.safetensors"
    save_safetensors(p, tensors, metadata={"format": "pt"})
    loaded = load_safetensors(p)
    assert set(loaded) == set(tensors)
    for k in tensors:
        assert loaded[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(np.asarray(loaded[k]), tensors[k])
    assert read_metadata(p) == {"format": "pt"}


def test_safetensors_matches_hf_library(tmp_path):
    """Our writer must be readable by the canonical safetensors package and
    vice versa."""
    st = pytest.importorskip("safetensors.numpy")
    ours = tmp_path / "ours.safetensors"
    tensors = {"x": np.arange(12, dtype=np.float32).reshape(3, 4)}
    save_safetensors(ours, tensors)
    theirs = st.load_file(str(ours))
    np.testing.assert_array_equal(theirs["x"], tensors["x"])

    hf_file = tmp_path / "theirs.safetensors"
    st.save_file(tensors, str(hf_file))
    back = load_safetensors(hf_file)
    np.testing.assert_array_equal(np.asarray(back["x"]), tensors["x"])


def test_sharding_greedy():
    tensors = {f"t{i}": np.zeros(100, np.float32) for i in range(5)}
    shards = list(shard_tensors(tensors, max_shard_bytes=900))
    assert len(shards) == 3  # 2+2+1 at 400B each
    assert sum(len(s) for s in shards) == 5


@pytest.mark.parametrize("preset", ["llada-tiny", "llada-moe-tiny", "dream-tiny"])
def test_checkpoint_roundtrip(tmp_path, preset):
    """save_checkpoint → load_checkpoint is the identity (config + params),
    and the reloaded model produces identical logits."""
    cfg = get_config(preset, dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    out = tmp_path / preset
    save_checkpoint(out, cfg, params)

    cfg2, params2 = load_checkpoint(out, dtype="float32")
    assert cfg2.num_layers == cfg.num_layers
    assert cfg2.is_moe == cfg.is_moe
    assert cfg2.logit_shift == cfg.logit_shift
    assert cfg2.mask_token_id == cfg.mask_token_id

    flat1 = flatten_to_hf(cfg, params)
    flat2 = flatten_to_hf(cfg2, params2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k])

    ids = jax.random.randint(jax.random.key(1), (1, 8), 0, cfg.vocab_size)
    l1, _ = make_forward_fn(cfg)(params, ids)
    l2, _ = make_forward_fn(cfg2.replace(dtype="float32"))(params2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_checkpoint_sharded_roundtrip(tmp_path):
    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(3))
    out = tmp_path / "sharded"
    save_checkpoint(out, cfg, params, max_shard_size=200_000)
    assert (out / "model.safetensors.index.json").exists()
    index = json.loads((out / "model.safetensors.index.json").read_text())
    assert len(set(index["weight_map"].values())) > 1
    _, params2 = load_checkpoint(out, dtype="float32")
    a = flatten_to_hf(cfg, params)
    b = flatten_to_hf(cfg, params2)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_checkpoint_alias_names(tmp_path):
    """A checkpoint using the OLMo/LLaDA-style alias names must load."""
    from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors as save

    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(4))
    canonical = flatten_to_hf(cfg, params)
    rename = {
        "model.embed_tokens.weight": "model.transformer.wte.weight",
        "model.norm.weight": "model.transformer.ln_f.weight",
        "lm_head.weight": "model.transformer.ff_out.weight",
    }
    for i in range(cfg.num_layers):
        rename[f"model.layers.{i}.self_attn.q_proj.weight"] = f"model.transformer.blocks.{i}.q_proj.weight"
        rename[f"model.layers.{i}.mlp.gate_proj.weight"] = f"model.transformer.blocks.{i}.ff_proj.weight"
    aliased = {rename.get(k, k): v for k, v in canonical.items()}
    out = tmp_path / "aliased"
    out.mkdir()
    save(out / "model.safetensors", aliased)
    (out / "config.json").write_text(json.dumps({
        "model_type": "llada", "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size, "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads, "num_key_value_heads": cfg.num_kv_heads,
        "intermediate_size": cfg.intermediate_size, "head_dim": cfg.head_dim,
        "mask_token_id": cfg.mask_token_id, "rope_theta": cfg.rope_theta,
    }))
    cfg2, params2 = load_checkpoint(out, dtype="float32")
    back = flatten_to_hf(cfg2, params2)
    for k in canonical:
        np.testing.assert_array_equal(back[k], canonical[k])


def test_missing_tensor_raises(tmp_path):
    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(5))
    flat = flatten_to_hf(cfg, params)
    del flat["model.layers.1.self_attn.k_proj.weight"]
    out = tmp_path / "broken"
    out.mkdir()
    from ct_diffusionmodelbench_tpu.io.safetensors_io import save_safetensors as save
    save(out / "model.safetensors", flat)
    with pytest.raises(KeyError, match="wk"):
        load_checkpoint(out, cfg=cfg)


# ---------------------------------------------------------------------------
# Tokenizer / mask-id resolution
# ---------------------------------------------------------------------------

class _FakeTok:
    mask_token_id = None
    unk_token_id = 3

    def __init__(self, table=None, mask_token_id=None):
        self.table = table or {}
        self.mask_token_id = mask_token_id

    def convert_tokens_to_ids(self, tok):
        return self.table.get(tok, self.unk_token_id)


def test_resolve_mask_id_chain():
    # 1. override wins
    assert resolve_mask_id(config_mask_id=1, override=99) == 99
    # 2. config id
    assert resolve_mask_id(config_mask_id=126336) == 126336
    # 3. tokenizer attribute
    assert resolve_mask_id(tokenizer=_FakeTok(mask_token_id=7)) == 7
    # 4. token-string probe (first candidate that isn't unk)
    tok = _FakeTok(table={"<mask>": 42})
    assert resolve_mask_id(tokenizer=tok) == 42
    # 5. default
    assert resolve_mask_id(tokenizer=_FakeTok()) == 156895
    # vocab-size guard rejects out-of-range ids
    assert resolve_mask_id(tokenizer=_FakeTok(mask_token_id=900),
                           vocab_size=512, default=500) == 500


def test_byte_tokenizer_roundtrip():
    tok = Tokenizer.byte_fallback()
    ids = tok.encode("theorem add_zero (n : Nat) : n + 0 = n")
    assert tok.decode(ids) == "theorem add_zero (n : Nat) : n + 0 = n"
    assert tok.encode("abc", max_length=2) == tok.encode("ab")


def test_chat_template_fallback_shape():
    tok = Tokenizer.byte_fallback()
    prompt = tok.apply_chat_template([
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hello"},
    ])
    assert prompt.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>user<|end_header_id|>" in prompt
    assert prompt.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
