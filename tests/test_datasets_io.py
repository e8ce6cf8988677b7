import json

import pytest

datasets = pytest.importorskip("datasets")

from ct_diffusionmodelbench_tpu.io.datasets_io import (
    format_instruction_lean_sft,
    format_instruction_problem,
    load_hub_or_local,
    load_minif2f,
    pick_bench_split,
    split_80_10_10,
    split_fresh_for_inference,
    split_val_from_training,
)
from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok():
    return Tokenizer.byte_fallback()


def _numina_ds(n=100):
    rows = {
        "problem": [f"problem {i}" for i in range(n)],
        "formal_statement": [f"theorem t{i} : True := by" for i in range(n)],
        "formal_ground_truth": [f"trivial -- {i}" if i % 4 else "" for i in range(n)],
        "formal_proof": [f"exact trivial -- {i}" for i in range(n)],
        "answer": ["42"] * n,
    }
    return datasets.Dataset.from_dict(rows)


def test_format_lean_sft(tok):
    ds = _numina_ds(8)
    out = format_instruction_lean_sft(ds[1], tok)
    assert out["text"].startswith(out["prompt"])
    assert "theorem t1" in out["prompt"]
    assert out["text"].endswith(tok.eos_token)
    # rows with empty ground truth are dropped
    empty = format_instruction_lean_sft(ds[0], tok)
    assert empty == {"text": "", "prompt": ""}


def test_format_problem_variant(tok):
    ds = _numina_ds(4)
    out = format_instruction_problem(ds[1], tok, extra_system="Lean only.")
    assert "Problem: problem 1" in out["prompt"]
    assert "Formal Statement:" in out["prompt"]
    assert out["reference"].startswith("exact trivial")
    assert "Lean only." in out["prompt"]


def test_split_80_10_10_deterministic(tok):
    ds = _numina_ds(100)
    a = split_80_10_10(ds, seed=42)
    b = split_80_10_10(ds, seed=42)
    for x, y in zip(a, b):
        assert list(x["problem"]) == list(y["problem"])
    train, val, test = a
    assert len(train) == 80 and len(val) == 10 and len(test) == 10
    # disjoint
    all_probs = list(train["problem"]) + list(val["problem"]) + list(test["problem"])
    assert len(set(all_probs)) == 100


def test_split_fresh_for_inference(tok):
    ds = _numina_ds(100)
    train, val, test = split_fresh_for_inference(ds, seed=42)
    assert len(test) == 10 and len(val) == 10 and len(train) == 80


def test_split_val_from_training(tok):
    ds = _numina_ds(100)
    val = split_val_from_training(ds, max_samples=40, seed=42)
    assert len(val) == 6  # 15% of 40


def test_load_local_jsonl(tmp_path):
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"problem": f"p{i}", "category": "alg"}) + "\n")
    ds = load_hub_or_local(str(p))
    assert len(ds) == 5
    split, name = pick_bench_split(ds)
    assert name == "train" and len(split) == 5


def test_load_from_disk_dir(tmp_path):
    ds = datasets.Dataset.from_dict({"a": [1, 2, 3]})
    dd = datasets.DatasetDict({"train": ds, "test": ds.select([0])})
    dd.save_to_disk(str(tmp_path / "dict"))
    assert len(load_hub_or_local(str(tmp_path / "dict"), split="test")) == 1
    assert len(load_hub_or_local(str(tmp_path / "dict"), split="train")) == 3
    ds.save_to_disk(str(tmp_path / "plain"))
    assert len(load_hub_or_local(str(tmp_path / "plain"))) == 3


def test_load_minif2f_filters_split(tmp_path):
    data = [{"name": "a", "split": "test"}, {"name": "b", "split": "valid"},
            {"name": "c", "split": "test"}]
    p = tmp_path / "m.json"
    p.write_text(json.dumps(data))
    assert [x["name"] for x in load_minif2f(p, "test")] == ["a", "c"]
    assert [x["name"] for x in load_minif2f(p, "valid")] == ["b"]
    assert len(load_minif2f(p, "test", num_samples=1)) == 1
