import json

import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.eval.lean import FakeLeanVerifier
from ct_diffusionmodelbench_tpu.eval.minif2f import run_minif2f_evaluation
from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner


@pytest.fixture(scope="module")
def tiny_runner():
    return ModelRunner.random_init("llada-tiny")


def test_generate_batch_matches_single(tiny_runner):
    """Left-padded batched rows decode identically to single runs (the
    attention mask + RoPE restart make padding transparent)."""
    prompts = ["prove n + 0 = n", "show 1 + 1 = 2 in Lean please",
               "trivial statement"]
    kw = dict(gen_length=8, steps=8, block_length=4)
    batched = tiny_runner.generate_batch(prompts, **kw)
    assert len(batched) == 3
    for text, res in zip(prompts, batched):
        single = tiny_runner.generate(text, **kw)
        np.testing.assert_array_equal(res.continuation_ids,
                                      single.continuation_ids)


def test_minif2f_batched_equals_serial(tmp_path, tiny_runner):
    problems = [
        {"name": f"p{i}", "split": "test", "informal_statement": "s",
         "formal_statement": f"theorem p{i} (n : Nat) : n + {i} = n + {i} := by",
         "header": "import Mathlib"}
        for i in range(5)
    ]
    fp = tmp_path / "m.json"
    fp.write_text(json.dumps(problems))

    out1 = run_minif2f_evaluation(
        tiny_runner, fp, output_dir=tmp_path / "serial", split="test",
        gen_length=8, steps=8, block_length=4,
        verifier=FakeLeanVerifier(), batch_size=1)
    out2 = run_minif2f_evaluation(
        tiny_runner, fp, output_dir=tmp_path / "batched", split="test",
        gen_length=8, steps=8, block_length=4,
        verifier=FakeLeanVerifier(), batch_size=2)
    p1 = [r["generated_proof"] for r in out1["results"]]
    p2 = [r["generated_proof"] for r in out2["results"]]
    assert p1 == p2
    assert out1["stats"]["pass_rate"] == out2["stats"]["pass_rate"]
