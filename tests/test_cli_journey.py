"""Full user journey through the CLIs: train a tiny model on a local jsonl
dataset → chat with the saved checkpoint → run MiniF2F eval on it.
This is the reference's workflow (train.py → chat_finetuned.py →
benchmark_finetuned.py) end to end on our artifacts."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def numina_jsonl(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "numina.jsonl"
    rng = np.random.default_rng(0)
    with open(p, "w") as f:
        for i in range(40):
            f.write(json.dumps({
                "problem": f"Compute {i} + 0.",
                "formal_statement": f"theorem t{i} (n : Nat) : n + {i % 3} = n + {i % 3} := by",
                "formal_ground_truth": "simp",
                "formal_proof": "exact rfl",
                "answer": str(i),
            }) + "\n")
    return p


def test_train_chat_minif2f_journey(tmp_path, numina_jsonl, capsys):
    from ct_diffusionmodelbench_tpu.cli import chat, minif2f, train

    out_dir = tmp_path / "trained"
    train.main([
        "--preset", "llada-tiny", "--dataset", str(numina_jsonl),
        "--format", "lean_sft", "--output-dir", str(out_dir),
        "--train-samples", "16", "--epochs", "1", "--batch-size", "2",
        "--grad-accum", "2", "--max-length", "64", "--eval-steps", "0",
        "--logging-steps", "1", "--warmup-steps", "1",
    ])
    assert (out_dir / "model.safetensors").exists()
    assert (out_dir / "config.json").exists()
    assert (out_dir / "training_metrics.json").exists()
    capsys.readouterr()

    # chat against the trained checkpoint dir
    chat.main(["--model-dir", str(out_dir), "--prompt", "prove it",
               "--gen-length", "8", "--steps", "8", "--block-length", "4"])
    out = capsys.readouterr().out
    assert "=== Generation Result ===" in out
    assert "mask_id=500" in out  # persisted in the exported config.json

    # MiniF2F eval against the trained checkpoint dir (fake Lean oracle)
    problems = [{"name": "p0", "split": "test", "informal_statement": "s",
                 "formal_statement": "theorem p0 : True := by",
                 "header": "import Mathlib"}]
    mp = tmp_path / "m.json"
    mp.write_text(json.dumps(problems))
    minif2f.main([
        "--model-dir", str(out_dir), "--json-path", str(mp),
        "--output-dir", str(tmp_path / "eval"), "--fake-lean",
        "--gen-length", "8", "--steps", "8", "--block-length", "4",
    ])
    files = list((tmp_path / "eval").glob("minif2f_lean4_results_test_*.json"))
    assert len(files) == 1
    saved = json.loads(files[0].read_text())
    assert saved["stats"]["total"] == 1


def test_benchmark_pipelined_verification_equals_serial(tmp_path):
    from ct_diffusionmodelbench_tpu.eval import BenchmarkConfig, DiffusionBenchmark
    from ct_diffusionmodelbench_tpu.eval.lean import FakeLeanVerifier
    from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

    runner = ModelRunner.random_init("llada-tiny")
    entries = [
        {"problem_id": f"p{i}", "name": f"P{i}", "category": "alg",
         "informal_prefix": f"prove {i}",
         "formal_statement": "theorem x : True := by"}
        for i in range(4)
    ]
    reports = {}
    for pipelined in (False, True):
        cfg = BenchmarkConfig(style="llada", gen_length=8, steps=8, block_length=4,
                              results_dir=str(tmp_path / f"pipe{pipelined}"))
        b = DiffusionBenchmark(runner, cfg, verifier=FakeLeanVerifier(),
                               quiet=True, pipeline_verification=pipelined)
        reports[pipelined] = b.run_benchmark(entries, max_samples=4, save_interval=2)
    m0 = reports[False]["overall_metrics"]
    m1 = reports[True]["overall_metrics"]
    assert m0["lean_compilation_rate"] == m1["lean_compilation_rate"]
    r0 = json.loads((tmp_path / "pipeFalse" / "all_results.json").read_text())
    r1 = json.loads((tmp_path / "pipeTrue" / "all_results.json").read_text())
    for a, b_ in zip(r0, r1):
        assert a["lean_compilation_success"] == b_["lean_compilation_success"]
        assert a["generated_solution"] == b_["generated_solution"]
