"""CLI coverage: benchmark sweep, split inference, analyzer mains on local
data (no hub access)."""

import json

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")


@pytest.fixture()
def olympiad_jsonl(tmp_path):
    p = tmp_path / "oly.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "problem_id": f"p{i}", "name": f"Problem {i}",
                "category": "algebra" if i % 2 else "number_theory",
                "informal_prefix": f"Prove that {i} + 0 = {i}.",
                "formal_statement": f"theorem t{i} (n : Nat) : n + 0 = n := by",
            }) + "\n")
    return p


@pytest.fixture()
def numina_jsonl(tmp_path):
    p = tmp_path / "numina.jsonl"
    with open(p, "w") as f:
        for i in range(30):
            f.write(json.dumps({
                "problem": f"Compute {i}.",
                "formal_statement": f"theorem t{i} : True := by",
                "formal_proof": "trivial",
                "answer": str(i),
            }) + "\n")
    return p


def test_bench_cli_main(tmp_path, olympiad_jsonl, capsys):
    from ct_diffusionmodelbench_tpu.cli.bench import main

    main(["--style", "llada", "--preset", "llada-tiny",
          "--dataset-path", str(olympiad_jsonl),
          "--max-samples", "2", "--save-interval", "1",
          "--gen-length", "8", "--steps", "8", "--block-length", "4",
          "--results-dir", str(tmp_path / "res"), "--fake-lean", "--quiet"])
    out = capsys.readouterr().out
    assert "Benchmark completed!" in out
    report = json.loads((tmp_path / "res" / "final_report.json").read_text())
    assert report["benchmark_info"]["total_samples"] == 2
    assert "number_theory" in report["category_analysis"]


def test_bench_cli_dream_style(tmp_path, olympiad_jsonl, capsys):
    from ct_diffusionmodelbench_tpu.cli.bench import main

    main(["--style", "dream", "--preset", "dream-tiny",
          "--dataset-path", str(olympiad_jsonl),
          "--max-samples", "2", "--save-interval", "2",
          "--max-new-tokens", "8", "--steps", "4",
          "--results-dir", str(tmp_path / "dres"), "--fake-lean", "--quiet"])
    assert (tmp_path / "dres" / "summary_report.txt").exists()


def test_infer_split_cli(tmp_path, numina_jsonl, capsys):
    from ct_diffusionmodelbench_tpu.cli.infer_split import main

    main(["--preset", "llada-tiny", "--dataset", str(numina_jsonl),
          "--split", "test", "--num-samples", "2",
          "--gen-length", "8", "--steps", "8", "--block-length", "4",
          "--save-dir", str(tmp_path / "inf")])
    rows = [json.loads(l) for l in
            (tmp_path / "inf" / "generations.jsonl").read_text().splitlines()]
    assert len(rows) == 2
    for r in rows:
        assert {"prompt", "generated", "reference", "latency_sec"} <= set(r)
        assert r["reference"] == "trivial"


def test_infer_split_val_from_training(tmp_path, numina_jsonl):
    from ct_diffusionmodelbench_tpu.cli.infer_split import main

    main(["--preset", "llada-tiny", "--dataset", str(numina_jsonl),
          "--split", "val_from_training", "--num-samples", "1",
          "--training-like-max-samples", "20",
          "--gen-length", "8", "--steps", "8", "--block-length", "4",
          "--save-dir", str(tmp_path / "inf2")])
    assert (tmp_path / "inf2" / "generations.jsonl").exists()


def test_analyze_cli(tmp_path, capsys):
    from ct_diffusionmodelbench_tpu.cli.analyze import main

    results = [{"generated_solution": "theorem t : True := by trivial",
                "lean_compilation_success": True, "has_proof_structure": True,
                "generation_time": 2.0, "lean_keywords_used": 3,
                "has_theorem_declaration": True}]
    rp = tmp_path / "results_batch_1.json"
    rp.write_text(json.dumps(results))
    main(["--results", f"llada={rp}", "--output-dir", str(tmp_path / "proc"),
          "--no-syntax-check"])
    md = (tmp_path / "proc" / "model_performance.md").read_text()
    assert "llada" in md
    assert (tmp_path / "proc" / "model_performance.json").exists()
