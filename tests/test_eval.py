import json
from pathlib import Path

import pytest

from ct_diffusionmodelbench_tpu.eval import (
    BenchmarkConfig,
    DiffusionBenchmark,
    FakeLeanVerifier,
    ModelAnalyzer,
    evaluate_solution_quality,
    extract_lean_code,
    run_minif2f_evaluation,
)
from ct_diffusionmodelbench_tpu.eval.minif2f import strip_proof_prefix
from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner

GOOD_PROOF = """import Mathlib
theorem add_zero_custom (n : Nat) : n + 0 = n := by
  simp
"""


@pytest.fixture(scope="module")
def tiny_runner():
    return ModelRunner.random_init("llada-tiny")


# ---------------------------------------------------------------------------
# quality metrics
# ---------------------------------------------------------------------------

def test_quality_llada_keys():
    m = evaluate_solution_quality(GOOD_PROOF, "theorem add_zero_custom",
                                  style="llada", verifier=FakeLeanVerifier())
    expected = {"solution_length", "solution_words", "lean_keywords_used",
                "has_proof_structure", "has_sorry", "lean_compilation_success",
                "lean_error_message", "has_balanced_brackets",
                "formal_overlap_ratio"}
    assert expected <= set(m)
    assert m["has_proof_structure"] and not m["has_sorry"]
    assert m["lean_compilation_success"]
    assert 0 < m["formal_overlap_ratio"] <= 1


def test_quality_dream_rich_keys():
    m = evaluate_solution_quality(GOOD_PROOF, "theorem t", "a problem about n",
                                  style="dream", verifier=FakeLeanVerifier())
    for k in ("solution_lines", "lean_tactics_used", "has_theorem_declaration",
              "has_qed", "math_symbols_count", "has_imports", "has_variables",
              "formal_unique_words", "problem_overlap_ratio",
              "appears_complete", "complexity_score"):
        assert k in m, k
    assert m["has_imports"] and m["has_theorem_declaration"]
    assert m["appears_complete"]
    assert m["complexity_score"] > 0


def test_quality_sorry_blocks_completeness():
    m = evaluate_solution_quality(GOOD_PROOF.replace("simp", "sorry"),
                                  style="dream", verifier=FakeLeanVerifier())
    assert m["has_sorry"] and not m["appears_complete"]
    assert not m["lean_compilation_success"]


def test_balanced_brackets():
    m = evaluate_solution_quality("theorem t : (a) := by simp", style="llada")
    assert m["has_balanced_brackets"]
    m = evaluate_solution_quality("theorem t : (a := by simp", style="llada")
    assert not m["has_balanced_brackets"]


# ---------------------------------------------------------------------------
# lean code extraction / proof prefix stripping
# ---------------------------------------------------------------------------

def test_extract_lean_code_variants():
    assert extract_lean_code("```lean\nsimp\n```") == "simp"
    assert extract_lean_code("text\n```\nsimp\n```\nmore") == "simp"
    assert extract_lean_code("  simp  ") == "simp"


@pytest.mark.parametrize("raw,expected", [
    ("by simp", "simp"),
    (":= by simp", "simp"),
    (":= simp", "simp"),
    ("BY ring", "ring"),
    ("simp", "simp"),
])
def test_strip_proof_prefix(raw, expected):
    assert strip_proof_prefix(raw) == expected


# ---------------------------------------------------------------------------
# fake lean verifier
# ---------------------------------------------------------------------------

def test_fake_verifier():
    v = FakeLeanVerifier()
    assert v.verify(GOOD_PROOF)[0]
    assert not v.verify("hello world")[0]
    assert not v.verify(GOOD_PROOF.replace("simp", "sorry"))[0]
    assert v.calls == 3


# ---------------------------------------------------------------------------
# benchmark sweep
# ---------------------------------------------------------------------------

def _entries(n=3):
    return [
        {"problem_id": f"p{i}", "name": f"Problem {i}", "category": "algebra",
         "informal_prefix": f"Prove that {i} + 0 = {i}.",
         "formal_statement": f"theorem t{i} (n : Nat) : n + 0 = n := by"}
        for i in range(n)
    ]


@pytest.mark.parametrize("style", ["llada", "dream", "diffucoder"])
def test_benchmark_sweep_artifacts(tmp_path, style, tiny_runner):
    cfg = BenchmarkConfig(
        style=style, gen_length=16, steps=8, block_length=4,
        max_new_tokens=16, results_dir=str(tmp_path / style))
    bench = DiffusionBenchmark(tiny_runner, cfg,
                               verifier=FakeLeanVerifier(), quiet=True)
    report = bench.run_benchmark(_entries(3), max_samples=3, save_interval=2)

    out = tmp_path / style
    assert (out / "final_report.json").exists()
    assert (out / "all_results.json").exists()
    assert (out / "results_batch_2.json").exists()
    assert (out / "results_batch_3.json").exists()

    m = report["overall_metrics"]
    if style == "dream":
        assert (out / "summary_report.txt").exists()
        assert "generation_success_rate" in m
        assert "average_complexity_score" in m
        assert "failure_analysis" in report and "detailed_statistics" in report
    else:
        assert "success_rate" in m
    assert m["average_generation_time"] >= 0
    assert report["benchmark_info"]["total_samples"] == 3
    assert "algebra" in report["category_analysis"]

    rows = json.loads((out / "all_results.json").read_text())
    for key in ("index", "problem_id", "name", "category", "generated_solution",
                "generation_time", "generation_success", "solution_length",
                "lean_keywords_used", "has_proof_structure", "has_sorry",
                "lean_compilation_success", "has_balanced_brackets",
                "formal_overlap_ratio"):
        assert key in rows[0], key
    if style == "llada":
        assert rows[0]["gen_length"] == 16 and rows[0]["remasking"] == "low_confidence"


def test_benchmark_auto_adjust(tiny_runner, tmp_path, capsys):
    cfg = BenchmarkConfig(style="llada", gen_length=18, steps=7, block_length=4,
                          results_dir=str(tmp_path / "adj"))
    bench = DiffusionBenchmark(tiny_runner, cfg, quiet=True)
    bench.run_benchmark(_entries(1), max_samples=1, save_interval=1)
    assert cfg.gen_length == 16          # rounded down to multiple of 4
    assert cfg.steps % (16 // 4) == 0    # rounded up to multiple of blocks
    assert "[Warning]" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# MiniF2F
# ---------------------------------------------------------------------------

@pytest.fixture()
def minif2f_fixture(tmp_path):
    problems = [
        {"name": f"prob_{i}", "split": "test",
         "informal_statement": "n + 0 = n",
         "formal_statement": f"theorem prob_{i} (n : ℕ) : n + 0 = n := by",
         "header": "import Mathlib"}
        for i in range(3)
    ] + [{"name": "valid_one", "split": "valid",
          "informal_statement": "x", "formal_statement": "theorem v : True := by",
          "header": "import Mathlib"}]
    p = tmp_path / "minif2f.json"
    p.write_text(json.dumps(problems))
    return p


@pytest.mark.parametrize("pipeline", [True, False])
def test_minif2f_evaluation(tmp_path, tiny_runner, minif2f_fixture, pipeline):
    out = run_minif2f_evaluation(
        tiny_runner, minif2f_fixture, output_dir=tmp_path / "eval",
        split="test", gen_length=16, steps=8, block_length=4,
        verifier=FakeLeanVerifier(), pipeline_verification=pipeline)
    assert out["stats"]["total"] == 3          # only the test split
    assert out["split"] == "test"
    assert 0 <= out["stats"]["pass_rate"] <= 100
    assert out["config"]["mask_id"] == tiny_runner.mask_id
    files = list((tmp_path / "eval").glob("minif2f_lean4_results_test_*.json"))
    assert len(files) == 1
    saved = json.loads(files[0].read_text())
    r = saved["results"][0]
    for k in ("name", "formal_statement", "generated_proof", "verified",
              "verification_message", "generation_time_sec", "split"):
        assert k in r, k


# ---------------------------------------------------------------------------
# analyzer
# ---------------------------------------------------------------------------

def test_analyzer_outputs(tmp_path):
    results = [
        {"generated_solution": GOOD_PROOF, "lean_compilation_success": True,
         "has_proof_structure": True, "generation_time": 1.5,
         "lean_keywords_used": 4, "has_theorem_declaration": True},
        {"generated_solution": "", "lean_compilation_success": False,
         "has_proof_structure": False, "generation_time": 0.5,
         "lean_keywords_used": 0, "has_theorem_declaration": False},
    ]
    rp = tmp_path / "results_batch_2.json"
    rp.write_text(json.dumps(results))
    analyzer = ModelAnalyzer(
        {"llada": str(rp)},
        model_specs={"llada": {"size": "tiny", "denoising_steps": 8}},
        syntax_checker=lambda code: "theorem" in code,
        output_dir=str(tmp_path / "proc"))
    rows = analyzer.run_analysis()
    assert rows[0]["total_solutions"] == 2
    assert rows[0]["compilation_success_rate"] == 50.0
    assert rows[0]["valid_lean_syntax_rate"] == 50.0
    assert rows[0]["theorems_used"] == 1
    proc = tmp_path / "proc"
    assert (proc / "model_performance.md").exists()
    assert (proc / "model_performance.csv").exists()
    md = (proc / "model_performance.md").read_text()
    assert md.startswith("| model |")
    assert "llada" in md


# ---------------------------------------------------------------------------
# CLIs
# ---------------------------------------------------------------------------

def test_chat_cli_one_shot(capsys):
    from ct_diffusionmodelbench_tpu.cli.chat import main
    main(["--preset", "llada-tiny", "--prompt", "prove n + 0 = n",
          "--gen-length", "8", "--steps", "8", "--block-length", "4"])
    out = capsys.readouterr().out
    assert "=== Generation Result ===" in out
    assert "mask_id=500" in out


def test_lean_check_cli_json_mode(tmp_path, capsys):
    from ct_diffusionmodelbench_tpu.cli.lean_check import main
    p = tmp_path / "r.json"
    p.write_text(json.dumps([{"generated_solution": "x"}]))
    main([str(p)])
    out = capsys.readouterr().out
    assert "Total items: 1" in out


def test_replot_cli(tmp_path, capsys):
    from ct_diffusionmodelbench_tpu.cli.replot import main
    metrics = [{"step": i, "loss": 1.0 / (i + 1)} for i in range(5)]
    mp = tmp_path / "training_metrics.json"
    mp.write_text(json.dumps(metrics))
    main([str(mp), "--output-dir", str(tmp_path)])
    assert (tmp_path / "training_plots.png").exists()


def test_benchmark_batched_matches_serial(tmp_path, tiny_runner):
    """batch_size>1 runs the sweep through generate_batch (DP path) and the
    greedy outputs equal the serial sweep sample-for-sample."""
    kw = dict(style="llada", gen_length=16, steps=8, block_length=4)
    b1 = DiffusionBenchmark(
        tiny_runner, BenchmarkConfig(results_dir=str(tmp_path / "s1"), **kw),
        verifier=FakeLeanVerifier(), quiet=True)
    r1 = b1.run_benchmark(_entries(5), max_samples=5, save_interval=10)
    b2 = DiffusionBenchmark(
        tiny_runner, BenchmarkConfig(results_dir=str(tmp_path / "s2"),
                                     batch_size=2, **kw),
        verifier=FakeLeanVerifier(), quiet=True)
    r2 = b2.run_benchmark(_entries(5), max_samples=5, save_interval=10)

    assert len(b1.results) == len(b2.results) == 5
    for a, b in zip(b1.results, b2.results):
        assert a["generated_solution"] == b["generated_solution"]
        assert a["generation_success"] and b["generation_success"]
    assert r2["benchmark_info"]["total_samples"] == 5
