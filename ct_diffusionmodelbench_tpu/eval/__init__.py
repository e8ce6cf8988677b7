from ct_diffusionmodelbench_tpu.eval.quality import evaluate_solution_quality
from ct_diffusionmodelbench_tpu.eval.lean import (
    LeanVerifier,
    LakeProjectVerifier,
    FakeLeanVerifier,
    AsyncVerifier,
)
from ct_diffusionmodelbench_tpu.eval.benchmark import BenchmarkConfig, DiffusionBenchmark
from ct_diffusionmodelbench_tpu.eval.minif2f import run_minif2f_evaluation, extract_lean_code
from ct_diffusionmodelbench_tpu.eval.analyzer import ModelAnalyzer
