"""Cross-model analyzer CLI (model_analysis.py equivalent, H7)."""

from __future__ import annotations

import argparse

from ct_diffusionmodelbench_tpu.eval.analyzer import ModelAnalyzer


def main(argv=None):
    p = argparse.ArgumentParser(description="Cross-model benchmark analyzer")
    p.add_argument("--results", nargs="+", required=True,
                   metavar="NAME=PATH",
                   help="model=results_batch.json pairs, e.g. "
                        "llada=llada_benchmark/results_batch_100.json")
    p.add_argument("--output-dir", type=str, default="processing")
    p.add_argument("--no-syntax-check", action="store_true",
                   help="Skip Lean syntax re-validation (no lean binary)")
    args = p.parse_args(argv)

    paths = dict(item.split("=", 1) for item in args.results)
    checker = (lambda code: False) if args.no_syntax_check else None
    analyzer = ModelAnalyzer(paths, syntax_checker=checker,
                             output_dir=args.output_dir)
    analyzer.run_analysis()


if __name__ == "__main__":
    main()
