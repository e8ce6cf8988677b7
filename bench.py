"""Headline benchmark: denoised tokens/sec/chip for the LLaDA sampler.

Mirrors the reference's benchmark configuration (gen_length=256,
block_length=32, greedy low-confidence remasking —
Pre-Trained/bench_models/llada.py:576-587) at the BASELINE.json shape
(256 denoise steps).  Baseline for ``vs_baseline``: the reference harness
measured 57.09 s/sample for 128 steps + 256 generated tokens on a GH200
(≈4.48 denoised tokens/s; BASELINE.md), for LLaDA-MoE-7B-A1B (~1.4B active
params).  Here the model is the llada-2b dense config — the largest
single-chip-runnable member of the LLaDA family (the 8B needs TP over ≥2
chips, SURVEY.md §7) and compute-wise comparable to the reference's active
parameter count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import jax
import numpy as np

REFERENCE_DENOISED_TOK_PER_SEC = 256.0 / 57.09  # BASELINE.md, LLaDA-MoE on GH200

PROMPT_LEN = 64
GEN_LENGTH = 256
STEPS = 256
BLOCK_LENGTH = 32


def main():
    from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    on_tpu = jax.default_backend() == "tpu"
    name = "llada-2b" if on_tpu else "llada-tiny"
    cfg = get_config(name)
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)

    kw = dict(steps=STEPS, gen_length=GEN_LENGTH, block_length=BLOCK_LENGTH,
              temperature=0.0, mask_id=cfg.mask_token_id)

    def run(batch, reps):
        # NOTE: timing must force a device→host copy — block_until_ready does
        # not actually block on the tunneled axon backend (async remote
        # execution); np.asarray does.
        prompt = jax.random.randint(jax.random.key(1), (batch, PROMPT_LEN), 10,
                                    min(cfg.vocab_size - 10, 100_000))
        np.asarray(llada_generate(fwd, params, prompt, **kw))  # warmup/compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = np.asarray(llada_generate(fwd, params, prompt, **kw))
            times.append(time.time() - t0)
        assert not (out == cfg.mask_token_id).any()
        return float(np.median(times))

    dt_single = run(1, 3)
    batch = 8 if on_tpu else 2
    dt_batched = run(batch, 2)

    n_chips = len(jax.devices())
    # Headline = batched throughput: tokens/sec/chip is a throughput metric
    # and DP prompt batching is the TPU-native serving shape (BASELINE.json
    # config 5); single-sample latency is reported alongside.
    value = batch * GEN_LENGTH / dt_batched / n_chips
    print(json.dumps({
        "metric": "denoised_tokens_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "tok/s/chip",
        "vs_baseline": round(value / REFERENCE_DENOISED_TOK_PER_SEC, 2),
        "config": {
            "model": cfg.name,
            "params_b": round(cfg.param_count() / 1e9, 2),
            "prompt_len": PROMPT_LEN,
            "gen_length": GEN_LENGTH,
            "steps": STEPS,
            "block_length": BLOCK_LENGTH,
            "dtype": cfg.dtype,
            "backend": jax.default_backend(),
            "chips": n_chips,
            "batch": batch,
            "seconds_per_batch": round(dt_batched, 3),
            "single_sample_latency_sec": round(dt_single, 3),
            "single_sample_tok_per_sec": round(GEN_LENGTH / dt_single / n_chips, 2),
            "baseline": "LLaDA-MoE-7B-A1B 256 tok / 57.09 s on GH200 (BASELINE.md)",
        },
    }))


if __name__ == "__main__":
    main()
