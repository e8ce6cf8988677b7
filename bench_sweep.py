"""Perf ledger: the sub-benchmark numbers behind docs/STATUS.md's claims,
measured and committed as one JSON artifact (VERDICT round-1 item 7).

Covers:
- **dream-7b full size** at the reference's exact Dream/DiffuCoder benchmark
  config (256 steps, temp 0.4, top_p 0.95, alg=entropy —
  Pre-Trained/bench_models/dream.py:80-91) vs the 49.61 s/sample (Dream) and
  8.02 s/sample (DiffuCoder, same interface) GH200 baselines.
- **Pallas flash attention vs XLA reference** forward wall-clock across
  sequence lengths bracketing the MiniF2F shape (prompt ≤2048 + gen 512),
  8B head geometry — the measured crossover table behind the length-based
  auto-dispatch in ops/attention.py.
- **Pallas grouped GEMM vs lax.ragged_dot** at the llada-moe-7b routing
  shape.

Timing methodology: each op runs inside a jitted fori_loop with a data
dependency between iterations (the axon backend's ~0.1-0.3 s per-dispatch
RPC makes single-op timings meaningless — CLAUDE.md), and every measurement
forces a device→host copy.

Writes PERF.json and prints it.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DREAM_BASELINE_SEC = 49.61       # model_performance.md:4 (256 steps, GH200)
DIFFUCODER_BASELINE_SEC = 8.02   # model_performance.md:3 (same interface)

_PEAK = [None]


def _peak() -> float:
    """bf16 peak FLOP/s of the current chip (bench.py's device_kind table) —
    never a hardcoded per-generation constant (VERDICT r3 weak 3)."""
    if _PEAK[0] is None:
        from bench import chip_peak_tflops
        _PEAK[0] = chip_peak_tflops()[1] * 1e12
    return _PEAK[0]


def _t(call, reps=3):
    """Median wall-clock of call() with forced D2H materialization."""
    np.asarray(call())  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(call())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def time_loop(fn, args, iters=16, reps=3):
    """Seconds per op: fn(*args) chained ``iters`` times inside one jit
    (output 0 feeds argument 0 so XLA cannot elide iterations).

    The jit returns a SCALAR: materializing the full op output would ship
    MBs over the tunneled axon backend per rep and swamp the op time
    (measured: a [2560, 2048] f32 transfer costs more than 10 fused MoE
    layers)."""

    @jax.jit
    def run(args):
        def body(_, c):
            out = fn(*c)
            return (out.astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, iters, body, args)[0].sum() \
            .astype(jnp.float32)

    return _t(lambda: run(args), reps) / iters


def bench_dream():
    from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn
    from ct_diffusionmodelbench_tpu.sampling import dream_generate

    cfg = get_config("dream-7b")
    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)

    kw = dict(steps=256, max_new_tokens=256, temperature=0.4, top_p=0.95,
              alg="entropy", mask_id=cfg.mask_token_id,
              key=jax.random.key(2))

    def run(batch):
        prompt = jax.random.randint(jax.random.key(1), (batch, 64), 10, 100_000)
        return _t(lambda: dream_generate(fwd, params, prompt, **kw)[0], reps=2)

    dt1 = run(1)
    batch = 4
    dtb = run(batch)
    # On-chip companion: tenant time-slicing on the shared pool can deflate
    # OR inflate wall-clock; the device plane can't lie (VERDICT r3 item 3).
    from ct_diffusionmodelbench_tpu.utils.profiling import (
        onchip_device_seconds)
    prompt_b = jax.random.randint(jax.random.key(1), (batch, 64), 10, 100_000)
    oc = onchip_device_seconds(
        lambda: np.asarray(dream_generate(fwd, params, prompt_b, **kw)[0]))
    del params
    # MFU: 256 full-width forwards of seq 320 per sample (the Dream sampler
    # computes every position's logits each step — no block-sliced head).
    seq = 64 + 256
    flops_per_sample = 256 * cfg.forward_flops(seq)
    row = {
        "model": "dream-7b (full size)",
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "params_active_b": round(cfg.active_param_count() / 1e9, 2),
        "config": "256 steps, temp 0.4, top_p 0.95, alg=entropy, gen 256",
        "single_sample_sec": round(dt1, 3),
        "batched_sec_per_sample": round(dtb / batch, 3),
        "batch": batch,
        "mfu": round(batch * flops_per_sample / dtb / _peak(), 4),
        "mfu_single": round(flops_per_sample / dt1 / _peak(), 4),
        "vs_dream_baseline_49.61s": round(DREAM_BASELINE_SEC / (dtb / batch), 1),
        "vs_diffucoder_baseline_8.02s": round(
            DIFFUCODER_BASELINE_SEC / (dtb / batch), 1),
    }
    if oc:
        row["onchip_seconds_per_batch"] = round(oc, 3)
        row["onchip_sec_per_sample"] = round(oc / batch, 3)
        row["mfu_onchip"] = round(batch * flops_per_sample / oc / _peak(), 4)
    return row


def bench_attention_crossover():
    """Pallas flash (round-4 head-grouped kernel) vs XLA reference at the
    8B head geometry (32 heads, d_head 128), bf16, batch 1 AND batch 8 —
    single-sample latency and the batched serving shape.

    Both paths time ROPE + ATTENTION (what the model block actually runs):
    XLA fuses the rotation into its attention fusion, the Pallas path fuses
    it in-kernel via the ``rope=`` argument (VERDICT r2 weak 3).  The
    auto-dispatch rule derived from this table is work-based:
    pallas iff B*H*S^2 >= 24e6 (ops/attention.py)."""
    from ct_diffusionmodelbench_tpu.models.layers import rope_angles
    from ct_diffusionmodelbench_tpu.ops.attention import attention

    rows = []
    for B, seqs in ((1, (320, 512, 1024, 2048, 4096)),
                    (8, (320, 512, 1024))):
        for S in seqs:
            q, k, v = (jax.random.normal(jax.random.key(i), (B, S, 32, 128),
                                         jnp.bfloat16) for i in range(3))
            pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                                   (B, S))
            cos, sin = rope_angles(pos, 128, 500000.0)
            iters = max(4, 2048 // max(B * S // 512, 1))
            t_ref = time_loop(
                lambda q_, k_, v_: attention(q_, k_, v_, impl="reference",
                                             rope=(cos, sin)),
                (q, k, v), iters=iters)
            t_pal = time_loop(
                lambda q_, k_, v_: attention(q_, k_, v_, impl="pallas",
                                             rope=(cos, sin)),
                (q, k, v), iters=iters)
            rows.append({
                "batch": B,
                "seq_len": S,
                "includes_rope": True,
                "score_work_bhs2": B * 32 * S * S,
                "xla_reference_ms": round(t_ref * 1e3, 3),
                "pallas_flash_ms": round(t_pal * 1e3, 3),
                "pallas_speedup": round(t_ref / t_pal, 2),
            })
    return rows


def bench_grouped_gemm():
    """Pallas grouped GEMM vs lax.ragged_dot at the llada-moe-7b routing
    shape (N=2048 tokens, top-8 of 64 experts, D=2048, Fm=896, bf16)."""
    import os

    from ct_diffusionmodelbench_tpu.ops import grouped_gemm as gg

    N, K, E, D, Fm = 2048, 8, 64, 2048, 896
    x = jax.random.normal(jax.random.key(0), (N, D), jnp.bfloat16)
    probs = jax.nn.softmax(jax.random.normal(jax.random.key(1), (N, K)), -1)
    idx = jax.random.randint(jax.random.key(2), (N, K), 0, E)
    wg, wu = (jax.random.normal(jax.random.key(i), (E, D, Fm), jnp.bfloat16) * 0.02
              for i in (3, 4))
    wd = jax.random.normal(jax.random.key(5), (E, Fm, D), jnp.bfloat16) * 0.02

    out = {}
    for backend in ("ragged", "pallas"):
        os.environ["CTDB_GROUPED_GEMM"] = backend
        try:
            t = time_loop(
                lambda xx, p, i, a, b, c: gg.grouped_expert_ffn(xx, p, i, a, b, c),
                (x, probs, idx, wg, wu, wd), iters=8)
            out[f"{backend}_ms"] = round(t * 1e3, 3)
        finally:
            os.environ.pop("CTDB_GROUPED_GEMM", None)
    out["pallas_speedup"] = round(out["ragged_ms"] / out["pallas_ms"], 2)
    out["shape"] = f"N={N} K={K} E={E} D={D} Fm={Fm} bf16"
    return out


def _measure_train_step(cfg, tcfg, *, A=4, B=1, L=2048, reps=3):
    """Median seconds/step of the jitted SFT train step on the current
    backend (compile excluded; forced D2H via the loss scalar)."""
    from ct_diffusionmodelbench_tpu.models import init_params
    from ct_diffusionmodelbench_tpu.train.trainer import (
        make_optimizer, make_train_step)

    params = init_params(cfg, jax.random.key(0))
    jax.block_until_ready(params)
    optimizer, _ = make_optimizer(tcfg, total_steps=100)
    opt_state = optimizer.init(params)
    step, _ = make_train_step(cfg, tcfg, optimizer)

    ids = jax.random.randint(jax.random.key(1), (A, B, L), 10,
                             min(100_000, cfg.vocab_size - 10))
    plens = jnp.full((A, B), 64, jnp.int32)
    key = jax.random.key(2)

    params, opt_state, _ = step(params, opt_state, ids, plens, key)  # compile
    jax.block_until_ready(params)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        params, opt_state, m = step(params, opt_state, ids, plens, key)
        np.asarray(m["loss"])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    # On-chip companion of one more step (device plane, contention-robust).
    # The step donates params+opt_state, so the traced call rebinds them
    # like the timed loop does.
    from ct_diffusionmodelbench_tpu.utils.profiling import (
        onchip_device_seconds)
    state = {}

    def _traced():
        p, o, m = step(params, opt_state, ids, plens, key)
        np.asarray(m["loss"])
        state["po"] = (p, o)

    oc = onchip_device_seconds(_traced)
    if "po" in state:
        params, opt_state = state.pop("po")
    nparams = sum(x.size for x in jax.tree.leaves(params))
    del params, opt_state
    return dt, nparams, oc


def _sft_row(cfg, tcfg, label, *, A=4, B=1, L=2048):
    dt, nparams, oc = _measure_train_step(cfg, tcfg, A=A, B=B, L=L)
    # fwd+bwd ~ 6 * ACTIVE params * tokens (MoE: only routed+shared experts
    # see each token).
    flops = 6 * cfg.active_param_count() * A * B * L
    row = {
        "model": label,
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "params_active_b": round(cfg.active_param_count() / 1e9, 2),
        "optimizer_state_dtype": tcfg.optimizer_state_dtype,
        "grad_accum_dtype": tcfg.grad_accum_dtype,
        "seq_len": L, "effective_batch": A * B,
        "seconds_per_step": round(dt, 3),
        "samples_per_second_per_chip": round(A * B / dt, 3),
        "tokens_per_second_per_chip": round(A * B * L / dt, 1),
        "train_mfu": round(flops / dt / _peak(), 4),
        # Model-FLOPs MFU (6*P*T, the HF-comparable convention).  remat=True
        # recomputes the forward in the backward, so the chip actually
        # executes ~8*P*T: hardware utilization is ~4/3 of this number.
        "hardware_util_with_remat": (
            round(flops * 8 / 6 / dt / _peak(), 4) if tcfg.remat else None),
        "reference": "4.873 samples/s = 0.609/GPU for 8B SFT on 8x GH200 "
                     "(NOV8_1kto21k training_metrics.json)",
    }
    if oc:
        row["onchip_seconds_per_step"] = round(oc, 3)
        row["train_mfu_onchip"] = round(flops / oc / _peak(), 4)
    return row


def bench_sft():
    """Diffusion-SFT train-step throughput, single chip.

    Comparable row: the reference's 4.873 samples/s for full-parameter SFT
    of the 8B LLaDA across EIGHT GH200s (Training_Results/NOV8_1kto21k/
    training_metrics.json — SURVEY.md §6).  One 16 GB v5e cannot hold an
    8B model's f32 Adam state (that is what the dp/tp sharded Trainer is
    for), so this measures the largest-fitting dense model of the same
    architecture: llada-2b trimmed to 6 layers (0.83B params;
    params bf16 + f32 grads + Adam m/v ≈ 13 GB).  Seq 2048, effective
    batch 4 (grad-accum 4 × micro 1), matching the reference's per-GPU
    profile (per-device batch 1, grad-accum 4, MAX_LENGTH 2048)."""
    from ct_diffusionmodelbench_tpu.models import get_config
    from ct_diffusionmodelbench_tpu.train.trainer import TrainConfig

    cfg = get_config("llada-2b").replace(num_layers=6)
    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=4, batch_size=1,
                       max_length=2048, remat=True)
    return _sft_row(cfg, tcfg, "llada-2b arch, 6 layers (0.83B - largest "
                               "dense fit w/ f32 Adam)")


def bench_sft_int8_full2b():
    """The optimizer-state knob in action: the FULL 22-layer llada-2b
    (1.65B) — 2x the f32-Adam ceiling — trains on one chip with int8 Adam
    moments (VERDICT r2 item 2)."""
    from ct_diffusionmodelbench_tpu.models import get_config
    from ct_diffusionmodelbench_tpu.train.trainer import TrainConfig

    cfg = get_config("llada-2b")
    # bf16 accumulation buffer is load-bearing here: with f32 accum the
    # peak (params 3.3 + accum 6.6 + grads/a 6.6 + moments 3.3 GB) blows
    # the 16 GB chip — measured RESOURCE_EXHAUSTED; bf16 halves both
    # gradient trees while the clip still norms in f32
    # (train/optim.py clip_by_global_norm_f32).
    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=4, batch_size=1,
                       max_length=2048, remat=True,
                       optimizer_state_dtype="int8",
                       grad_accum_dtype="bfloat16")
    return _sft_row(cfg, tcfg, "llada-2b FULL 22 layers (1.65B, int8 Adam "
                               "moments - 2x the f32-Adam ceiling)")


def bench_sft_moe():
    """MoE diffusion-SFT train step on the real chip (VERDICT r2 item 2):
    the llada-moe-7b layer architecture (64 experts top-8 + shared, D=2048,
    Fm=896, grouped Pallas FFN fwd + ragged bwd via custom_vjp) trimmed to
    the deepest stack whose state fits one 16 GB chip with int8 Adam
    moments.  The reference's flagship training run IS this MoE
    (Training_0to1k/train.py:255-317, train_llada_moe_optimized.py)."""
    import os

    from ct_diffusionmodelbench_tpu.train.trainer import TrainConfig

    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=4, batch_size=1,
                       max_length=2048, remat=True,
                       optimizer_state_dtype="int8",
                       grad_accum_dtype="bfloat16")
    # Training wants the SCANNED layer path: the stacked-weights custom_vjp
    # scatters a full-stack-sized cotangent per layer call (grouped_gemm.py
    # _pallas_ffn_bwd note), while scan accumulates one stack-shaped grad.
    os.environ["CTDB_MOE_STACKED"] = "0"
    try:
        layers = int(os.environ.get("CTDB_BENCH_MOE_LAYERS", "0"))
        if layers:  # single attempt (we are the subprocess)
            return _bench_sft_moe_inner(tcfg, layers)
        return _bench_sft_moe_subprocess()
    finally:
        os.environ.pop("CTDB_MOE_STACKED", None)


def bench_sft_moe_max():
    """Largest single-chip-TRAINABLE llada-moe-7b stack (VERDICT r3 item 7).

    The opt-in memory-saver backward (``CTDB_RAGGED_NT=1``,
    grouped_gemm._ragged_dot_nt) removes the ~2 GB of hoisted full-stack
    expert-weight transposes from the backward scan — that is what moves
    the depth ceiling past the throughput row's 2 layers.  It costs speed
    (2-layer on-chip A/B: 0.725 -> 1.324 s/step), so the throughput row
    (sft_train_step_moe) keeps the fast transpose-rule backward and THIS
    row carries the depth record."""
    import os

    from ct_diffusionmodelbench_tpu.train.trainer import TrainConfig

    tcfg = TrainConfig(learning_rate=5e-5, grad_accum=4, batch_size=1,
                       max_length=2048, remat=True,
                       optimizer_state_dtype="int8",
                       grad_accum_dtype="bfloat16")
    os.environ["CTDB_MOE_STACKED"] = "0"  # see bench_sft_moe
    os.environ["CTDB_RAGGED_NT"] = "1"
    try:
        layers = int(os.environ.get("CTDB_BENCH_MOE_LAYERS", "0"))
        if layers:  # single attempt (we are the subprocess)
            row = _bench_sft_moe_inner(tcfg, layers)
            row["backward"] = ("CTDB_RAGGED_NT=1 non-transposing ragged "
                               "backward (memory over speed)")
            return row
        row = _bench_sft_moe_subprocess("sft_train_step_moe_max", (4, 3))
        row.setdefault("hbm_ceiling", (
            "3 layers with the FAST backward AOT-OOMs by 152 MB "
            "(15.90/15.75 GiB usable HBM, tools/moe_train_memfit.py) — "
            "nt is what buys the extra depth"))
        return row
    finally:
        os.environ.pop("CTDB_MOE_STACKED", None)
        os.environ.pop("CTDB_RAGGED_NT", None)


def _bench_sft_moe_subprocess(section="sft_train_step_moe",
                              ladder=(6, 5, 4, 3, 2)):
    """Each layer-count attempt in its OWN process: HBM freed after an OOM
    inside a process is not reliably reusable by that process (CLAUDE.md) —
    in-process retries inherit a poisoned heap and fail even when the
    smaller model fits a clean one."""
    import os
    import subprocess
    import sys

    last = None
    failed = []
    # Descend from the deepest plausible stack; chunked CE (TrainConfig
    # ce_chunk, round 4) removed the [L, V] f32 logits+cotangent peak that
    # stopped round 3 at 2 layers.
    for layers in ladder:
        env = dict(os.environ, CTDB_BENCH_MOE_LAYERS=str(layers))
        try:
            run = subprocess.run(
                [sys.executable, __file__, "--only", section],
                capture_output=True, text=True, timeout=3600, env=env)
        except subprocess.TimeoutExpired:
            # A hung attempt (remote compiles can take minutes, CLAUDE.md)
            # is a failed rung, not a reason to abort the whole descent.
            failed.append(layers)
            time.sleep(150)
            continue
        for line in reversed(run.stdout.strip().splitlines()):
            try:
                row = json.loads(line).get(section)
            except Exception:
                continue
            if row and "error" not in row:
                if failed:
                    row["hbm_ceiling"] = (
                        f"deeper stacks OOMed this config: layers "
                        f"{failed} (15.75 GiB usable HBM)")
                return row
            last = row
            break
        failed.append(layers)
        time.sleep(150)  # axon HBM reclamation lag between attempts
    raise RuntimeError(f"all MoE layer counts OOMed: {last}")


def _bench_sft_moe_inner(tcfg, layers):
    from ct_diffusionmodelbench_tpu.models import get_config

    cfg = get_config("llada-moe-7b").replace(num_layers=layers)
    return _sft_row(
        cfg, tcfg,
        f"llada-moe-7b arch, {layers} layers "
        f"({cfg.param_count()/1e9:.2f}B total / "
        f"{cfg.active_param_count()/1e9:.2f}B active, int8 Adam)")


def bench_llada8b_int8():
    """The north star's OWN model on ONE chip: LLaDA-8B bf16 is ~16.3 GB
    (> one v5e's 16 GB HBM; the reference splits it across 2 GPUs with
    device_map="auto" — Inference/chat_finetuned.py:138-144), but
    weight-only int8 (ops/quant.py) fits it in ~8.2 GB.  Config: gen 256,
    256 steps, block 32 (the north-star shape, BASELINE.json:2).

    No ``vs_*`` field: the reference never benchmarked dense LLaDA-8B
    generation — its only committed generation baselines are the MoE
    (57.09 s), Dream (49.61 s), and DiffuCoder (8.02 s) rows of
    model_performance.md:3-5 (VERDICT r3 item 2: a prior derived 105.95 s
    figure was unsourced and is dropped).  The row stands on its measured
    s/sample, tok/s, and MFU."""
    from ct_diffusionmodelbench_tpu.models import (
        get_config, init_params, make_forward_fn)
    from ct_diffusionmodelbench_tpu.ops.quant import quantized_leaf_transform
    from ct_diffusionmodelbench_tpu.sampling import llada_generate

    cfg = get_config("llada-8b")
    params = init_params(cfg, jax.random.key(0),
                         leaf_transform=quantized_leaf_transform)
    jax.block_until_ready(params)
    fwd = make_forward_fn(cfg)

    def run(batch, reps=2):
        prompt = jnp.full((batch, 64), 17, jnp.int32)
        return _t(lambda: llada_generate(
            fwd, params, prompt, steps=256, gen_length=256, block_length=32,
            mask_id=cfg.mask_token_id, key=jax.random.key(2))[0], reps=reps)

    dt1 = run(1)
    batch = 4
    dtb = run(batch)
    from ct_diffusionmodelbench_tpu.utils.profiling import (
        onchip_device_seconds)
    prompt_b = jnp.full((batch, 64), 17, jnp.int32)
    oc = onchip_device_seconds(lambda: np.asarray(llada_generate(
        fwd, params, prompt_b, steps=256, gen_length=256, block_length=32,
        mask_id=cfg.mask_token_id, key=jax.random.key(2))[0]))
    nbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    del params
    # Block-sliced lm head: llada_generate computes logits only for the
    # active 32-token block each step, not all 320 positions.
    flops_per_sample = 256 * cfg.forward_flops(64 + 256, lm_head_width=32)
    row = {
        "model": "llada-8b (full size, int8 weight-only, ONE chip)",
        "params_total_b": round(cfg.param_count() / 1e9, 2),
        "weights_gb": round(nbytes / 1e9, 2),
        "config": "gen 256, 256 steps, block 32 (north-star reference config)",
        "single_sample_sec": round(dt1, 3),
        "batched_sec_per_sample": round(dtb / batch, 3),
        "batch": batch,
        "tok_per_sec_per_chip": round(256 * batch / dtb, 1),
        "mfu": round(batch * flops_per_sample / dtb / _peak(), 4),
        "baseline_note": "no vs_* ratio: the reference has no committed "
                         "dense-LLaDA-8B generation benchmark "
                         "(model_performance.md:3-5 covers MoE/Dream/"
                         "DiffuCoder only)",
        "note": "random-init weights (zero egress); int8 is opt-in "
                "(--quant int8) and approximate — bf16 under TP>=2 is the "
                "exact path (tests/test_full_size_lowering.py)",
    }
    if oc:
        row["onchip_seconds_per_batch"] = round(oc, 3)
        row["onchip_sec_per_sample"] = round(oc / batch, 3)
        row["mfu_onchip"] = round(batch * flops_per_sample / oc / _peak(), 4)
    return row


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated section names; existing PERF.json "
                         "rows for other sections are kept.  Use one section "
                         "per process for the big SFT rows: HBM freed by a "
                         "previous section in the SAME process is not "
                         "reliably reusable on the axon pool (CLAUDE.md).")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "perf ledger is a TPU artifact"
    ledger = {"chip_kind": jax.devices()[0].device_kind}
    if args.only and os.path.exists("PERF.json"):
        with open("PERF.json") as f:
            ledger = json.load(f)
        ledger["chip_kind"] = jax.devices()[0].device_kind
    only = set(args.only.split(",")) if args.only else None
    for name, fn in (("attention_crossover", bench_attention_crossover),
                     ("grouped_gemm", bench_grouped_gemm),
                     ("dream_reference_config", bench_dream),
                     ("sft_train_step", bench_sft),
                     ("sft_train_step_int8_adam", bench_sft_int8_full2b),
                     ("sft_train_step_moe", bench_sft_moe),
                     ("sft_train_step_moe_max", bench_sft_moe_max),
                     ("llada_8b_int8_single_chip", bench_llada8b_int8)):
        if only is not None and name not in only:
            continue
        try:
            ledger[name] = fn()
        except Exception:
            # Axon pool reclamation lag: HBM freed by the previous section
            # only returns ~1-2 min later, and an OOM poisons allocations
            # until then (CLAUDE.md) — sleep it off and retry once.
            import gc
            gc.collect()
            time.sleep(150)
            try:
                ledger[name] = fn()
            except Exception as e:  # keep the partial ledger
                ledger[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        with open("PERF.json", "w") as f:
            json.dump(ledger, f, indent=2)
    print(json.dumps(ledger))


if __name__ == "__main__":
    main()
