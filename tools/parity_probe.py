#!/usr/bin/env python
"""Executable real-checkpoint parity checklist (docs/PARITY.md §3).

The north star requires token-identical outputs against the HF/torch
reference (BASELINE.json), but this container has zero egress, so the real
checkpoints cannot be fetched.  The moment one IS mountable, this script runs
the named §3 risk list in one command:

    python tools/parity_probe.py /path/to/checkpoint [--prompt-len 16]

Probes (each reports PASS / FAIL / SKIP(reason); exit code 1 on any FAIL):

  config        config.json resolves through config_from_hf; dims/flags echoed
  load          every weight resolves through the alias tables; param count
                matches the config's arithmetic
  mask-id       resolve_mask_id chain agrees with the config
  logits        our forward vs the checkpoint's own torch forward (covers
                RMSNorm eps placement, RoPE variant, QK norms, router softmax
                order in one comparison) — needs the torch model, loaded via
                HF transformers ``trust_remote_code`` from the local dir
  shift-pos0    Dream-family token-shift convention at position 0
  sampler       greedy token parity: our fused sampler vs the reference
                algorithm (tests/reference_impl.py) driven by torch logits

The torch model is optional: without it the structural probes still run and
the behavioral ones SKIP with instructions.  Tests drive the full list with
the tiny torch oracles (tests/test_parity_probe.py), so the checklist itself
is exercised in CI even while the real checkpoints are unreachable.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _result(name, status, detail=""):
    return {"probe": name, "status": status, "detail": detail}


def run_probes(ckpt_dir, torch_model=None, prompt_len=16, seed=0,
               try_transformers=True):
    """Run the §3 checklist.  ``torch_model``: a callable ``ids_np -> logits
    np.ndarray [B, S, V]`` (the reference forward); if None and
    ``try_transformers``, an HF ``trust_remote_code`` local load is
    attempted.  Returns a list of result dicts."""
    import jax.numpy as jnp

    from ct_diffusionmodelbench_tpu.io.checkpoint import load_checkpoint
    from ct_diffusionmodelbench_tpu.models import make_forward_fn

    ckpt_dir = Path(ckpt_dir)
    results = []

    # -- config ------------------------------------------------------------
    try:
        from ct_diffusionmodelbench_tpu.models.config import config_from_hf
        cfg_probe = config_from_hf(ckpt_dir / "config.json")
        results.append(_result(
            "config", "PASS",
            f"family={cfg_probe.family or '?'} layers={cfg_probe.num_layers} "
            f"d={cfg_probe.hidden_size} heads={cfg_probe.num_heads}/"
            f"{cfg_probe.num_kv_heads} eps={cfg_probe.norm_eps} "
            f"theta={cfg_probe.rope_theta} qkv_bias={cfg_probe.attention_bias} "
            f"qk_norm={cfg_probe.qk_norm} shift={cfg_probe.logit_shift} "
            f"moe={cfg_probe.is_moe}"))
    except Exception as e:
        results.append(_result("config", "FAIL", repr(e)))
        return results

    # -- load --------------------------------------------------------------
    try:
        cfg, params = load_checkpoint(ckpt_dir, dtype="float32")
        import jax
        n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
        want = cfg.param_count()
        if n == want:
            results.append(_result("load", "PASS", f"{n:,} params"))
        else:
            results.append(_result(
                "load", "FAIL",
                f"loaded {n:,} params but config arithmetic says {want:,}"))
    except Exception as e:
        results.append(_result("load", "FAIL", repr(e)))
        return results

    # -- mask-id -----------------------------------------------------------
    try:
        from ct_diffusionmodelbench_tpu.io.tokenizer import resolve_mask_id
        try:
            from ct_diffusionmodelbench_tpu.io.tokenizer import Tokenizer
            tok = Tokenizer.from_pretrained(ckpt_dir)
        except Exception:
            tok = None
        mid = resolve_mask_id(cfg.mask_token_id, tok,
                              vocab_size=cfg.vocab_size)
        if cfg.mask_token_id is not None and mid != cfg.mask_token_id:
            results.append(_result(
                "mask-id", "FAIL",
                f"chain resolved {mid} but config says {cfg.mask_token_id}"))
        else:
            results.append(_result("mask-id", "PASS", f"mask_id={mid}"))
    except Exception as e:
        results.append(_result("mask-id", "SKIP", repr(e)))

    # -- torch forward (for the behavioral probes) -------------------------
    if torch_model is None and try_transformers:
        try:
            import torch as _torch
            from transformers import AutoModel
            hf = AutoModel.from_pretrained(
                ckpt_dir, trust_remote_code=True, local_files_only=True,
                torch_dtype=_torch.float32).eval()

            def torch_model(ids_np):
                with _torch.no_grad():
                    return hf(_torch.from_numpy(ids_np),
                              use_cache=False).logits.float().numpy()
        except Exception as e:
            results.append(_result(
                "torch-load", "SKIP",
                f"no local torch forward ({type(e).__name__}); pass one via "
                f"run_probes(torch_model=...) to run the behavioral probes"))

    rng = np.random.default_rng(seed)
    lo = 3
    hi = max(4, min(cfg.vocab_size - 4, 1000))
    ids = rng.integers(lo, hi, size=(1, prompt_len)).astype(np.int64)

    fwd = make_forward_fn(cfg)

    # -- logits ------------------------------------------------------------
    if torch_model is None:
        results.append(_result("logits", "SKIP", "no torch forward"))
    else:
        try:
            ref = np.asarray(torch_model(ids))
            ours = np.asarray(fwd(params, jnp.asarray(ids, jnp.int32))[0])
            err = float(np.max(np.abs(ours - ref) / (np.abs(ref) + 1e-3)))
            # rtol 2e-3 at f32: catches a wrong RoPE variant / eps placement
            # (those produce O(1) errors), passes accumulation-order noise.
            status = "PASS" if err < 2e-3 else "FAIL"
            results.append(_result("logits", status, f"max rel err {err:.2e} "
                                   f"(RMSNorm eps, RoPE variant, QK norm, "
                                   f"router order all fold into this)"))
        except Exception as e:
            results.append(_result("logits", "FAIL", repr(e)))

    # -- shift-pos0 --------------------------------------------------------
    if not cfg.logit_shift:
        results.append(_result("shift-pos0", "SKIP", "not a shifted-logit family"))
    elif torch_model is None:
        results.append(_result("shift-pos0", "SKIP", "no torch forward"))
    else:
        try:
            ref = np.asarray(torch_model(ids))
            raw = np.asarray(make_forward_fn(cfg.replace(logit_shift=False))(
                params, jnp.asarray(ids, jnp.int32))[0])
            keep = np.allclose(ref[:, 0], raw[:, 0], rtol=2e-3, atol=2e-3)
            shift = np.allclose(ref[:, 1:], raw[:, :-1], rtol=2e-3, atol=2e-3)
            if keep and shift:
                results.append(_result(
                    "shift-pos0", "PASS",
                    "position 0 keeps its own logits; i>0 shifted from i-1"))
            else:
                results.append(_result(
                    "shift-pos0", "FAIL",
                    f"pos0-keeps-own={keep} shifted-rest={shift} — the real "
                    f"checkpoint uses a different shift convention"))
        except Exception as e:
            results.append(_result("shift-pos0", "FAIL", repr(e)))

    # -- sampler -----------------------------------------------------------
    if torch_model is None:
        results.append(_result("sampler", "SKIP", "no torch forward"))
    else:
        try:
            prompt = ids[:, : max(4, prompt_len // 2)]
            mask_id = cfg.mask_token_id
            if mask_id is None:
                raise ValueError("config has no mask_token_id")

            def f64_logits(x_np):
                return np.asarray(torch_model(x_np)).astype(np.float64)

            if cfg.logit_shift:
                from tests.reference_impl import np_dream_generate
                from ct_diffusionmodelbench_tpu.sampling import dream_generate
                ref_tokens = np_dream_generate(
                    f64_logits, prompt, steps=4, max_new_tokens=8,
                    mask_id=mask_id, top_p=None, alg="entropy")
                ours_tokens, _ = dream_generate(
                    fwd, params, jnp.asarray(prompt, jnp.int32), steps=4,
                    max_new_tokens=8, temperature=0.0, top_p=None,
                    alg="entropy", mask_id=mask_id, exact=True)
            else:
                from tests.reference_impl import np_llada_generate
                from ct_diffusionmodelbench_tpu.sampling import llada_generate
                ref_tokens = np_llada_generate(
                    f64_logits, prompt, steps=4, gen_length=8,
                    block_length=4, mask_id=mask_id)
                ours_tokens = llada_generate(
                    fwd, params, jnp.asarray(prompt, jnp.int32), steps=4,
                    gen_length=8, block_length=4, mask_id=mask_id)
            if np.array_equal(np.asarray(ours_tokens), np.asarray(ref_tokens)):
                results.append(_result("sampler", "PASS",
                                       "greedy tokens bit-identical"))
            else:
                diff = int((np.asarray(ours_tokens) != ref_tokens).sum())
                results.append(_result("sampler", "FAIL",
                                       f"{diff} token positions differ"))
        except Exception as e:
            results.append(_result("sampler", "FAIL", repr(e)))

    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint", help="HF-layout checkpoint directory")
    p.add_argument("--prompt-len", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true", help="machine-readable output")
    args = p.parse_args(argv)

    results = run_probes(args.checkpoint, prompt_len=args.prompt_len,
                         seed=args.seed)
    if args.json:
        print(json.dumps(results, indent=2))
    else:
        for r in results:
            print(f"[{r['status']:>4}] {r['probe']:<12} {r['detail']}")
    failed = [r for r in results if r["status"] == "FAIL"]
    if failed:
        print(f"\n{len(failed)} probe(s) FAILED")
        return 1
    print("\nall runnable probes passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
