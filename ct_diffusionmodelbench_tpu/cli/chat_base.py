"""Autoregressive baseline chat CLI.

Port of Inference/Llada_MoE/chat_base_model.py:9-165 (H9): interactive chat
with plain AR ``generate`` over a causal model — the sanity baseline for the
base model (also covers the LLaDOU probe interface,
Pre-Trained/chat_with_models/lladou.py).  Keeps the 10-message history cap.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner
from ct_diffusionmodelbench_tpu.sampling.simple import ar_generate
from ct_diffusionmodelbench_tpu.utils.logging import log

HISTORY_CAP = 10  # chat_base_model.py keeps the last 10 messages


def build_parser():
    p = argparse.ArgumentParser(description="Chat with an AR baseline model")
    p.add_argument("--model-dir", type=str, default=None)
    p.add_argument("--preset", type=str, default=None)
    p.add_argument("--prompt", type=str, default=None, help="One-shot prompt")
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--max-length", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    return p


def _respond(runner, messages, args) -> str:
    prompt = runner.tokenizer.apply_chat_template(messages, add_generation_prompt=True)
    ids = np.asarray(runner.tokenizer.encode(prompt, max_length=args.max_length),
                     np.int32)
    out = ar_generate(
        runner.forward_fn, runner.params, ids[None],
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_p=args.top_p,
        eos_token_id=runner.eos_token_id,
        pad_token_id=runner.tokenizer.pad_token_id or 0,
        key=jax.random.key(args.seed))
    cont = np.asarray(out)[0, len(ids):]
    if runner.eos_token_id is not None:
        hits = np.nonzero(cont == runner.eos_token_id)[0]
        if hits.size:
            cont = cont[: int(hits[0])]
    return runner.tokenizer.decode(cont, skip_special_tokens=True)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.preset:
        runner = ModelRunner.random_init(args.preset)
    elif args.model_dir:
        runner = ModelRunner.from_dir(args.model_dir)
    else:
        raise SystemExit("need --model-dir or --preset")
    # AR baseline semantics: causal mask, and NO diffusion logit shift —
    # ar_generate reads logits[:, pos-1] itself; leaving logit_shift on for a
    # Dream/DiffuCoder checkpoint would double-shift and sample from pos-2.
    runner.cfg = runner.cfg.replace(causal=True, logit_shift=False)
    # rebuild the forward for the causal config
    from ct_diffusionmodelbench_tpu.models.transformer import make_forward_fn
    runner.forward_fn = make_forward_fn(runner.cfg)

    messages = [{"role": "system",
                 "content": "You are a helpful, general-purpose AI assistant."}]

    if args.prompt is not None:
        messages.append({"role": "user", "content": args.prompt})
        print(_respond(runner, messages, args))
        return

    print("\nAR baseline chat. Commands: /exit, /reset\n")
    while True:
        try:
            user_text = input("You: ").strip()
        except (EOFError, KeyboardInterrupt):
            print("\nExiting.")
            break
        if not user_text:
            continue
        if user_text.lower() == "/exit":
            break
        if user_text.lower() == "/reset":
            messages = messages[:1]
            print("History cleared.")
            continue
        messages.append({"role": "user", "content": user_text})
        if len(messages) > HISTORY_CAP:
            messages = [messages[0]] + messages[-(HISTORY_CAP - 1):]
        reply = _respond(runner, messages, args)
        print(f"Assistant:\n{reply}\n")
        messages.append({"role": "assistant", "content": reply})


if __name__ == "__main__":
    main()
