"""Prompt bucketing must bound the number of sampler shape classes."""

import jax
import numpy as np

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner
from ct_diffusionmodelbench_tpu.sampling import dream as dream_mod
from ct_diffusionmodelbench_tpu.sampling import llada as llada_mod


def test_bucketing_bounds_sampler_cache():
    runner = ModelRunner.random_init("llada-tiny")  # bucket 64
    llada_mod._SAMPLER_CACHE.clear()
    kw = dict(gen_length=8, steps=8, block_length=4)
    # 12 prompts with ~distinct token lengths, all under one bucket (64)
    for n in range(5, 29, 2):
        runner.generate("x " * n, **kw)
    assert len(llada_mod._SAMPLER_CACHE) == 1, llada_mod._SAMPLER_CACHE.keys()

    # a prompt in the next bucket adds exactly one more class
    runner.generate("y " * 50, **kw)
    assert len(llada_mod._SAMPLER_CACHE) == 2


def test_dream_sampler_cache_evicts_fifo(tiny_dream, monkeypatch):
    """Identity-keyed Dream entries must not grow the cache without bound
    (VERDICT r4 item 7 — mirror of the llada bounded FIFO)."""
    cfg, params, fwd = tiny_dream
    monkeypatch.setattr(dream_mod, "_SAMPLER_CACHE_MAX", 2)
    dream_mod._SAMPLER_CACHE.clear()
    prompt = jax.random.randint(jax.random.key(40), (1, 6), 3,
                                cfg.vocab_size - 2)
    kw = dict(steps=2, max_new_tokens=4, temperature=0.0, alg="entropy",
              mask_id=500)
    wrappers = [(lambda p, ids, m=None, **k: fwd(p, ids, m, **k))
                for _ in range(3)]  # three distinct id() keys
    keys_seen = []
    for w in wrappers:
        dream_mod.dream_generate(w, params, prompt, **kw)
        keys_seen.append(next(reversed(dream_mod._SAMPLER_CACHE)))
    assert len(dream_mod._SAMPLER_CACHE) == 2
    # oldest entry (first wrapper's) was evicted, newest two remain
    assert keys_seen[0] not in dream_mod._SAMPLER_CACHE
    assert keys_seen[1] in dream_mod._SAMPLER_CACHE
    assert keys_seen[2] in dream_mod._SAMPLER_CACHE
    dream_mod._SAMPLER_CACHE.clear()
