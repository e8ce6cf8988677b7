"""Prompt bucketing must bound the number of sampler shape classes."""

import numpy as np

from ct_diffusionmodelbench_tpu.eval.runner import ModelRunner
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
