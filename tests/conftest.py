"""Test fixtures. CPU backend + 8 virtual devices are set up by the repo-root
conftest.py re-exec before JAX is imported."""

import jax
import pytest

from ct_diffusionmodelbench_tpu.models import get_config, init_params, make_forward_fn


@pytest.fixture(scope="session")
def tiny_dense():
    cfg = get_config("llada-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    return cfg, params, make_forward_fn(cfg)


@pytest.fixture(scope="session")
def tiny_moe():
    cfg = get_config("llada-moe-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(1))
    return cfg, params, make_forward_fn(cfg)


@pytest.fixture(scope="session")
def tiny_dream():
    cfg = get_config("dream-tiny", dtype="float32")
    params = init_params(cfg, jax.random.key(2))
    return cfg, params, make_forward_fn(cfg)
