"""Tracing / profiling helpers.

The reference's observability is wall-clock timers around generation
(torch.cuda.synchronize brackets, llada.py:222-238) plus per-sample
``generation_time`` fields.  Equivalents here:

- :func:`device_timer` — wall-clock bracket that forces device completion via
  a device→host transfer (``block_until_ready`` alone does not block on
  tunneled/async PJRT backends),
- :func:`trace` — ``jax.profiler`` trace scope writing a TensorBoard-loadable
  profile (the richer TPU-native option the reference lacks).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion of every array in the pytree (D2H of one element)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards") or hasattr(leaf, "device"):
            np.asarray(jax.device_get(jax.tree.map(lambda x: x.ravel()[0], leaf)))


@contextlib.contextmanager
def device_timer(label: str = "", results: Optional[dict] = None):
    """``with device_timer("generate") as t: out = f(x); t.watch(out)``"""

    class _T:
        elapsed = 0.0

        def watch(self, tree):
            self._tree = tree

    t = _T()
    t._tree = None
    t0 = time.time()
    try:
        yield t
    finally:
        if t._tree is not None:
            sync(t._tree)
        t.elapsed = time.time() - t0
        if results is not None:
            results[label or "elapsed"] = t.elapsed


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
