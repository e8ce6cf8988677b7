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


def onchip_device_seconds(call) -> Optional[float]:
    """Device-plane busy time of one already-compiled ``call()``.

    Runs ``call`` under ``jax.profiler.trace`` and returns the union length
    of all "XLA Ops" intervals on the TPU device plane — union (not sum)
    because the xplane op line is hierarchical (a ``while`` event spans its
    body's events; summing would double-count).  This is the
    contention-robust companion to wall-clock timing: on the shared axon
    pool, tenant time-slicing happens *between* programs, so on-chip
    durations stay valid while wall-clock swings both directions
    (CLAUDE.md; VERDICT r3 item 3).

    Returns None off-TPU, if the xplane proto is unavailable, or if the
    trace holds no device events.  Caller must warm up/compile first —
    a compile inside the trace would be attributed to the call.
    """
    import glob
    import os
    import tempfile

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    import shutil

    d = tempfile.mkdtemp(prefix="onchip_")
    try:
        with jax.profiler.trace(d):
            call()
        pbs = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
        if not pbs:
            return None
        xs = xplane_pb2.XSpace()
        with open(sorted(pbs)[-1], "rb") as f:
            xs.ParseFromString(f.read())
    except Exception:
        return None
    finally:
        # Trace dirs run tens of MB and bench/bench_sweep call this per row.
        shutil.rmtree(d, ignore_errors=True)
    intervals = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            base = line.timestamp_ns * 1000  # ps
            for ev in line.events:
                s = base + ev.offset_ps
                intervals.append((s, s + ev.duration_ps))
    if not intervals:
        return None
    intervals.sort()
    busy_ps = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            busy_ps += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy_ps += cur_e - cur_s
    return busy_ps / 1e12
