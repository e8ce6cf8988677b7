"""Measure this chip's ACHIEVABLE HBM bandwidth (device-plane, contention-
robust) — the denominator for every bandwidth-floor claim in docs/STATUS.md.

Two access patterns:
- elementwise stream (read + write 256 MB per iteration): the practical
  peak for sequential traffic.  Measured 627 GB/s on the pool's v5e —
  ~76% of the 820 GB/s nominal; floors computed against the nominal
  overstate the remaining headroom by a third.
- 4 KB-row gather (20480 random [1, 2048] bf16 rows — the grouped-FFN
  combine / gather-in pattern): measured ~290 GB/s effective.

On-chip durations stay valid under pool contention (CLAUDE.md), so this
runs safely in any window.
"""

import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from xprof_ffn import collect_xspace, device_op_totals  # noqa: E402

ITERS = 16


def _while_ms(fn, *args) -> float:
    """On-chip total of the program's while op (the fori_loop)."""
    np.asarray(fn(*args))  # compile + warm
    d = tempfile.mkdtemp(prefix="hbm_cal_")
    with jax.profiler.trace(d):
        np.asarray(fn(*args))
    totals = device_op_totals(collect_xspace(d))
    return max(ms for (line, name), (ms, _) in totals.items()
               if line == "XLA Ops" and name.lstrip("%").startswith("while"))


def main():
    x = jax.random.normal(jax.random.key(0), (128 << 20,), jnp.bfloat16)

    @jax.jit
    def stream(x):
        # The update must be genuinely i-dependent — an algebraically
        # foldable body (e.g. `c * (1 + i*0)`) risks the simplifier turning
        # the loop into identity and DCE silently inflating the reported
        # bandwidth (ADVICE r3).  `c + eps*(i%2)` still reads+writes the
        # full array every iteration and cannot fold across iterations.
        def body(i, c):
            return c + (i % 2).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, ITERS, body, x).sum().astype(jnp.float32)

    ms = _while_ms(stream, x) / ITERS
    moved = 2 * x.size * x.dtype.itemsize
    print(f"stream: {ms:.3f} ms / {moved >> 20} MiB moved "
          f"-> {moved / (ms / 1e3) / 1e9:.0f} GB/s")

    src = jax.random.normal(jax.random.key(1), (24576, 2048), jnp.bfloat16)
    idx = jax.random.randint(jax.random.key(2), (20480,), 0, 24576)

    @jax.jit
    def gather(src, idx):
        def body(i, c):
            rows = jnp.take(src, (idx + i) % 24576, axis=0, mode="clip")
            return c + rows.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    ms = _while_ms(gather, src, idx) / ITERS
    moved = 2 * idx.size * 2048 * 2  # read rows + write result
    print(f"4KB-row gather: {ms:.3f} ms -> "
          f"{moved / (ms / 1e3) / 1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
