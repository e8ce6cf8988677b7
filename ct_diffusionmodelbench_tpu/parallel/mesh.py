"""Device mesh setup and multi-host initialization.

The reference has no first-class parallelism layer — DP/TP are delegated to
HF Trainer DDP and ``device_map="auto"`` layer placement (SURVEY.md §2.4
P1-P6).  TPU-native replacement: one 2-axis logical mesh

    ("data", "model")

where the batch shards over ``data`` and attention heads / MLP hidden /
MoE experts shard over ``model`` (megatron-style TP).  XLA inserts the
all-reduce / all-gather / reduce-scatter collectives over ICI from the
NamedSharding annotations — there is no hand-written communication layer,
matching how the reference never calls NCCL directly.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, MODEL_AXIS)

_current_mesh: contextvars.ContextVar[Optional[jax.sharding.Mesh]] = \
    contextvars.ContextVar("ctdb_mesh", default=None)


def make_mesh(data: int = 1, model: Optional[int] = None,
              seq: int = 1) -> jax.sharding.Mesh:
    """Build the (data[, seq], model) mesh.

    ``model=None`` → all remaining devices.  ``seq > 1`` inserts a ``seq``
    axis between ``data`` and ``model`` for ring-attention context
    parallelism (ops/ring_attention.py); with ``seq == 1`` the mesh stays
    2-axis so every existing (data, model) sharding is unchanged.
    """
    n = len(jax.devices())
    if model is None:
        if n % (data * seq):
            raise ValueError(
                f"{n} devices not divisible by data={data} x seq={seq}")
        model = n // (data * seq)
    need = data * seq * model
    if need > n:
        raise ValueError(
            f"mesh {data}x{seq}x{model} needs {need} devices, have {n}")
    if seq == 1:
        shape, axes = (data, model), AXES
    else:
        shape, axes = (data, seq, model), (DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
    # Auto axis types = classic GSPMD: XLA propagates intermediate shardings
    # and inserts the collectives (jax 0.9 defaults to Explicit, which
    # rejects e.g. vocab-sharded embedding gathers without manual out
    # shardings).
    auto = (jax.sharding.AxisType.Auto,) * len(axes)
    return jax.make_mesh(shape, axes, axis_types=auto,
                         devices=jax.devices()[:need])


def seq_axis_size(mesh: Optional[jax.sharding.Mesh]) -> int:
    """Ring size of the mesh's ``seq`` axis (1 when absent/no mesh)."""
    if mesh is None:
        return 1
    return dict(mesh.shape).get(SEQ_AXIS, 1)


def current_mesh() -> Optional[jax.sharding.Mesh]:
    return _current_mesh.get()


@contextlib.contextmanager
def use_mesh(mesh: Optional[jax.sharding.Mesh]):
    """Activate a mesh for the scope: the attention dispatcher and MoE path
    consult this to pick shard_map-wrapped kernels."""
    token = _current_mesh.set(mesh)
    try:
        yield mesh
    finally:
        _current_mesh.reset(token)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (one call per host before any jax op).

    Replaces the reference's implicit ``torch.distributed`` init inside HF
    Trainer (ddp_timeout=3600, train.py:459).  No-op on a single host.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
