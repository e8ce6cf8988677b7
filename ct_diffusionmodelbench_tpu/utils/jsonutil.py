"""JSON sanitization for result artifacts.

The reference benchmark recursively converts numpy scalar/array types before
json.dump (Pre-Trained/bench_models/dream.py:253-266 `convert_numpy_types`).
We do the same, additionally handling JAX arrays since our metrics come off
device.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def to_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {key: to_jsonable(value) for key, value in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_jsonable(item) for item in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    # jax.Array without importing jax at module load.
    if type(obj).__module__.startswith("jax") and hasattr(obj, "tolist"):
        return obj.tolist()
    return obj
