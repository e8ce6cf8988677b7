"""Pure-Python safetensors reader/writer (no torch dependency).

The reference round-trips all checkpoints through safetensors
(Training/Training_0to1k/train.py:355-376 saves sharded
``model.safetensors`` via HF; the finetuned dirs are reloaded with
``from_pretrained``).  We speak the same on-disk format directly:

    [8 bytes little-endian u64 header length][JSON header][raw tensor data]

with the header mapping tensor name → {dtype, shape, data_offsets} plus an
optional ``__metadata__`` dict.  Reading memory-maps the file and returns
zero-copy numpy views (bf16 via ml_dtypes), so a 16 GB checkpoint costs no
host RAM until tensors are touched.
"""

from __future__ import annotations

import json
import mmap
from pathlib import Path
from typing import Any, Dict, Iterable, Mapping, Optional

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "U64": np.dtype(np.uint64),
    "BOOL": np.dtype(np.bool_),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
}
_DTYPE_NAMES = {v: k for k, v in _DTYPES.items()}


def load_safetensors(path: str | Path) -> Dict[str, np.ndarray]:
    """Load every tensor as a zero-copy numpy view over an mmap."""
    path = Path(path)
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)

    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES[info["dtype"]]
        shape = tuple(info["shape"])
        lo, hi = info["data_offsets"]
        arr = np.frombuffer(mm, dtype=dtype, count=int(np.prod(shape)) if shape else 1,
                            offset=base + lo)
        out[name] = arr.reshape(shape)
        assert hi - lo == arr.nbytes, f"offset mismatch for {name}"
    return out


def read_metadata(path: str | Path) -> dict:
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
    return header.get("__metadata__", {})


def save_safetensors(
    path: str | Path,
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    """Write tensors in safetensors layout (C-contiguous, insertion order)."""
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        dt = _DTYPE_NAMES.get(arr.dtype)
        if dt is None:
            raise TypeError(f"unsupported dtype {arr.dtype} for tensor {name!r}")
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + arr.nbytes],
        }
        offset += arr.nbytes
        arrays.append(arr)

    blob = json.dumps(header, separators=(",", ":")).encode()
    # HF pads the header to an 8-byte boundary with spaces.
    pad = (8 - (len(blob) % 8)) % 8
    blob += b" " * pad

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        for arr in arrays:
            f.write(arr.tobytes())


def shard_tensors(
    tensors: Mapping[str, np.ndarray],
    max_shard_bytes: int,
) -> Iterable[Dict[str, np.ndarray]]:
    """Greedy sharding by insertion order, mirroring HF's
    ``save_pretrained(max_shard_size=...)`` behavior (train.py:361)."""
    shard: Dict[str, np.ndarray] = {}
    size = 0
    for name, arr in tensors.items():
        nbytes = np.ascontiguousarray(arr).nbytes
        if shard and size + nbytes > max_shard_bytes:
            yield shard
            shard, size = {}, 0
        shard[name] = arr
        size += nbytes
    if shard:
        yield shard
