"""Checkpoint save/restore (orbax when available, msgpack fallback).

Stores the reference's checkpoint payload shape (train_seg.py:158-171):
trainable weights + optimizer state + step, plus a JSON-able meta dict
(epoch, best_f1, date, hyp).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import flax.serialization as ser
import jax


def save(path: str, state: Any, meta: Dict) -> None:
    payload = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(ser.to_bytes(payload))
    with open(path + ".meta.json", "w") as f:
        json.dump(_jsonable(meta), f)


def restore(path: str, template_state: Any) -> Dict:
    with open(path, "rb") as f:
        state = ser.from_bytes(template_state, f.read())
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return {"state": state, "meta": meta}


def _jsonable(obj):
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        if isinstance(obj, dict):
            return {k: _jsonable(v) for k, v in obj.items()}
        return str(obj)


# --- compact deploy checkpoints -------------------------------------------------
#
# Template-free npz format for shipping inference weights in-repo: nested
# variable dicts flatten to '/'-joined keys, stored float16 (inference is
# bf16 anyway, so fp16 storage rounding is below compute noise).


def save_compact(path: str, variables: Any, dtype="float16") -> None:
    import numpy as np

    flat: Dict[str, Any] = {}

    f16_max = np.finfo(np.float16).max

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            arr = np.asarray(jax.device_get(node))
            if arr.dtype.kind == "f":
                # keep wide-range arrays (e.g. large BN running vars) exact
                if np.abs(arr).max(initial=0.0) < 0.9 * f16_max:
                    arr = arr.astype(dtype)
            flat[prefix] = arr

    walk(variables, "")
    with open(path, "wb") as f:
        np.savez_compressed(f, **flat)


def load_compact(path: str) -> Dict:
    import numpy as np

    out: Dict = {}
    with np.load(path) as data:
        for key in data.files:
            arr = data[key]
            if arr.dtype.kind == "f":
                arr = arr.astype(np.float32)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out
