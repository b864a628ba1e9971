"""Loader for the ctdnative C++ extension (native/ctdnative.cpp).

Native host kernels (union-find CC, hull+calipers min-area rects) for the
DB-decode host path — the framework's replacement for the OpenCV/Clipper
C++ the reference depends on.  Falls back to the NumPy implementations in
ops/geometry.py / scipy when the extension isn't built.
"""

from __future__ import annotations

import importlib
import os
import sys

_NATIVE = None
_TRIED = False


def get_native():
    """Return the ctdnative module or None."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        _NATIVE = importlib.import_module("ctdnative")
    except ImportError:
        _NATIVE = None
    return _NATIVE


def available() -> bool:
    return get_native() is not None
