"""Environment-variable feature flags for the op library.

``TPU3D_DISABLE_PALLAS`` and ``TPU3D_BALLQ_NEAREST`` are debug/A-B knobs.
Values ``""``, ``"0"``, ``"false"``, ``"no"``, ``"off"`` (any case) are OFF —
``FLAG=0`` must not enable a flag. The knobs are read at TRACE time: flipping
one after a jitted program has compiled has no effect on the cached
executable (start a new process, or call the op with new shapes).
"""

from __future__ import annotations

import os

_FALSY = {"", "0", "false", "no", "off"}


def env_flag(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() not in _FALSY


def env_int(name: str) -> int | None:
    """Integer-valued knob; unset/empty/non-numeric reads as None."""
    raw = os.environ.get(name, "").strip()
    try:
        return int(raw)
    except ValueError:
        return None
