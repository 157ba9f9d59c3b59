"""tpu3d.runtime — native host-runtime components.

Currently: the C AP-matcher hot loop (ap_matcher.c) compiled on demand with the
system toolchain and loaded through cffi ABI mode (no pybind11 dependency).
Falls back cleanly to the pure-python implementations when no compiler exists.
"""

from .native import get_ap_matcher, native_available

__all__ = ["get_ap_matcher", "native_available"]
