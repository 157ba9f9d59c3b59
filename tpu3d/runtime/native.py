"""Build + load the native AP matcher (cffi ABI mode, gcc-compiled .so).

The library is rebuilt automatically whenever ap_matcher.c is newer than the
cached .so. Thread-safe single-shot loading; failures degrade to None so callers
can fall back to the python implementation.
"""

from __future__ import annotations

import os
import subprocess
import threading

_CDEF = """
long collect_tp_scores(
    int num_images,
    const long *dt_nums, const long *gt_nums,
    const double *overlaps_flat, const long *overlap_offsets,
    const double *dt_scores_flat, const long *dt_offsets,
    const long *ignored_gt_flat, const long *gt_offsets,
    const long *ignored_det_flat,
    double min_overlap,
    double *out_scores);

void fused_statistics(
    int num_images,
    const long *dt_nums, const long *gt_nums, const long *dc_nums,
    const double *overlaps_flat, const long *overlap_offsets,
    const double *dt_scores_flat, const double *dt_alphas_flat,
    const long *dt_offsets,
    const double *gt_alphas_flat, const long *ignored_gt_flat,
    const long *gt_offsets,
    const long *ignored_det_flat,
    const double *dc_overlaps_flat, const long *dc_offsets,
    int metric, double min_overlap,
    const double *thresholds, int n_thresh,
    int compute_aos,
    double *pr);
"""

_IOU_CDEF = """
void rotated_overlap_bev(const double *boxes_a, long n, const double *boxes_b,
                         long m, int criterion, double *out);
"""

_lock = threading.Lock()
_libs: dict = {}
_tried: set = set()


def _build_and_load(src_name: str, cdef: str):
    import cffi

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, src_name + ".c")
    so = os.path.join(here, f"_{src_name}.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        cc = os.environ.get("CC", "gcc")
        cmd = [cc, "-O3", "-fPIC", "-shared", "-o", so, src, "-lm"]
        subprocess.run(cmd, check=True, capture_output=True)
    ffi = cffi.FFI()
    ffi.cdef(cdef)
    return ffi, ffi.dlopen(so)


def _get(src_name: str, cdef: str):
    with _lock:
        if src_name not in _tried:
            _tried.add(src_name)
            try:
                _libs[src_name] = _build_and_load(src_name, cdef)
            except Exception:
                _libs[src_name] = (None, None)
    return _libs.get(src_name, (None, None))


def get_ap_matcher():
    """Return (ffi, lib) or (None, None) when the native path is unavailable."""
    return _get("ap_matcher", _CDEF)


def get_rotated_iou():
    """Native host rotated-IoU kernel; (ffi, lib) or (None, None)."""
    return _get("rotated_iou", _IOU_CDEF)


def native_available() -> bool:
    return get_ap_matcher()[1] is not None
