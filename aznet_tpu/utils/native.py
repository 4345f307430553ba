"""ctypes bindings for the C++ host library (csrc/libaznet_host.so).

Reference equivalent: the compiled Cython modules (cython_bbox, cython nms)
the reference's Python imports (SURVEY.md §2.3). Loading is lazy and
optional — every function has a NumPy fallback at its call site, so the
framework works before ``make -C csrc`` has run.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc", "build", "libaznet_host.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.az_nms.restype = ctypes.c_int
    lib.az_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_int),
    ]
    lib.az_bbox_overlaps.restype = None
    lib.az_bbox_overlaps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.az_prep_blob.restype = None
    lib.az_prep_blob.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "az_coco_match"):  # absent in stale pre-round-4 builds
        lib.az_coco_match.restype = None
        lib.az_coco_match.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nms(dets: np.ndarray, thresh: float, offset: float = 1.0) -> list:
    """C++ greedy NMS; same contract as ops.nms.nms. Raises if lib missing."""
    lib = _lib()
    assert lib is not None, "libaznet_host.so not built (make -C csrc)"
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    if n == 0:
        return []
    keep = np.empty(n, np.int32)
    count = lib.az_nms(_fptr(dets), n, float(thresh), float(offset),
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:count].tolist()


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray,
                  offset: float = 1.0) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "libaznet_host.so not built (make -C csrc)"
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.empty((boxes.shape[0], query.shape[0]), np.float32)
    lib.az_bbox_overlaps(_fptr(boxes), boxes.shape[0], _fptr(query),
                         query.shape[0], float(offset), _fptr(out))
    return out


def coco_match_available() -> bool:
    # AZNET_NO_NATIVE_COCO=1 forces the NumPy fallback tier (A/B knob for
    # tools/bench_coco_eval.py; read per call so a tool can flip it).
    if os.environ.get("AZNET_NO_NATIVE_COCO") == "1":
        return False
    lib = _lib()
    return lib is not None and hasattr(lib, "az_coco_match")


def coco_match(ious: np.ndarray, gt_ignore: np.ndarray, crowd: np.ndarray,
               thrs: np.ndarray):
    """C++ COCO greedy matcher; contract of eval.coco_eval._match_image.

    ``thrs`` must already be clamped (min(t, 1-1e-10)) by the caller.
    """
    lib = _lib()
    assert lib is not None and hasattr(lib, "az_coco_match"), \
        "libaznet_host.so missing az_coco_match (make -C csrc)"
    n_d, n_g = ious.shape
    n_t = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    thrs = np.ascontiguousarray(thrs, np.float64)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    cr = np.ascontiguousarray(crowd, np.uint8)
    dtm = np.empty((n_t, n_d), np.uint8)
    dtig = np.empty((n_t, n_d), np.uint8)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))  # noqa: E731
    f64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
    lib.az_coco_match(f64p(ious), n_d, n_g, u8p(gi), u8p(cr), f64p(thrs),
                      n_t, u8p(dtm), u8p(dtig))
    return dtm.astype(bool), dtig.astype(bool)


def prep_blob(im: np.ndarray, out_h: int, out_w: int, scale: float,
              means) -> np.ndarray:
    """Fused uint8-BGR -> mean-subtracted resized float32 canvas."""
    lib = _lib()
    assert lib is not None, "libaznet_host.so not built (make -C csrc)"
    im = np.ascontiguousarray(im, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    m = np.ascontiguousarray(means, np.float32)
    lib.az_prep_blob(
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        im.shape[0], im.shape[1], _fptr(out), out_h, out_w, float(scale),
        _fptr(m),
    )
    return out
