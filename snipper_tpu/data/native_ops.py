"""Python bindings for the native host ops (native/imageops.cpp), with
pure-numpy fallbacks.

The reference's host hot loops ran in cv2's native code
(``datasets/transforms.py:142``); here ``warp_affine_native`` is the
framework's own C++ fused flip+warp+normalize+color op, and ``lsa_native``
a C++ Jonker-Volgenant assignment for host-side eval matching.
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

_ext = None


def _load():
    global _ext
    if _ext is not None:
        return _ext
    native_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    native_dir = os.path.abspath(native_dir)
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    # built in-place or under build/lib*
    for pat in (os.path.join(native_dir, "build", "lib*"),):
        for d in glob.glob(pat):
            if d not in sys.path:
                sys.path.insert(0, d)
    try:
        import _snipper_imageops  # type: ignore

        _ext = _snipper_imageops
    except ImportError:
        _ext = False
    return _ext


def have_native() -> bool:
    return bool(_load())


def warp_patch(img: np.ndarray, trans: np.ndarray, out_shape,
               do_flip: bool = False,
               color_scale=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Fused flip + bilinear warp + /255 + per-channel color scale + clip.
    ``img`` uint8 [H, W, 3]; returns float32 [out_h, out_w, 3]."""
    ext = _load()
    out_h, out_w = out_shape
    if ext:
        buf = ext.warp_affine(np.ascontiguousarray(img, np.uint8),
                              np.ascontiguousarray(trans, np.float64),
                              int(out_h), int(out_w), int(do_flip),
                              float(color_scale[0]), float(color_scale[1]),
                              float(color_scale[2]))
        # zero-copy view of the extension's bytearray (bytes(buf) would
        # copy ~5.8 MB per 600x800 frame in the loader hot loop)
        return np.frombuffer(buf, np.float32).reshape(out_h, out_w, 3)
    # numpy fallback
    from snipper_tpu.data.transforms import generate_patch_image

    patch = generate_patch_image(img, do_flip, trans, out_shape)
    for c in range(3):
        patch[:, :, c] = np.clip(patch[:, :, c] * color_scale[c], 0, 1)
    return patch.astype(np.float32)


def lsa(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment of each row to a distinct column (rows <= cols);
    returns col index per row."""
    ext = _load()
    if ext:
        return np.asarray(
            ext.lsa(np.ascontiguousarray(cost, np.float64)), np.int64)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.zeros(cost.shape[0], np.int64)
    out[rows] = cols
    return out


def lsa_pairs(cost: np.ndarray):
    """``scipy.optimize.linear_sum_assignment``-compatible optimal pairs
    ``(rows, cols)`` for an arbitrary ``[m, n]`` cost — the native JV when
    the extension is built (the role the reference's scipy calls play on
    the host eval path), scipy otherwise. Pair ORDER may differ from
    scipy's sorted rows; the assignment (as a set of pairs) is optimal
    either way."""
    cost = np.asarray(cost, np.float64)
    m, n = cost.shape
    if m == 0 or n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    if m <= n:
        return np.arange(m, dtype=np.int64), lsa(cost)
    rows = lsa(np.ascontiguousarray(cost.T))
    return rows, np.arange(n, dtype=np.int64)
