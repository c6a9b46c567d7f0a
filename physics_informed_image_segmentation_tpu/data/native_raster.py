"""ctypes bindings for the native C++ polygon rasterizer.

Builds ``native/rasterize.cpp`` on first use (cached as
``native/build/librasterize.so``) and exposes single-image and
multithreaded batch rasterization with PIL-compatible semantics
(even-odd scanline fill + 1px outline, see native/rasterize.cpp).
Agreement with the PIL reference path is validated in
``tests/test_native.py`` (IoU ≥ 0.99 on random polygon scenes; the two
rasterizers may disagree on a thin ring of sub-pixel boundary cases).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["native_available", "rasterize_native", "rasterize_batch_native"]

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def _find_source() -> Path:
    """Locate rasterize.cpp in a checkout or an installed layout.

    Checkout / editable install: ``<repo>/native/rasterize.cpp``.
    Wheel install: shipped as a data file under
    ``<prefix>/share/physics_informed_image_segmentation_tpu/native/``
    (pyproject.toml ``[tool.setuptools.data-files]``).
    """
    share = Path("share") / "physics_informed_image_segmentation_tpu" / "native"
    candidates = [_REPO_ROOT / "native" / "rasterize.cpp"] + [
        Path(prefix) / share / "rasterize.cpp"
        # _REPO_ROOT covers `pip install --target DIR` (share/ lands in DIR)
        for prefix in dict.fromkeys((sys.prefix, sys.exec_prefix, _REPO_ROOT))
    ]
    for c in candidates:
        if c.exists():
            return c
    return candidates[0]  # report the checkout path in the build error


def _build_dir(src: Path) -> Path:
    """Prefer building next to the source; fall back to a user cache."""
    native_dir = src.parent
    if os.access(native_dir, os.W_OK):
        return native_dir / "build"
    cache = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    return Path(cache) / "physics_informed_image_segmentation_tpu" / "native"


_SRC = _find_source()
_BUILD_DIR = _build_dir(_SRC)
_SO = _BUILD_DIR / "librasterize.so"

_lib = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                    str(_SRC), "-o", str(_SO),
                ],
                check=True,
                capture_output=True,
                text=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.rasterize_mask.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.rasterize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib
    except (subprocess.CalledProcessError, OSError) as e:
        _build_error = str(e)
        return None


def native_available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _flatten_annotations(annotations: Sequence[dict]):
    """COCO annotations → (coords, counts) keeping polygons with >= 6
    coordinates, like /root/reference/src/dataset.py:104-110."""
    coords, counts = [], []
    for ann in annotations:
        seg = ann.get("segmentation", [])
        if isinstance(seg, list):
            for poly in seg:
                if len(poly) >= 6:
                    coords.append(np.asarray(poly, np.float64).reshape(-1))
                    counts.append(len(poly) // 2)
    if not coords:
        return np.zeros(0, np.float64), np.zeros(0, np.int32)
    return np.concatenate(coords), np.asarray(counts, np.int32)


def rasterize_native(
    annotations: Sequence[dict], original_size: tuple[int, int]
) -> np.ndarray:
    """One image's polygons → float32 mask at the ORIGINAL size (H, W).

    Resizing/binarization happens in :func:`..data.coco.rasterize_polygons`.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native rasterizer unavailable: {_build_error}")
    H, W = original_size
    coords, counts = _flatten_annotations(annotations)
    mask = np.zeros((H, W), np.uint8)
    lib.rasterize_mask(
        _ptr(coords, ctypes.c_double),
        _ptr(counts, ctypes.c_int32),
        len(counts),
        _ptr(mask, ctypes.c_uint8),
        H,
        W,
    )
    return mask.astype(np.float32)


def rasterize_batch_native(
    per_image_annotations: Sequence[Sequence[dict]],
    size: tuple[int, int],
    n_threads: int = 0,
) -> np.ndarray:
    """Rasterize many images' polygons in parallel (all at one size).

    Returns (N, H, W) float32 masks.  ``n_threads=0`` = hardware count.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native rasterizer unavailable: {_build_error}")
    H, W = size
    n = len(per_image_annotations)
    all_coords, all_counts = [], []
    poly_offsets = [0]
    coord_offsets = [0]
    for anns in per_image_annotations:
        coords, counts = _flatten_annotations(anns)
        all_coords.append(coords)
        all_counts.append(counts)
        poly_offsets.append(poly_offsets[-1] + len(counts))
        coord_offsets.append(coord_offsets[-1] + len(coords))
    coords = np.concatenate(all_coords) if all_coords else np.zeros(0, np.float64)
    counts = np.concatenate(all_counts) if all_counts else np.zeros(0, np.int32)
    poly_offsets = np.asarray(poly_offsets, np.int32)
    coord_offsets = np.asarray(coord_offsets, np.int64)
    masks = np.zeros((n, H, W), np.uint8)
    lib.rasterize_batch(
        _ptr(coords, ctypes.c_double),
        _ptr(counts, ctypes.c_int32),
        _ptr(poly_offsets, ctypes.c_int32),
        _ptr(coord_offsets, ctypes.c_int64),
        n,
        _ptr(masks, ctypes.c_uint8),
        H,
        W,
        n_threads,
    )
    return masks.astype(np.float32)
