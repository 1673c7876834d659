"""ctypes bindings for the native C++ data-path runtime (native/dose_io.cpp).

Builds lazily with make on first use; every entry point falls back to the
pure-numpy reader (data/nifti.py) when the native library is unavailable, so
the framework works identically either way — native is the fast path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdose_io.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always run make (a no-op when fresh): the .so must track dose_io.cpp
    # edits, and an existing stale binary would otherwise never rebuild.
    # A failed make (no toolchain) still falls back to a prebuilt .so.
    if not _build() and not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.dose_io_load.restype = ctypes.c_int
    lib.dose_io_load.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float)]
    lib.dose_io_probe.restype = ctypes.c_int
    lib.dose_io_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float)]
    lib.dose_io_load_full.restype = ctypes.c_int
    lib.dose_io_load_full.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.dose_io_load_batch.restype = ctypes.c_int
    lib.dose_io_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.dose_io_preprocess_ct.restype = None
    lib.dose_io_preprocess_ct.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float]
    if hasattr(lib, "dose_io_augment_dose_bf16"):
        lib.dose_io_augment_dose_bf16.restype = ctypes.c_int
        lib.dose_io_augment_dose_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int]
    if hasattr(lib, "dose_io_augment_seg_bf16"):
        lib.dose_io_augment_seg_bf16.restype = ctypes.c_int
        lib.dose_io_augment_seg_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_volume_f32(path: str | Path) -> Optional[Tuple[np.ndarray, Tuple[float, float, float]]]:
    """Native load of one NIfTI volume as float32 (i,j,k order); None when the
    native library is unavailable or declines the file."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 3)()
    spacing = (ctypes.c_float * 3)()
    if lib.dose_io_probe(str(path).encode(), shape, spacing) != 0:
        return None
    n = shape[0] * shape[1] * shape[2]
    buf = np.empty(n, np.float32)
    rc = lib.dose_io_load(str(path).encode(),
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, shape, spacing)
    if rc != 0:
        return None
    # NIfTI voxels are Fortran-ordered; match data.nifti.read_nifti layout
    data = buf.reshape((shape[2], shape[1], shape[0])).transpose(2, 1, 0)
    return np.ascontiguousarray(data), (spacing[0], spacing[1], spacing[2])


def read_image_full(path: str | Path):
    """Native load of one volume with full geometry: returns
    (data (i,j,k) float32, spacing, affine 4x4) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 3)()
    spacing = (ctypes.c_float * 3)()
    affine12 = (ctypes.c_float * 12)()
    if lib.dose_io_probe(str(path).encode(), shape, spacing) != 0:
        return None
    n = shape[0] * shape[1] * shape[2]
    buf = np.empty(n, np.float32)
    rc = lib.dose_io_load_full(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, shape, spacing, affine12)
    if rc != 0:
        return None
    data = buf.reshape((shape[2], shape[1], shape[0])).transpose(2, 1, 0)
    affine = np.eye(4)
    affine[:3, :] = np.asarray(affine12, np.float64).reshape(3, 4)
    return (np.ascontiguousarray(data),
            (float(spacing[0]), float(spacing[1]), float(spacing[2])), affine)


def read_batch_f32(paths: Sequence[str | Path], *, n_threads: int = 4
                   ) -> Optional[List[Tuple[np.ndarray, Tuple[float, float, float]]]]:
    """Concurrent native load of many volumes; None on unavailability."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    count = len(paths)
    shapes = (ctypes.c_int64 * (3 * count))()
    spacings = (ctypes.c_float * (3 * count))()
    # probe for max size
    stride = 0
    for p in paths:
        sh = (ctypes.c_int64 * 3)()
        sp = (ctypes.c_float * 3)()
        if lib.dose_io_probe(str(p).encode(), sh, sp) != 0:
            return None
        stride = max(stride, sh[0] * sh[1] * sh[2])
    buf = np.empty(count * stride, np.float32)
    status = (ctypes.c_int * count)()
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    rc = lib.dose_io_load_batch(
        c_paths, count, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride, shapes, spacings, status, n_threads)
    if rc != 0:
        return None
    out = []
    for i in range(count):
        sx, sy, sz = shapes[3 * i], shapes[3 * i + 1], shapes[3 * i + 2]
        vol = buf[i * stride: i * stride + sx * sy * sz]
        data = vol.reshape((sz, sy, sx)).transpose(2, 1, 0)
        out.append((np.ascontiguousarray(data),
                    (spacings[3 * i], spacings[3 * i + 1], spacings[3 * i + 2])))
    return out


# canonical decision-drawing lives with the numpy transforms; re-exported here
# because the native path historically imported it from this module
from dose_prediction_tpu.data.transforms import draw_augment_decisions  # noqa: E402


def augment_dose_bf16(inp: np.ndarray, gt: np.ndarray,
                      rng: Optional[np.random.Generator] = None, *,
                      decisions: Optional[Tuple[float, int, int]] = None,
                      n_threads: int = 4
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused native augmentation + bf16 cast for one (D,H,W,Ci)/(D,H,W,Cg)
    sample: one gather pass instead of the numpy chain's several full-volume
    copies, and the output ships as bf16 (halves the H2D payload). Returns
    None when the native library is unavailable (callers fall back to the
    numpy chain). Outputs are uint16-viewed bf16 (reinterpret with
    jnp .view/bitcast or ml_dtypes.bfloat16).

    ``decisions`` takes pre-drawn (shift, flip_mask, rot_k); pass it when the
    caller wants to share one set of draws with a fallback path (the random
    stream must not diverge when the native call declines — ADVICE r2)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dose_io_augment_dose_bf16"):
        return None
    if inp.dtype != np.float32 or gt.dtype != np.float32:
        return None
    # the kernel indexes gt with inp's (d,h,w) strides — a rank or spatial
    # mismatch would read past gt's buffer (the seg twin has the same guard)
    if inp.ndim != 4 or gt.ndim != 4 or inp.shape[:3] != gt.shape[:3]:
        return None
    inp = np.ascontiguousarray(inp)
    gt = np.ascontiguousarray(gt)
    if decisions is None:
        decisions = draw_augment_decisions(rng)
    shift, flip_mask, rot_k = decisions
    d, h, w, ci = inp.shape
    cg = gt.shape[-1]
    od, oh = (h, d) if rot_k % 2 else (d, h)
    out_inp = np.empty((od, oh, w, ci), np.uint16)
    out_gt = np.empty((od, oh, w, cg), np.uint16)
    rc = lib.dose_io_augment_dose_bf16(
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        d, h, w, ci, cg, shift, flip_mask, rot_k,
        out_inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n_threads)
    if rc != 0:
        return None
    return out_inp, out_gt


def augment_seg_bf16(ct: np.ndarray, labels_u8: np.ndarray,
                     start: Tuple[int, int, int], crop: Sequence[int],
                     decisions: Tuple[float, int, int], *,
                     n_threads: int = 4
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused native seg crop + flips/rot90/intensity-shift + bf16 cast for ONE
    crop of a (D,H,W) CT volume with (D,H,W) uint8 labels: a single gather
    pass instead of the numpy chain's slice + flip/rot copies + cast, and the
    CT ships as bf16 (half the H2D payload). Returns (ct_u16_bf16, labels_u8)
    crops or None when the native library is unavailable / inputs unfit —
    callers fall back to the numpy chain with the SAME pre-drawn decisions
    (the random stream must not diverge)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dose_io_augment_seg_bf16"):
        return None
    if ct.dtype != np.float32 or labels_u8.dtype != np.uint8 or ct.ndim != 3:
        return None
    if ct.shape != labels_u8.shape:
        # the kernel indexes labels with the CT's strides — a mismatch would
        # read out of bounds; decline so the caller's numpy fallback handles it
        return None
    ct = np.ascontiguousarray(ct)
    labels_u8 = np.ascontiguousarray(labels_u8)
    shift, flip_mask, rot_k = decisions
    d, h, w = ct.shape
    z0, y0, x0 = (int(s) for s in start)
    cd, ch, cw = (int(c) for c in crop)
    od, oh = (ch, cd) if rot_k % 2 else (cd, ch)
    out_ct = np.empty((od, oh, cw), np.uint16)
    out_lab = np.empty((od, oh, cw), np.uint8)
    rc = lib.dose_io_augment_seg_bf16(
        ct.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d, h, w, z0, y0, x0, cd, ch, cw,
        shift, flip_mask, rot_k,
        out_ct.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out_lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads)
    if rc != 0:
        return None
    return out_ct, out_lab


def preprocess_ct_inplace(buf: np.ndarray, a_min: float = -1024.0,
                          a_max: float = 1500.0, scale: float = 1000.0) -> np.ndarray:
    """Native in-place CT clip+scale; numpy fallback."""
    lib = get_lib()
    if lib is not None and buf.dtype == np.float32 and buf.flags.c_contiguous:
        lib.dose_io_preprocess_ct(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
            a_min, a_max, 1.0 / scale)
        return buf
    np.clip(buf, a_min, a_max, out=buf)
    buf /= scale
    return buf
