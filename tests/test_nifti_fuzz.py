"""Malformed-NIfTI corpus (VERDICT r4 next-round #9): data/nifti.py is the
only hand-rolled binary parser on the product path — every real-data run
starts at read_nifti — so corrupted inputs must raise clean ValueErrors (or,
on the native C++ fast path, decline cleanly into the numpy path's error),
never crash, hang, or silently return garbage.

Each case corrupts a VALID fixture in one specific way. Both readers are
exercised: read_nifti(prefer_native=True) covers the native decline + numpy
raise chain; the native probe/load are also poked directly where the failure
mode differs (e.g. lying dims once caused a heap overread with rc=0).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np
import pytest

from dose_prediction_tpu.data import native as N
from dose_prediction_tpu.data.nifti import read_nifti, write_nifti


@pytest.fixture
def valid_nii(tmp_path) -> Path:
    vol = np.arange(4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    path = tmp_path / "ok.nii.gz"
    write_nifti(path, vol, spacing=(1.5, 1.5, 2.0))
    return path


def _raw_bytes(path: Path) -> bytearray:
    with gzip.open(path, "rb") as f:
        return bytearray(f.read())


def _write_corrupt(tmp_path: Path, raw: bytes, name="bad.nii.gz") -> Path:
    out = tmp_path / name
    with gzip.open(out, "wb") as f:
        f.write(bytes(raw))
    return out


def test_valid_fixture_roundtrips(valid_nii):
    img = read_nifti(valid_nii)
    assert img.shape == (4, 5, 6)
    assert np.allclose(img.data.ravel()[: 3], [0, 1, 2])


def test_truncated_gzip(valid_nii, tmp_path):
    blob = valid_nii.read_bytes()
    bad = tmp_path / "trunc.nii.gz"
    bad.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="gzip|truncated"):
        read_nifti(bad)


def test_not_gzip_not_nifti(tmp_path):
    bad = tmp_path / "junk.nii.gz"
    bad.write_bytes(b"\x00" * 600)  # neither gzip magic nor NIfTI header
    with pytest.raises(ValueError):
        read_nifti(bad)


def test_empty_file(tmp_path):
    bad = tmp_path / "empty.nii.gz"
    bad.write_bytes(b"")
    with pytest.raises(ValueError):
        read_nifti(bad)


def test_truncated_header(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    bad = _write_corrupt(tmp_path, raw[:100])
    with pytest.raises(ValueError, match="truncated"):
        read_nifti(bad)


def test_bad_magic(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    raw[344:348] = b"XXX\x00"
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="magic"):
        read_nifti(bad)


def test_bad_sizeof_hdr(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<i", raw, 0, 12345)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="NIfTI"):
        read_nifti(bad)


def test_lying_dims_more_voxels_than_data(valid_nii, tmp_path):
    """The nastiest case: header claims 64³ but only 4·5·6 voxels follow.
    Must raise (numpy) / decline (native) — NOT read past the buffer."""
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<8h", raw, 40, 3, 64, 64, 64, 1, 1, 1, 1)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="truncated"):
        read_nifti(bad)
    # direct native poke: the load must FAIL, not return success over garbage
    if N.native_available():
        assert N.read_volume_f32(bad) is None


def test_negative_dims(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<8h", raw, 40, 3, -4, 5, 6, 1, 1, 1, 1)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="non-positive|invalid"):
        read_nifti(bad)
    if N.native_available():
        assert N.read_volume_f32(bad) is None


def test_zero_rank_and_absurd_rank(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    for rank in (0, 19):
        struct.pack_into("<h", raw, 40, rank)
        bad = _write_corrupt(tmp_path, raw, f"rank{rank}.nii.gz")
        with pytest.raises(ValueError, match="rank"):
            read_nifti(bad)


def test_huge_dims_do_not_allocate(valid_nii, tmp_path):
    """30000³ voxels = 108 TB: must raise promptly, not attempt allocation."""
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<8h", raw, 40, 3, 30000, 30000, 30000, 1, 1, 1, 1)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError):
        read_nifti(bad)
    if N.native_available():
        assert N.read_volume_f32(bad) is None


def test_unsupported_datatype(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<h", raw, 70, 1234)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="datatype"):
        read_nifti(bad)


def test_bad_vox_offset(valid_nii, tmp_path):
    raw = _raw_bytes(valid_nii)
    for off, name in ((float("nan"), "nan"), (-100.0, "neg"), (1e18, "huge")):
        struct.pack_into("<f", raw, 108, off)
        bad = _write_corrupt(tmp_path, raw, f"voxoff_{name}.nii.gz")
        with pytest.raises(ValueError, match="vox_offset"):
            read_nifti(bad)


def test_nan_scl_fields_ignored(valid_nii, tmp_path):
    """NaN scl_slope/scl_inter must be ignored (nibabel semantics), not
    silently turn the whole volume into NaNs."""
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<f", raw, 112, float("nan"))
    struct.pack_into("<f", raw, 116, float("inf"))
    bad = _write_corrupt(tmp_path, raw)
    img = read_nifti(bad)
    assert np.isfinite(img.data).all()
    assert np.allclose(img.data.ravel()[:3], [0, 1, 2])


def test_4d_with_singleton_squeezes(tmp_path, valid_nii):
    raw = _raw_bytes(valid_nii)
    struct.pack_into("<8h", raw, 40, 4, 4, 5, 6, 1, 1, 1, 1)
    ok = _write_corrupt(tmp_path, raw, "4d_singleton.nii.gz")
    img = read_nifti(ok)
    assert img.shape == (4, 5, 6)


def test_true_4d_rejected(tmp_path, valid_nii):
    raw = _raw_bytes(valid_nii)
    # 2·5·6·2 = 120 voxels = same payload size as 4·5·6, genuinely 4D
    struct.pack_into("<8h", raw, 40, 4, 2, 5, 6, 2, 1, 1, 1)
    bad = _write_corrupt(tmp_path, raw)
    with pytest.raises(ValueError, match="3D"):
        read_nifti(bad)


def test_random_garbage_corpus(valid_nii, tmp_path):
    """Byte-flip fuzz over the header region: every mutant either loads to a
    finite-shaped array or raises ValueError — no other exception, no hang."""
    rng = np.random.default_rng(0)
    base = bytes(_raw_bytes(valid_nii))
    for trial in range(40):
        raw = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            raw[int(rng.integers(0, 348))] = int(rng.integers(0, 256))
        bad = _write_corrupt(tmp_path, raw, f"fuzz{trial}.nii.gz")
        try:
            img = read_nifti(bad)
            assert img.data.size >= 0  # loaded: must be a real array
        except ValueError:
            pass  # the accepted failure mode
