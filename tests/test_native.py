"""Native C++ IO runtime tests: parity with the pure-numpy NIfTI reader."""

import numpy as np
import pytest

from dose_prediction_tpu.data import nifti
from dose_prediction_tpu.data.native import (
    native_available,
    preprocess_ct_inplace,
    read_batch_f32,
    read_volume_f32,
)

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native library unavailable")


@needs_native
def test_native_read_matches_numpy(tmp_path, rng):
    vol = (rng.standard_normal((9, 7, 5)) * 100).astype(np.float32)
    path = tmp_path / "v.nii.gz"
    nifti.write_nifti(path, vol, spacing=(1.5, 2.0, 2.5))
    out = read_volume_f32(path)
    assert out is not None
    data, spacing = out
    np.testing.assert_allclose(data, vol, rtol=1e-6)
    np.testing.assert_allclose(spacing, (1.5, 2.0, 2.5), rtol=1e-5)


@needs_native
def test_native_read_int16_scaled(tmp_path, rng):
    vol = (rng.standard_normal((6, 6, 6)) * 500).astype(np.int16)
    path = tmp_path / "ct.nii.gz"
    nifti.write_nifti(path, vol)
    data, _ = read_volume_f32(path)
    np.testing.assert_allclose(data, vol.astype(np.float32))


@needs_native
def test_native_batch_load(tmp_path, rng):
    paths = []
    vols = []
    for i in range(5):
        v = (rng.standard_normal((4 + i, 5, 6)) * 10).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        nifti.write_nifti(p, v)
        paths.append(p)
        vols.append(v)
    out = read_batch_f32(paths, n_threads=3)
    assert out is not None and len(out) == 5
    for (data, _), v in zip(out, vols):
        np.testing.assert_allclose(data, v, rtol=1e-6)


def test_preprocess_ct_matches_numpy(rng):
    buf = (rng.standard_normal(1000) * 2000).astype(np.float32)
    want = np.clip(buf.copy(), -1024, 1500) / 1000.0
    got = preprocess_ct_inplace(buf.copy())
    np.testing.assert_allclose(got, want, rtol=1e-6)


@needs_native
def test_native_full_read_matches_numpy_reader(tmp_path, rng):
    """read_nifti's native fast path returns the same data/affine/spacing as
    the pure-numpy fallback."""
    vol = (rng.standard_normal((6, 7, 8)) * 50).astype(np.float32)
    path = tmp_path / "full.nii.gz"
    nifti.write_nifti(path, vol, spacing=(1.0, 2.0, 3.0))
    a = nifti.read_nifti(path, prefer_native=True)
    b = nifti.read_nifti(path, prefer_native=False)
    np.testing.assert_allclose(a.data, b.data, rtol=1e-6)
    np.testing.assert_allclose(a.affine, b.affine, rtol=1e-5, atol=1e-6)
    assert tuple(np.round(a.spacing, 5)) == tuple(np.round(b.spacing, 5))


@needs_native
def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "junk.nii.gz"
    p.write_bytes(b"not a nifti at all")
    assert read_volume_f32(p) is None


# ---------------------------------------------------------------------------
# fused native augmentation + bf16 (dose_io_augment_dose_bf16)
# ---------------------------------------------------------------------------

def test_native_augment_matches_numpy_chain():
    """Native fused augment+cast == the numpy chain (same rng stream) cast to
    bf16, across many random decision draws (flips/rot90/shift all fire)."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N
    from dose_prediction_tpu.data import transforms as T

    if not N.native_available():
        pytest.skip("native library unavailable")
    # D≠H exercises the rot90 output-dim swap (the k-odd (H,D) branch);
    # 20 seeded trials make every flip/rot/shift combination fire
    for shape in [(10, 10, 6), (8, 12, 6)]:
        for trial in range(20):
            rng1 = np.random.default_rng(100 + trial)
            rng2 = np.random.default_rng(100 + trial)
            data = np.random.default_rng(trial)
            inp = data.normal(size=shape + (4,)).astype(np.float32)
            gt = data.normal(size=shape + (2,)).astype(np.float32)
            ref_inp, ref_gt = T.augment_dose_sample(inp, gt, rng1)
            out = N.augment_dose_bf16(inp, gt, rng2, n_threads=2)
            assert out is not None
            np.testing.assert_array_equal(
                out[0], ref_inp.astype(ml_dtypes.bfloat16).view(np.uint16))
            np.testing.assert_array_equal(
                out[1], ref_gt.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_native_bf16_cast_special_values():
    """The native f32→bf16 cast matches ml_dtypes bit-for-bit on specials:
    NaN (canonicalized to sign|0x7fc0 — a naive RNE add would carry a NaN's
    mantissa into the exponent and yield ±inf or -0.0), ±inf, values that
    round up to inf vs. stay at bf16 max, subnormals, and ±0."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N

    if not N.native_available():
        pytest.skip("native library unavailable")
    specials = np.array(
        [np.nan, -np.nan,
         np.uint32(0x7fffffff).view(np.float32),   # full-payload NaN
         np.uint32(0xffffffff).view(np.float32),
         np.uint32(0x7f800001).view(np.float32),   # signaling NaN
         np.inf, -np.inf,
         3.3895314e38, -3.3895314e38,               # rounds to bf16 max
         3.3961776e38,                              # rounds up to inf
         1e-40, -1e-40, 0.0, -0.0, 1.0000152],
        dtype=np.float32)
    inp = np.zeros((2, 2, 4, 4), dtype=np.float32)
    inp.reshape(-1)[: specials.size] = specials
    gt = inp[..., :2].copy()
    rng1, rng2 = np.random.default_rng(7), np.random.default_rng(7)

    from dose_prediction_tpu.data import transforms as T

    ref_inp, ref_gt = T.augment_dose_sample(inp, gt, rng1)
    out = N.augment_dose_bf16(inp, gt, rng2, n_threads=1)
    assert out is not None
    np.testing.assert_array_equal(
        out[0], ref_inp.astype(ml_dtypes.bfloat16).view(np.uint16))
    np.testing.assert_array_equal(
        out[1], ref_gt.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_dose_batches_native_bf16(tmp_path):
    """pipeline.dose_batches(native_bf16=True) yields bf16 batches equal to
    the numpy chain (same seed) cast to bf16."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.pipeline import dose_batches
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

    if not N.native_available():
        pytest.skip("native library unavailable")
    pattern = make_synthetic_dataset(tmp_path, n_patients=2, shape=(16, 16, 16))
    ds = OpenKBPDataset(pattern)
    ref = list(dose_batches(ds, batch_size=1, seed=3))
    nat = list(dose_batches(ds, batch_size=1, seed=3, native_bf16=True))
    assert len(ref) == len(nat)
    for r, n in zip(ref, nat):
        assert n["input"].dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            n["input"].view(np.uint16),
            r["input"].astype(ml_dtypes.bfloat16).view(np.uint16))
        np.testing.assert_array_equal(
            n["gt"].view(np.uint16),
            r["gt"].astype(ml_dtypes.bfloat16).view(np.uint16))


def test_native_seg_augment_matches_numpy_chain():
    """Fused seg crop+flip/rot90/shift+bf16 gather == the numpy chain bit-for-
    bit (labels exactly, CT after bf16 rounding), sharing one rng stream."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N
    from dose_prediction_tpu.data import transforms as T

    if not N.native_available() or not hasattr(N.get_lib(), "dose_io_augment_seg_bf16"):
        pytest.skip("native library unavailable")
    g = np.random.default_rng(3)
    ct = g.standard_normal((48, 48, 48)).astype(np.float32)
    labels = ((g.random((48, 48, 48)) < 0.05) * 3).astype(np.uint8)
    for seed in range(4):
        r1, r2 = np.random.default_rng(seed), np.random.default_rng(seed)
        ref = T.augment_seg_sample(ct, labels.astype(np.float32), r1,
                                   crop=(32, 32, 32), num_samples=3)
        starts = T.seg_crop_starts(ct.shape, labels, r2,
                                   crop=(32, 32, 32), num_samples=3)
        for (rv, rl), start in zip(ref, starts):
            dec = T.draw_seg_aug_decisions(r2)
            out = N.augment_seg_bf16(ct, labels, start, (32, 32, 32), dec)
            assert out is not None
            np.testing.assert_array_equal(out[1], rl.astype(np.uint8))
            np.testing.assert_array_equal(
                out[0].view(ml_dtypes.bfloat16).astype(np.float32),
                rv.astype(ml_dtypes.bfloat16).astype(np.float32))


def test_seg_batches_native_bf16(tmp_path):
    """seg_batches(feed_dtype='bfloat16') rides the fused native gather and
    yields bf16 CT + uint8 labels with the right shapes."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.pipeline import seg_batches
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

    if not N.native_available() or not hasattr(N.get_lib(), "dose_io_augment_seg_bf16"):
        pytest.skip("native library unavailable")
    pattern = make_synthetic_dataset(tmp_path / "d", n_patients=2, shape=(32, 32, 32))
    ds = OpenKBPDataset(pattern)
    batches = list(seg_batches(ds, crop=(16, 16, 16), num_samples=2,
                               batch_size=2, seed=0, feed_dtype="bfloat16"))
    assert sum(b["ct"].shape[0] for b in batches) == 4
    assert batches[0]["ct"].dtype == ml_dtypes.bfloat16
    assert batches[0]["labels"].dtype == np.uint8
    assert batches[0]["ct"].shape[1:] == (16, 16, 16, 1)


def test_native_seg_augment_all_rot_flip_combos():
    """Deterministic sweep of every (rot_k, flip_mask) pair — the rng-seeded
    parity test cannot guarantee each C++ inverse-rotation branch is hit."""
    import ml_dtypes

    from dose_prediction_tpu.data import native as N
    from dose_prediction_tpu.data import transforms as T

    if not N.native_available() or not hasattr(N.get_lib(), "dose_io_augment_seg_bf16"):
        pytest.skip("native library unavailable")
    g = np.random.default_rng(7)
    ct = g.standard_normal((24, 24, 24)).astype(np.float32)
    labels = ((g.random((24, 24, 24)) < 0.1) * 5).astype(np.uint8)
    # cubic crop + a non-cubic crop (odd rot_k swaps the output dims)
    for start, crop in (((3, 5, 2), (16, 16, 16)), ((1, 4, 6), (12, 8, 10))):
        sl = tuple(slice(s, s + c) for s, c in zip(start, crop))
        for rot_k in range(4):
            for flip_mask in range(8):
                shift = 0.05 * rot_k - 0.1 * (flip_mask & 1)
                rv, rl = T.apply_seg_augment(ct[sl], labels[sl],
                                             shift, flip_mask, rot_k)
                out = N.augment_seg_bf16(ct, labels, start, crop,
                                         (shift, flip_mask, rot_k))
                assert out is not None
                np.testing.assert_array_equal(
                    out[1], rl,
                    err_msg=f"labels crop={crop} rot={rot_k} flip={flip_mask}")
                np.testing.assert_array_equal(
                    out[0].view(ml_dtypes.bfloat16).astype(np.float32),
                    rv.astype(ml_dtypes.bfloat16).astype(np.float32),
                    err_msg=f"ct crop={crop} rot={rot_k} flip={flip_mask}")


# -- round-5 review fixes ------------------------------------------------------

@needs_native
def test_native_dose_augment_guards_gt_shape():
    """Round-5 review fix: the kernel indexes gt with inp's (d,h,w) strides —
    a rank or spatial mismatch must fall back (None), not read out of
    bounds."""
    from dose_prediction_tpu.data.native import augment_dose_bf16

    rng = np.random.default_rng(0)
    inp = rng.standard_normal((6, 5, 4, 3)).astype(np.float32)
    ok_gt = rng.standard_normal((6, 5, 4, 2)).astype(np.float32)
    assert augment_dose_bf16(inp, ok_gt, decisions=(0.0, 0, 0)) is not None
    # rank-3 gt (the reviewed failure: cg would become W)
    assert augment_dose_bf16(inp, ok_gt[..., 0],
                             decisions=(0.0, 0, 0)) is None
    # spatial mismatch
    assert augment_dose_bf16(inp, ok_gt[:, :4],
                             decisions=(0.0, 0, 0)) is None


@needs_native
def test_native_rejects_gzip_bomb(tmp_path):
    """A crafted gzip inflating far past any sane volume must fail cleanly
    (bounded memory) instead of inflating toward OOM before header checks."""
    import gzip

    bomb = tmp_path / "bomb.nii.gz"
    chunk = bytes(1 << 20)
    with gzip.open(bomb, "wb", compresslevel=9) as f:
        for _ in range(1100):           # ~1.1 GiB of zeros, ~1 MB on disk
            f.write(chunk)
    assert bomb.stat().st_size < 16 << 20
    assert read_volume_f32(bomb) is None
