"""Per-process dataset slices for the multi-host train feed: each host builds
only its rows of the global batch while walking the SAME augmentation rng
stream, so N hosts together reproduce exactly the single-host global batches
(data/pipeline.py process_rows / data/packed.py process_rows)."""

import numpy as np
import pytest

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.packed import packed_dose_batches
from dose_prediction_tpu.data.pipeline import dose_batches, seg_batches
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

SIZE = 16


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mhfeed"))
    pattern = make_synthetic_dataset(root, n_patients=4,
                                     shape=(SIZE, SIZE, SIZE))
    return OpenKBPDataset(pattern)


def _assert_batches_concat_equal(full, parts_lists):
    assert all(len(p) == len(full) for p in parts_lists)
    for k, batch in enumerate(full):
        for key in batch:
            got = np.concatenate([p[k][key] for p in parts_lists], axis=0)
            want = np.asarray(batch[key])
            np.testing.assert_array_equal(
                got.astype(np.float32), want.astype(np.float32),
                err_msg=f"batch {k} key {key}")


def test_dose_batches_process_rows_reassemble(ds):
    kw = dict(batch_size=2, seed=7, augment=True, drop_last=True)
    full = list(dose_batches(ds, **kw))
    p0 = list(dose_batches(ds, process_rows=(0, 2), **kw))
    p1 = list(dose_batches(ds, process_rows=(1, 2), **kw))
    assert full and full[0]["input"].shape[0] == 2
    assert p0[0]["input"].shape[0] == 1
    _assert_batches_concat_equal(full, [p0, p1])


def test_dose_batches_process_rows_drops_partial_tail(ds):
    # 4 patients, batch 3 → full (no drop_last) yields a 3-row and a 1-row
    # batch; sliced feeds must drop the unsplittable tail
    full = list(dose_batches(ds, batch_size=3, seed=1, drop_last=False))
    assert [b["input"].shape[0] for b in full] == [3, 1]
    p0 = list(dose_batches(ds, batch_size=3, seed=1, process_rows=(0, 3)))
    assert len(p0) == 1 and p0[0]["input"].shape[0] == 1


def test_dose_batches_process_rows_rejects_uneven_split(ds):
    with pytest.raises(ValueError, match="divide"):
        list(dose_batches(ds, batch_size=3, seed=1, process_rows=(0, 2)))


def test_packed_batches_process_rows_reassemble(ds):
    kw = dict(batch_size=2, seed=7, augment=True, drop_last=True)
    full = list(packed_dose_batches(ds, **kw))
    p0 = list(packed_dose_batches(ds, process_rows=(0, 2), **kw))
    p1 = list(packed_dose_batches(ds, process_rows=(1, 2), **kw))
    assert full and full[0]["ct"].shape[0] == 2
    _assert_batches_concat_equal(full, [p0, p1])


def test_seg_batches_process_rows_reassemble(ds):
    kw = dict(crop=(8, 8, 8), num_samples=2, batch_size=4, seed=3,
              drop_last=True)
    full = list(seg_batches(ds, **kw))
    p0 = list(seg_batches(ds, process_rows=(0, 2), **kw))
    p1 = list(seg_batches(ds, process_rows=(1, 2), **kw))
    assert full and full[0]["ct"].shape[0] == 4
    assert p0[0]["ct"].shape[0] == 2
    _assert_batches_concat_equal(full, [p0, p1])


def test_seg_batches_process_rows_bf16_native_path(ds):
    # same contract through the fused native gather when it is available
    # (silently equals the numpy path otherwise — both are covered)
    kw = dict(crop=(8, 8, 8), num_samples=2, batch_size=2, seed=5,
              drop_last=True, feed_dtype="bfloat16")
    full = list(seg_batches(ds, **kw))
    p0 = list(seg_batches(ds, process_rows=(0, 2), **kw))
    p1 = list(seg_batches(ds, process_rows=(1, 2), **kw))
    _assert_batches_concat_equal(full, [p0, p1])
