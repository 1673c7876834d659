"""Host→HBM training feed: shuffled epochs, host-side augmentation in worker
threads, and double-buffered device prefetch.

Replaces the reference's torch DataLoader(+ CacheDataset workers + pin_memory)
stack (train_light_pyfer.py:37-43): preprocessing is already cached in RAM
(OpenKBPDataset); this module only does per-step augmentation and the
host→device copy, overlapped with compute via a 2-deep prefetch queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Sequence

import jax
import numpy as np

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.transforms import (
    augment_dose_sample,
    augment_seg_sample,
    draw_augment_decisions,
)


def _local_row_range(batch_size: int, process_rows) -> tuple:
    """The [lo, hi) rows of a global batch owned by this process.

    ``process_rows`` is (process_index, process_count). Ownership is the
    contiguous equal split matching device_prefetch's multi-host sharding
    (process p's devices hold rows [p·per, (p+1)·per) of a 'data'-sharded
    global array when the mesh enumerates jax.devices() in order)."""
    pid, num = process_rows
    if batch_size % num:
        raise ValueError(
            f"global batch {batch_size} does not divide over {num} processes")
    per = batch_size // num
    return pid * per, (pid + 1) * per


def dose_batches(
    dataset: OpenKBPDataset,
    *,
    batch_size: int = 1,
    shuffle: bool = True,
    augment: bool = True,
    seed: int = 0,
    drop_last: bool = False,
    num_samples_per_epoch: int | None = None,
    native_bf16: bool = False,
    process_rows=None,
) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of {'input': (N,D,H,W,9), 'gt': (N,D,H,W,2)} batches.

    ``num_samples_per_epoch`` reproduces the legacy loader's index-wraparound
    sampling (dataloader_OpenKBP_C3D.py:129-134): an epoch longer (or
    shorter) than the dataset cycles through it modulo its length.

    ``process_rows=(process_index, process_count)`` builds only THIS host's
    contiguous row slice of each global batch (multi-host dp): non-owned rows
    consume the identical augmentation rng draws (stream parity across
    processes) but skip dataset access, augmentation, and stacking — each
    host does 1/N of the feed work. Partial tail batches are dropped (they
    cannot split evenly). Pair with device_prefetch(local_rows=True).

    ``native_bf16=True`` runs augmentation through the fused C++ path
    (native/dose_io.cpp::dose_io_augment_dose_bf16) and yields bfloat16
    batches — one gather pass instead of several numpy copies, and half the
    host→device payload. Identical semantics and random stream (parity
    tested); falls back to the numpy chain when the library is unavailable.
    """
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    if num_samples_per_epoch is not None:
        reps = -(-num_samples_per_epoch // len(order))
        order = np.tile(order, reps)[:num_samples_per_epoch]
    bf16 = None
    if native_bf16:
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
    lo, hi = (None, None)
    if process_rows is not None:
        lo, hi = _local_row_range(batch_size, process_rows)
    for i in range(0, len(order), batch_size):
        idx = order[i:i + batch_size]
        if (drop_last or process_rows is not None) and len(idx) < batch_size:
            return
        inputs, gts = [], []
        for r, j in enumerate(idx):
            if lo is not None and not (lo <= r < hi):
                if augment:
                    draw_augment_decisions(rng)  # stream parity with owners
                continue
            p = dataset[int(j)]
            inp, gt = p.model_input, p.gt
            if augment and bf16 is not None and inp.shape[0] == inp.shape[1]:
                from dose_prediction_tpu.data import native as N

                # draw ONCE and share with the fallback: if the native call
                # declines after the draws, the numpy path must consume the
                # same decisions, not redraw (random-stream parity)
                decisions = N.draw_augment_decisions(rng)
                out = N.augment_dose_bf16(inp, gt, decisions=decisions)
                if out is not None:
                    inputs.append(out[0].view(bf16))
                    gts.append(out[1].view(bf16))
                    continue
                from dose_prediction_tpu.data.transforms import apply_dose_augment

                inp, gt = apply_dose_augment(inp, gt, *decisions)
            elif augment:
                inp, gt = augment_dose_sample(inp, gt, rng)
            if bf16 is not None:
                inp = inp.astype(bf16)
                gt = gt.astype(bf16)
            inputs.append(inp)
            gts.append(gt)
        yield {"input": np.stack(inputs), "gt": np.stack(gts)}


def seg_batches(
    dataset: OpenKBPDataset,
    *,
    crop: Sequence[int] = (96, 96, 96),
    num_samples: int = 4,
    batch_size: int = 4,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
    feed_dtype: str = "float32",
    num_samples_per_epoch: int | None = None,
    process_rows=None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Seg epochs: pos/neg crops ×num_samples per patient, batched
    ({'ct': (N,*crop,1), 'labels': (N,*crop) uint8}).

    ``process_rows=(process_index, process_count)``: multi-host dp — yield
    only this host's contiguous row slice of each global batch. Crop-start
    sampling and augment decisions are drawn for EVERY global row (the draws
    depend on per-patient data, so all processes must walk one identical rng
    stream), but the expensive crop gather/stack happens only for owned rows;
    partial tail batches are dropped. Pair with
    device_prefetch(local_rows=True).

    Labels ship as uint8 (≤255 classes always holds; the train step casts to
    int32 on device) and ``feed_dtype='bfloat16'`` ships the CT window as bf16
    — together a 2.8× H2D payload cut per crop on slow host↔device links.
    ``num_samples_per_epoch`` is the legacy wraparound epoch sizing
    (dataloader_OpenKBP_C3D.py:129-134) counted in PATIENT VISITS — each
    visit contributes ``num_samples`` crops."""
    rng = np.random.default_rng(seed)
    ct_dtype: Any = np.float32
    if feed_dtype == "bfloat16":
        import ml_dtypes

        ct_dtype = ml_dtypes.bfloat16
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    if num_samples_per_epoch is not None:
        reps = -(-num_samples_per_epoch // len(order))
        order = np.tile(order, reps)[:num_samples_per_epoch]
    # bf16 feed: fused native crop+augment gather (one C++ pass emitting bf16
    # CT + u8 labels) when the library is available and no padding is needed;
    # decisions share the numpy chain's rng stream either way
    use_native = False
    if feed_dtype == "bfloat16":
        from dose_prediction_tpu.data import native as N

        lib = N.get_lib()
        use_native = lib is not None and hasattr(lib, "dose_io_augment_seg_bf16")
    lo, hi = (None, None)
    if process_rows is not None:
        lo, hi = _local_row_range(batch_size, process_rows)
    buf_ct: List[np.ndarray] = []
    buf_lab: List[np.ndarray] = []
    gpos = 0  # position of the next crop within the GLOBAL batch

    def owned() -> bool:
        return lo is None or (lo <= gpos < hi)

    def batch_ready() -> bool:
        # the global batch is full when gpos wraps; the local buffer then
        # holds this process's slice of it (the whole batch when lo is None)
        return gpos == 0 and bool(buf_ct)

    for j in order:
        p = dataset[int(j)]
        if use_native and all(s >= c for s, c in zip(p.ct.shape, crop)):
            from dose_prediction_tpu.data.transforms import (
                apply_seg_augment,
                draw_seg_aug_decisions,
                seg_crop_starts,
            )

            labels_u8 = np.ascontiguousarray(p.oars_label_encoded, np.uint8)
            ct_f32 = np.ascontiguousarray(p.ct, np.float32)
            starts = seg_crop_starts(ct_f32.shape, labels_u8, rng,
                                     crop=crop, num_samples=num_samples)
            for start in starts:
                decisions = draw_seg_aug_decisions(rng)
                if owned():
                    res = N.augment_seg_bf16(ct_f32, labels_u8, start, crop,
                                             decisions)
                    if res is not None:
                        buf_ct.append(res[0].view(ct_dtype)[..., None])
                        buf_lab.append(res[1])
                    else:
                        sl = tuple(slice(s, s + c)
                                   for s, c in zip(start, crop))
                        cvol, clab = apply_seg_augment(
                            ct_f32[sl], labels_u8[sl], *decisions)
                        buf_ct.append(cvol[..., None].astype(ct_dtype))
                        buf_lab.append(clab)
                gpos = (gpos + 1) % batch_size
                if batch_ready():
                    yield {"ct": np.stack(buf_ct), "labels": np.stack(buf_lab)}
                    buf_ct, buf_lab = [], []
            continue
        # numpy fallback: augment_seg_sample fuses draws with application, so
        # non-owned crops still compute (stream parity is what matters); only
        # owned rows are stacked and shipped
        for cvol, clab in augment_seg_sample(p.ct, p.oars_label_encoded.astype(np.float32),
                                             rng, crop=crop, num_samples=num_samples):
            if owned():
                buf_ct.append(cvol[..., None].astype(ct_dtype))
                buf_lab.append(clab.astype(np.uint8))
            gpos = (gpos + 1) % batch_size
            if batch_ready():
                yield {"ct": np.stack(buf_ct), "labels": np.stack(buf_lab)}
                buf_ct, buf_lab = [], []
    if buf_ct and not drop_last and process_rows is None:
        yield {"ct": np.stack(buf_ct), "labels": np.stack(buf_lab)}


def linked_batches(
    dataset: OpenKBPDataset,
    *,
    batch_size: int = 1,
    shuffle: bool = True,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Linked-model batches (dataloader_OpenKBP_linked_monai.py:203-209):
    Input = (CT, PTV) 2ch; GT = (label-encoded OARs, dose, dose_mask) 3ch."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order), batch_size):
        idx = order[i:i + batch_size]
        inputs, gts = [], []
        for j in idx:
            p = dataset[int(j)]
            inputs.append(np.stack([p.ct, p.ptv], axis=-1).astype(np.float32))
            gts.append(np.stack([
                p.oars_label_encoded.astype(np.float32), p.dose, p.dose_mask,
            ], axis=-1).astype(np.float32))
        yield {"input": np.stack(inputs), "gt": np.stack(gts)}


def host_to_global(sharding, a, *, local_rows: bool = False):
    """One host array → a global jax.Array under ``sharding`` in a
    multi-process runtime. Row-sharded specs (dim 0 partitioned, the dp train
    feed) expect ``a`` to be the FULL global batch and contribute this
    process's contiguous row slice — unless ``local_rows=True``, in which
    case ``a`` is ONLY this process's rows (the builders' ``process_rows``
    mode) and the global leading dim is ``rows × process_count``.
    Replicated/row-unsharded specs (the full-volume validation feed) expect
    every process to pass the same full array. Single-process: plain
    device_put."""
    a = np.asarray(a)
    if jax.process_count() == 1:
        return jax.device_put(a, sharding)
    spec = getattr(sharding, "spec", None) or ()
    row_sharded = len(spec) > 0 and spec[0] is not None
    if not row_sharded:
        if local_rows:
            raise ValueError(
                "local_rows needs a batch-sharded spec; replicated feeds "
                "must ship full batches")
        return jax.make_array_from_process_local_data(sharding, a, a.shape)
    num, pid = jax.process_count(), jax.process_index()
    if local_rows:
        global_shape = (a.shape[0] * num,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sharding, a, global_shape)
    if a.shape[0] % num:
        raise ValueError(f"global batch {a.shape[0]} must divide over "
                         f"{num} processes")
    per = a.shape[0] // num
    return jax.make_array_from_process_local_data(
        sharding, a[pid * per:(pid + 1) * per], a.shape)


def device_prefetch(iterator: Iterator, *, size: int = 2,
                    sharding=None, local_rows: bool = False) -> Iterator:
    """Run the host iterator in a thread and keep ``size`` batches resident on
    device ahead of compute (the pin_memory/prefetch analogue; H2D overlaps
    the previous step's compute).

    Multi-process (multi-host) runs: with ``local_rows=False`` each batch is
    the full GLOBAL batch and this process contributes its row slice (or the
    whole array for replicated shardings — the validation feed). With
    ``local_rows=True`` the iterator yields ONLY this process's rows (the
    builders' ``process_rows`` mode) and the global leading dim is
    ``rows × process_count``."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []

    multiprocess = jax.process_count() > 1
    if local_rows and sharding is None:
        raise ValueError("local_rows requires a (row-sharded) sharding")

    def put(batch):
        if sharding is not None:
            if multiprocess:
                return jax.tree.map(
                    lambda a: host_to_global(sharding, a,
                                             local_rows=local_rows), batch)
            return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    stop = threading.Event()

    def offer(item) -> bool:
        """put() that gives up when the consumer abandoned the generator —
        a plain blocking put would pin `size` device-resident batches in HBM
        forever after an early break (cfg.max_steps, trainers.py)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if not offer(put(batch)):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            offer(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # normal exit, consumer break (GeneratorExit via close()/GC), or an
        # exception in the consumer: release the worker and every staged
        # device batch so HBM is reclaimable by the rest of the process
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
