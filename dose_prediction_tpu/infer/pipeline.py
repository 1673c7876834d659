"""Streaming pipeline parallelism for the serve path.

The linked cascade is two sequential stages — sliding-window segmentation
(~341 ms on v5e) then the dose forward (~115 ms) — that the reference runs
back-to-back on one GPU per patient (LinkedNet.test_step,
train_light_linked_model.py:138-176). For multi-patient sweeps on a multi-chip
slice, this module places the stages on DIFFERENT devices and streams patients
through a 1-deep software pipeline:

    device A:  seg(p1) | seg(p2) | seg(p3) | ...
    device B:          | dose(p1)| dose(p2)| ...

Throughput approaches max(seg, dose) instead of seg+dose (~1.3× at the
measured stage split). The mechanics are pure JAX async dispatch: each stage
is a jit program whose arguments are committed to its device, so the two
device queues drain concurrently; the stage-1 output hops A→B with one
device_put (ICI on a real slice). No collectives, no mesh required — this is
pipeline parallelism by placement, the idiomatic XLA form for a 2-stage
inference graph.

Also provided: ``pipeline_map`` — the same 1-deep overlap pattern for ANY
producer/consumer pair of device computations (used to overlap patient i+1's
forward with patient i's on-device eval scoring).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Optional, Sequence, Tuple

import jax

from dose_prediction_tpu.infer.cascade import make_cascade_stages


def pipeline_map(produce: Callable[[Any], Any], consume: Callable[[Any], Any],
                 items: Iterable[Any]) -> Iterator[Any]:
    """1-deep software pipeline: yields consume(produce(item)) for each item,
    dispatching produce(item[i+1]) before consume's result for item[i] is
    awaited — when produce and consume run on different devices (or consume is
    host work), they overlap. Results stream in order."""
    pending = None
    for item in items:
        produced = produce(item)
        if pending is not None:
            yield consume(pending)
        pending = produced
    if pending is not None:
        yield consume(pending)


class StreamingCascade:
    """The linked cascade with its stages pinned to two devices.

    Args mirror make_cascade_fn; seg_device/dose_device default to the first
    two visible devices. Falls back to single-device serial execution when
    only one device exists (same results, no overlap).
    """

    def __init__(self, seg_model, seg_variables, dose_model, dose_variables, *,
                 seg_device=None, dose_device=None,
                 num_oar_classes: int = 8, roi_size: Sequence[int] = (96, 96, 96),
                 sw_batch_size: int = 4, overlap: float = 0.25,
                 dose_scale: float = 70.0, seg_mode: str = "sliding"):
        devices = jax.devices()
        self.seg_device = seg_device if seg_device is not None else devices[0]
        self.dose_device = (dose_device if dose_device is not None
                            else devices[1 % len(devices)])
        stage1, stage2 = make_cascade_stages(
            seg_model, dose_model, num_oar_classes=num_oar_classes,
            roi_size=roi_size, sw_batch_size=sw_batch_size, overlap=overlap,
            dose_scale=dose_scale, seg_mode=seg_mode)
        self._stage1 = jax.jit(stage1)
        self._stage2 = jax.jit(stage2)
        # weights live on their stage's device once, not per patient
        self._seg_vars = jax.device_put(seg_variables, self.seg_device)
        self._dose_vars = jax.device_put(dose_variables, self.dose_device)

    def _seg(self, inputs: Tuple[Any, Any, Any]):
        ct, ptv, dose_mask = inputs
        ct = jax.device_put(ct, self.seg_device)
        ptv = jax.device_put(ptv, self.seg_device)
        structures = self._stage1(self._seg_vars, ct, ptv)
        return structures, dose_mask

    def _dose(self, staged):
        structures, dose_mask = staged
        # the A→B hop (ICI on a slice); async, overlaps the next seg sweep
        structures = jax.device_put(structures, self.dose_device)
        dose_mask = jax.device_put(dose_mask, self.dose_device)
        return self._stage2(self._dose_vars, structures, dose_mask)

    def run_one(self, ct, ptv, dose_mask):
        """Single-patient convenience (serial through both stages)."""
        return self._dose(self._seg((ct, ptv, dose_mask)))

    def run_stream(self, patients: Iterable[Tuple[Any, Any, Any]]) -> Iterator[Any]:
        """Stream (ct, ptv, dose_mask) triples; yields dose maps in order.
        While the consumer blocks on patient i's dose result (device B),
        patient i+1's segmentation sweep is already running on device A."""
        return pipeline_map(self._seg, self._dose, patients)
