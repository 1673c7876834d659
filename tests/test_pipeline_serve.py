"""Streaming pipeline-parallel serve tests (infer/pipeline.py): ordering of
the 1-deep pipeline, two-device placement, and parity with the serial
cascade on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.infer.pipeline import StreamingCascade, pipeline_map

SIZE = 32


def test_pipeline_map_orders_and_overlaps():
    log = []

    def produce(i):
        log.append(f"p{i}")
        return i

    def consume(i):
        log.append(f"c{i}")
        return i * 10

    out = list(pipeline_map(produce, consume, range(3)))
    assert out == [0, 10, 20]
    # 1-deep: produce(i+1) is dispatched BEFORE consume(i)
    assert log == ["p0", "p1", "c0", "p2", "c1", "c2"]


@pytest.mark.slow
def test_dense_seg_mode_equals_single_window_sliding(tmp_path):
    """seg_mode='dense': one full-volume seg forward. When roi ≥ volume the
    sliding path is a single constant-blend window, so the two modes must be
    bit-comparable — the parity anchor for the fast serve path."""
    from dose_prediction_tpu.infer.cascade import make_cascade_fn
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=2, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2)
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, SIZE, 9)))
    rng = np.random.default_rng(3)
    ct = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, SIZE, 1)).astype(np.float32))
    ptv = jnp.asarray((rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.7).astype(np.float32))
    mask = jnp.asarray((rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.3).astype(np.float32))

    sliding = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                              roi_size=(SIZE, SIZE, SIZE), sw_batch_size=1)
    dense = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                            roi_size=(SIZE, SIZE, SIZE), seg_mode="dense")
    np.testing.assert_allclose(np.asarray(dense(ct, ptv, mask)),
                               np.asarray(sliding(ct, ptv, mask)),
                               rtol=1e-5, atol=1e-5)

    # and dense runs a grid-adapted model on a LARGER volume than trained
    seg_adapted = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                          num_layers=2, num_heads=2,
                          trained_grid=(SIZE // 16, SIZE // 16, SIZE // 16))
    big = SIZE + 16
    dose_big = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                         hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2)
    dose_big_vars = dose_big.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, big, big, big, 9)))
    dense_big = make_cascade_fn(seg_adapted, seg_vars, dose_big, dose_big_vars,
                                seg_mode="dense")
    out = dense_big(jnp.zeros((1, big, big, big, 1)),
                    jnp.zeros((1, big, big, big, 1)),
                    jnp.ones((1, big, big, big, 1)))
    assert out.shape == (1, big, big, big, 1)


@pytest.mark.slow
def test_streaming_cascade_matches_serial(tmp_path):
    from dose_prediction_tpu.infer.cascade import make_cascade_fn
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=2, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2)
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, SIZE, 9)))

    rng = np.random.default_rng(0)
    patients = []
    for _ in range(3):
        ct = rng.standard_normal((1, SIZE, SIZE, SIZE, 1)).astype(np.float32)
        ptv = (rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.7).astype(np.float32)
        mask = (rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.3).astype(np.float32)
        patients.append((ct, ptv, mask))

    devs = jax.devices()
    assert len(devs) >= 2   # conftest forces the 8-device CPU mesh
    pipe = StreamingCascade(seg, seg_vars, dose, dose_vars,
                            seg_device=devs[0], dose_device=devs[1],
                            roi_size=(SIZE, SIZE, SIZE), sw_batch_size=1)
    streamed = [np.asarray(d) for d in pipe.run_stream(patients)]
    assert len(streamed) == 3

    serial = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                             roi_size=(SIZE, SIZE, SIZE), sw_batch_size=1)
    for (ct, ptv, mask), got in zip(patients, streamed):
        want = np.asarray(serial(jnp.asarray(ct), jnp.asarray(ptv), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # the dose result really lives on the second device
    last = pipe.run_one(*[jnp.asarray(a) for a in patients[0]])
    assert list(last.devices()) == [devs[1]]


@pytest.mark.slow
def test_streaming_cascade_dense_seg_mode(tmp_path):
    """Round-5 review fix: StreamingCascade must forward seg_mode so the
    validated dense fast path is usable on the throughput-oriented streaming
    serve too (it was silently locked to 'sliding')."""
    from dose_prediction_tpu.infer.cascade import make_cascade_fn
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=2, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2)
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, SIZE, 9)))
    rng = np.random.default_rng(5)
    ct = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, SIZE, 1)).astype(np.float32))
    ptv = jnp.asarray((rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.7).astype(np.float32))
    mask = jnp.asarray((rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.3).astype(np.float32))

    devs = jax.devices()
    pipe = StreamingCascade(seg, seg_vars, dose, dose_vars,
                            seg_device=devs[0], dose_device=devs[1],
                            roi_size=(SIZE, SIZE, SIZE), seg_mode="dense")
    want = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                           roi_size=(SIZE, SIZE, SIZE), seg_mode="dense")
    np.testing.assert_allclose(np.asarray(pipe.run_one(ct, ptv, mask)),
                               np.asarray(want(ct, ptv, mask)),
                               rtol=1e-5, atol=1e-5)
