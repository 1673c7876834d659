"""Packed-feed tests (data/packed.py): bit-exact mask round-trip, bf16-level
scalar parity with the numpy augmentation chain, payload reduction, and the
flagship training path on the packed feed."""

import numpy as np
import pytest

import jax.numpy as jnp

from dose_prediction_tpu.data import packed as PK
from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.pipeline import dose_batches
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

SIZE = 16


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("openkbp_packed")
    pattern = make_synthetic_dataset(root, n_patients=2, shape=(SIZE, SIZE, SIZE))
    return OpenKBPDataset(pattern, keep_structures=True)


def test_pack_unpack_roundtrip_unaugmented(ds):
    p = ds[0]
    packed = PK.pack_patient(p)
    assert packed is not None
    batch = {k: jnp.asarray(v[None]) for k, v in packed.items()}
    batch["shift"] = jnp.zeros((1,), jnp.float32)
    batch["flip"] = jnp.zeros((1,), jnp.int32)
    batch["rot_k"] = jnp.zeros((1,), jnp.int32)
    out = PK.unpack_dose_batch(batch)
    inp = np.asarray(out["input"])[0]
    gt = np.asarray(out["gt"])[0]
    ref_inp, ref_gt = p.model_input, p.gt
    # binary channels + PTV are EXACT; CT/dose at bf16 resolution
    np.testing.assert_array_equal(inp[..., 1:8], ref_inp[..., 1:8])
    np.testing.assert_array_equal(gt[..., 1], ref_gt[..., 1])
    np.testing.assert_allclose(inp[..., 0], ref_inp[..., 0], atol=1e-6)
    np.testing.assert_allclose(inp[..., 8], ref_inp[..., 8], atol=0.01)
    np.testing.assert_allclose(gt[..., 0], ref_gt[..., 0], atol=0.01)


def test_packed_feed_matches_numpy_chain(ds):
    """Same seed → the packed feed's on-device augmentation reproduces the
    f32 numpy chain (identical rng stream, bf16-resolution values)."""
    for seed in range(6):
        f32 = list(dose_batches(ds, batch_size=2, seed=seed))
        pkd = list(PK.packed_dose_batches(ds, batch_size=2, seed=seed))
        assert len(f32) == len(pkd)
        for fb, pb in zip(f32, pkd):
            out = PK.unpack_dose_batch({k: jnp.asarray(v) for k, v in pb.items()})
            np.testing.assert_allclose(np.asarray(out["input"]), fb["input"],
                                       atol=0.012)
            np.testing.assert_allclose(np.asarray(out["gt"]), fb["gt"], atol=0.01)
            # mask channels exact through any flip/rot permutation
            np.testing.assert_array_equal(
                np.asarray(out["input"])[..., 1:8], fb["input"][..., 1:8])


def test_packed_payload_is_6x_smaller(ds):
    f32 = next(iter(dose_batches(ds, batch_size=2, seed=0, augment=False)))
    pkd = next(iter(PK.packed_dose_batches(ds, batch_size=2, seed=0, augment=False)))
    f32_bytes = sum(v.nbytes for v in f32.values())
    assert f32_bytes / PK.packed_batch_nbytes(pkd) > 5.5


def test_pack_declines_nonbinary_masks(ds):
    import copy

    p = copy.copy(ds[0])
    if hasattr(p, "_packed_cache"):
        delattr(p, "_packed_cache")
    p.oars = p.oars * 0.5   # non-binary
    assert PK.pack_patient(p) is None
    assert PK.pack_patient(p) is None   # decline is remembered
    with pytest.raises(ValueError, match="not packable"):

        class DS:
            patients = [p]

            def __len__(self):
                return 1

            def __getitem__(self, i):
                return p

        next(iter(PK.packed_dose_batches(DS(), batch_size=1)))


def test_pyfer_trains_on_packed_feed(tmp_path, ds):
    """feed_dtype='packed' end to end: PyferTrainer fit on the packed feed
    reaches a finite loss (the VERDICT r2 H2D-bottleneck item)."""
    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train.trainers import PyferTrainer, TrainConfig

    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                      hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2)
    cfg = TrainConfig(max_epochs=1, check_val=5, max_steps=2, feed_dtype="packed",
                      ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr = PyferTrainer(cfg, model=model, example_shape=(1, SIZE, SIZE, SIZE, 9))
    tr.fit(ds, None, resume=False)
    assert np.isfinite(float(tr.state.moving_loss))


def test_packed_loss_matches_f32_loss(tmp_path, ds):
    """One step, same seed: the packed step's loss equals the f32 step's loss
    to bf16 feed resolution (the unpack+augment is semantically identical)."""
    import jax

    from dose_prediction_tpu.models import CascadeC3D
    from dose_prediction_tpu.train import state as S
    from dose_prediction_tpu.train import steps as STEP

    model = CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                       list_ch_B=(-1, 2, 4, 8, 16, 32))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 9), jnp.float32))
    tx = S.make_optimizer(learning_rate=1e-3)
    step_f32 = STEP.make_cascade_c3d_train_step(model, tx)
    step_pkd = STEP.make_cascade_c3d_train_step(model, tx, packed=True)

    fb = next(iter(dose_batches(ds, batch_size=2, seed=4)))
    pb = next(iter(PK.packed_dose_batches(ds, batch_size=2, seed=4)))
    # steps donate their state: each needs its own buffers
    s1 = S.create_train_state(jax.tree.map(jnp.array, variables), tx)
    s2 = S.create_train_state(jax.tree.map(jnp.array, variables), tx)
    _, loss_f32 = step_f32(s1, {k: jnp.asarray(v) for k, v in fb.items()})
    _, loss_pkd = step_pkd(s2, {k: jnp.asarray(v) for k, v in pb.items()})
    assert float(loss_f32) == pytest.approx(float(loss_pkd), abs=2e-3)
