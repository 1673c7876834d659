"""Golden tests: losses vs torch, device metrics vs numpy parity refs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dose_prediction_tpu.evaluation import metrics as M
from dose_prediction_tpu.train import losses as L


def _mask(rng, shape, p=0.4):
    return (rng.random(shape) < p).astype(np.float32)


def test_masked_l1_matches_boolean_indexing(rng):
    pred = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    gt = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    mask = _mask(rng, (1, 8, 8, 8, 1))
    got = float(L.masked_l1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    want = F.l1_loss(torch.from_numpy(pred[mask > 0]), torch.from_numpy(gt[mask > 0])).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_huber_matches_torch(rng):
    pred = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    gt = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32)
    mask = _mask(rng, (1, 8, 8, 8, 1))
    got = float(L.masked_huber(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask), 0.5))
    want = torch.nn.HuberLoss(delta=0.5)(
        torch.from_numpy(pred[mask > 0]), torch.from_numpy(gt[mask > 0])).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_gen_loss_matches_reference_math(rng):
    """Rebuild GenLoss (loss.py:69-119) with torch ops and compare."""
    size = 16
    gt_dose = np.abs(rng.standard_normal((1, size, size, size, 1))).astype(np.float32)
    mask = _mask(rng, (1, size, size, size, 1))
    gt = np.concatenate([gt_dose, mask], axis=-1)
    pred_a = rng.standard_normal((1, size, size, size, 1)).astype(np.float32)
    preds_b = [rng.standard_normal((1, size // f, size // f, size // f, 1)).astype(np.float32)
               for f in (1, 2, 4, 8)]

    got = float(L.gen_loss(
        (jnp.asarray(pred_a), [jnp.asarray(p) for p in preds_b]),
        jnp.asarray(gt), delta1=10.0, delta2=8.0, cascade=True, freeze=False))

    # torch reference math
    def t(x):  # NDHWC -> NCDHW
        return torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())

    gt_t, mask_t = t(gt_dose), t(mask)
    l_ds = 0.0
    for i, f in enumerate((2, 4, 8)):
        dim = size // f
        gt_i = F.interpolate(gt_t, size=(dim,) * 3, mode="trilinear", align_corners=True)
        m_i = F.interpolate(mask_t, size=(dim,) * 3, mode="nearest-exact")
        p_i = t(preds_b[i + 1])
        l_ds = l_ds + F.l1_loss(p_i[m_i > 0], gt_i[m_i > 0])
    l_ds = l_ds / 3
    l_pre = F.l1_loss(t(preds_b[0])[mask_t > 0], gt_t[mask_t > 0])
    want = 10.0 * l_pre + 8.0 * l_ds + 0.5 * F.l1_loss(t(pred_a)[mask_t > 0], gt_t[mask_t > 0])
    assert got == pytest.approx(want.item(), rel=1e-4)


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((4, 5)).astype(np.float32)
    tgt = (rng.random((4, 5)) > 0.5).astype(np.float32)
    got = float(L.bce_with_logits(jnp.asarray(x), jnp.asarray(tgt)))
    want = F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(tgt)).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_softmax_ce_matches_torch(rng):
    logits = rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 4, 4, 4))
    got = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.from_numpy(np.transpose(logits, (0, 4, 1, 2, 3)).copy())
    want = F.cross_entropy(lt, torch.from_numpy(labels)).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_disc_hinge_loss(rng):
    r = rng.standard_normal((3, 2)).astype(np.float32)
    f = rng.standard_normal((3, 2)).astype(np.float32)
    got = float(L.disc_hinge_loss(jnp.asarray(r), jnp.asarray(f)))
    want = (torch.mean(torch.relu(1.0 - torch.from_numpy(r)))
            + torch.mean(torch.relu(1.0 + torch.from_numpy(f)))).item()
    assert got == pytest.approx(want, rel=1e-5)


# ---------------- metrics ----------------

def test_dose_score_and_postprocess(rng):
    pred = rng.standard_normal((16, 16, 16)).astype(np.float32) * 0.5
    gt = np.abs(rng.standard_normal((16, 16, 16))).astype(np.float32)
    mask = _mask(rng, (16, 16, 16))
    post = M.postprocess_prediction(pred, mask)
    assert (post[mask < 1] == 0).all() and (post >= 0).all()
    s_np = M.dose_score(post, 70 * gt, mask)
    s_jax = float(M.dose_score_jax(jnp.asarray(post), jnp.asarray(70 * gt), jnp.asarray(mask)))
    assert s_jax == pytest.approx(s_np, rel=1e-5)
    post_jax = np.asarray(M.postprocess_prediction_jax(jnp.asarray(pred), jnp.asarray(mask)))
    np.testing.assert_allclose(post_jax, post, rtol=1e-6)


def test_dvh_metrics_target_and_oar(rng):
    dose = np.abs(rng.standard_normal((20, 20, 20))).astype(np.float32) * 70
    mask = _mask(rng, (20, 20, 20), p=0.3)
    tm = M.dvh_metrics(dose, mask, mode="target")
    roi = dose[mask > 0]
    assert tm["D1"] == pytest.approx(np.percentile(roi, 99))
    assert tm["D95"] == pytest.approx(np.percentile(roi, 5))
    om = M.dvh_metrics(dose, mask, mode="OAR", spacing=(3.9, 3.9, 2.5))
    # q must be np.float64 like the reference's np.round(...) output — numpy
    # promotes the percentile interpolation dtype based on q's type.
    vox = np.prod((3.9, 3.9, 2.5))
    frac = 100 - np.maximum(1, np.round(100 / vox)) / roi.size * 100
    assert om["D_0.1_cc"] == pytest.approx(np.percentile(roi, frac))


def test_dvh_metrics_jax_matches_numpy(rng):
    dose = np.abs(rng.standard_normal((18, 18, 18))).astype(np.float32) * 70
    mask = _mask(rng, (18, 18, 18), p=0.3)
    spacing = (3.9, 3.9, 2.5)
    want_t = M.dvh_metrics(dose, mask, mode="target")
    got_t = M.dvh_metrics_jax(jnp.asarray(dose), jnp.asarray(mask), mode="target")
    for k in want_t:
        assert float(got_t[k]) == pytest.approx(want_t[k], rel=1e-4), k
    want_o = M.dvh_metrics(dose, mask, mode="OAR", spacing=spacing)
    got_o = M.dvh_metrics_jax(jnp.asarray(dose), jnp.asarray(mask), mode="OAR",
                              spacing=spacing)
    for k in want_o:
        assert float(got_o[k]) == pytest.approx(want_o[k], rel=1e-4), k


def test_masked_percentile_jax_matches_numpy(rng):
    vals = rng.standard_normal(500).astype(np.float32)
    mask = (rng.random(500) < 0.5).astype(np.float32)
    for q in (1.0, 5.0, 50.0, 99.0, 97.3):
        want = np.percentile(vals[mask > 0], q)
        got = float(M.masked_percentile_jax(jnp.asarray(vals), jnp.asarray(mask), q))
        assert got == pytest.approx(want, rel=1e-4), q


def test_ivs_sweep_jax_matches_numpy(rng):
    pred = np.abs(rng.standard_normal((12, 12, 12))).astype(np.float32) * 70
    gt = np.abs(rng.standard_normal((12, 12, 12))).astype(np.float32) * 70
    want = M.ivs_sweep(pred, gt)
    got = np.asarray(M.ivs_sweep_jax(jnp.asarray(pred), jnp.asarray(gt)))
    valid = ~np.isnan(want)
    # jnp.linspace produces float32 thresholds vs numpy's float64; voxels on an
    # isodose boundary can flip sides, so allow a small tolerance.
    np.testing.assert_allclose(got[valid], want[valid], rtol=5e-3)


def test_dice_and_hd95():
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[5:10, 5:10, 5:10] = True
    b[5:10, 5:10, 5:10] = True
    assert M.dice_coefficient(a, b) == pytest.approx(1.0)
    assert M.hausdorff95(a, b) == pytest.approx(0.0)
    b2 = np.zeros_like(b)
    b2[6:11, 5:10, 5:10] = True  # shifted by 1
    assert M.dice_coefficient(a, b2) == pytest.approx(2 * 4 * 25 / (125 + 125))
    assert 0.0 < M.hausdorff95(a, b2) <= 2.0


def test_hd95_bbox_crop_is_exact(rng):
    """The bbox-cropped EDT (host seg-val hot-spot fix) equals the
    full-volume computation exactly, including edge-touching masks and
    anisotropic spacing."""
    from scipy import ndimage

    def full_volume_ref(pred, gt, spacing=None):
        p, g = pred > 0, gt > 0
        p_surf = p ^ ndimage.binary_erosion(p)
        g_surf = g ^ ndimage.binary_erosion(g)
        s = None if spacing is None else tuple(spacing)
        dt_g = ndimage.distance_transform_edt(~g_surf, sampling=s)
        dt_p = ndimage.distance_transform_edt(~p_surf, sampling=s)
        return float(max(np.percentile(dt_g[p_surf], 95),
                         np.percentile(dt_p[g_surf], 95)))

    zz, yy, xx = np.mgrid[:48, :48, :48]
    for trial in range(4):
        c1 = rng.integers(12, 36, 3)
        c2 = c1 + rng.integers(-6, 6, 3)
        p = (zz - c1[0]) ** 2 + (yy - c1[1]) ** 2 + (xx - c1[2]) ** 2 < 60
        g = (zz - c2[0]) ** 2 + (yy - c2[1]) ** 2 + (xx - c2[2]) ** 2 < 60
        sp = (1.0, 1.2, 0.9)
        assert M.hausdorff95(p, g, sp) == pytest.approx(full_volume_ref(p, g, sp))
    # masks touching the volume edge
    p = np.zeros((32, 32, 32), bool)
    g = np.zeros((32, 32, 32), bool)
    p[0:4, 0:4, 0:4] = True
    g[28:32, 28:32, 28:32] = True
    assert M.hausdorff95(p, g) == pytest.approx(full_volume_ref(p, g))


def test_dvh_score_for_patient(rng):
    shape = (16, 16, 16)
    gt = np.abs(rng.standard_normal(shape)).astype(np.float32) * 70
    pred = gt + rng.standard_normal(shape).astype(np.float32)
    structures = {
        "PTV70": _mask(rng, shape, 0.2),
        "Brainstem": _mask(rng, shape, 0.1),
        "Larynx": np.zeros(shape, np.float32),  # undelineated -> skipped
    }
    res = M.dvh_score_for_patient(pred, gt, structures, spacing=(3.9, 3.9, 2.5))
    assert np.isfinite(res["dvh_dif"])
    assert any(k.startswith("prePTV70") for k in res["detail"])
    assert not any("Larynx" in k for k in res["detail"])


def test_patient_scores_device_matches_host(rng):
    """The one-jit on-device patient scorer == the host numpy path
    (dose score, DVH diff over valid structures, IVS curve)."""
    import jax.numpy as jnp

    from dose_prediction_tpu.evaluation import metrics as M

    shape = (16, 16, 16)
    pred = np.abs(rng.standard_normal(shape)).astype(np.float32) * 30
    gt = np.abs(rng.standard_normal(shape)).astype(np.float32) * 30
    mask = (rng.random(shape) > 0.3).astype(np.float32)
    structures = {}
    for i, name in enumerate(M.STRUCTURE_NAMES):
        if i == 2:
            continue  # one missing structure exercises the validity flags
        s = np.zeros(shape, np.uint8)
        s[rng.random(shape) > 0.7] = 1
        structures[name] = s

    class P:
        pass

    p = P()
    p.structures = structures
    p.real_dose = gt
    p.dose_mask = mask
    p.spacing = (3.906, 3.906, 2.5)

    got = M.patient_scores_device(jnp.asarray(pred), p, with_ivs=True)
    want_ds = M.dose_score(pred, gt, mask)
    want_dvh = M.dvh_score_for_patient(pred, gt, structures, p.spacing)
    want_ivs = M.ivs_sweep(pred, gt)
    assert got["dose_dif"] == pytest.approx(want_ds, rel=1e-4)
    assert got["dvh_dif"] == pytest.approx(want_dvh["dvh_dif"], rel=1e-3)
    np.testing.assert_allclose(got["ivs"], want_ivs, rtol=1e-4, atol=1e-5)
