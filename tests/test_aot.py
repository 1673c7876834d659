"""Shipped AOT serve-executable loader (infer/aot.py) and the product serve
path that rides it (make_cascade_fn(aot=True) ← CLI --serve-dtype bfloat16).

The real artifacts (artifacts/serve_aot/*.pkl) are TPU executables and can't
load on the CPU test backend, so every test points DPT_AOT_DIR at its own
tmp dir: roundtrip/guard tests write small CPU-compiled artifacts there, and
the fallback tests leave it empty to prove the jit path always works.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dose_prediction_tpu.infer import aot as A
from dose_prediction_tpu.infer.cascade import make_cascade_fn
from dose_prediction_tpu.models import DosePyfer, TranSeg

SMALL_PYFER = dict(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                   hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)


def _write_artifact(tmp_path, name, compiled):
    from jax.experimental import serialize_executable as se

    payload = se.serialize(compiled)
    (tmp_path / f"{name}.pkl").write_bytes(pickle.dumps(payload))


def test_load_aot_absent_and_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path))
    assert A.load_aot("stage1") is None          # no artifact
    compiled = jax.jit(lambda x: x + 1).lower(jnp.ones((4,))).compile()
    _write_artifact(tmp_path, "stage1", compiled)
    monkeypatch.setenv("DPT_NO_AOT", "1")
    assert A.load_aot("stage1") is None          # escape hatch wins


def test_get_program_roundtrip_single_device(tmp_path):
    """Positive roundtrip must run on a 1-device backend: deserialized
    executables take their device assignment from ALL local devices, so on
    the 8-virtual-device test backend even a single-device artifact is
    rejected at call time (and the guarded fallback kicks in — covered by
    the other tests; on the single-chip TPU the roundtrip is what bench.py
    uses in production)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, pickle, sys
        import jax, jax.numpy as jnp, numpy as np
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)
        from jax.experimental import serialize_executable as se
        from dose_prediction_tpu.infer import aot as A
        tmp = %r
        compiled = jax.jit(lambda x: x * 2.0).lower(jnp.ones((4,))).compile()
        with open(os.path.join(tmp, "toy.pkl"), "wb") as f:
            pickle.dump(se.serialize(compiled), f)
        built = []
        prog, seconds, used = A.get_program(
            "toy", lambda: built.append(1) or compiled, (jnp.ones((4,)),))
        assert used and not built, (used, built)
        np.testing.assert_allclose(np.asarray(prog(jnp.full((4,), 3.0))), 6.0)
        print("ROUNDTRIP_OK")
    """) % ("/root/repo", str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "DPT_AOT_DIR": str(tmp_path), "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROUNDTRIP_OK" in out.stdout


def test_get_program_guarded_signature_drift(tmp_path, monkeypatch):
    """A stale artifact whose input signature no longer matches must be
    rejected by the guarded first call, not crash the serve path."""
    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path))
    stale = jax.jit(lambda x: x * 2.0).lower(jnp.ones((4,))).compile()
    _write_artifact(tmp_path, "toy", stale)
    fresh = jax.jit(lambda x: x * 2.0).lower(jnp.ones((8,))).compile()
    prog, seconds, used = A.get_program("toy", lambda: fresh, (jnp.ones((8,)),))
    assert not used
    assert np.asarray(prog(jnp.ones((8,)))).shape == (8,)


def test_lazy_stage_sticks_to_jit_after_rejection(tmp_path, monkeypatch):
    """A loadable artifact that fails at call time (here: the multi-device
    backend quirk; in production: signature drift or foreign topology) must
    fall back to jit on the first call and never retry the artifact."""
    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path))
    compiled = jax.jit(lambda x: x * 3.0).lower(jnp.ones((4,))).compile()
    _write_artifact(tmp_path, "s", compiled)

    stage = A.LazyAOTStage("s", jax.jit(lambda x: x * 3.0))
    out = stage(jnp.ones((8,)))                  # aval mismatch → fallback
    np.testing.assert_allclose(np.asarray(out), 3.0)
    assert stage.used_aot is False
    assert stage._aot is None                    # stays on jit afterwards
    np.testing.assert_allclose(np.asarray(stage(jnp.ones((8,)))), 3.0)


def test_cascade_aot_flag_falls_back_and_matches(tmp_path, monkeypatch, rng):
    """aot=True with no usable artifacts must produce the identical program
    result as aot=False (jit fallback), including the input_dtype cast."""
    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path))
    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    dose = DosePyfer(**SMALL_PYFER)
    ct = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32))
    ptv = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.1).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.7).astype(np.float32))
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 32, 9)))

    kw = dict(roi_size=(32, 32, 32), sw_batch_size=1)
    base = make_cascade_fn(seg, seg_vars, dose, dose_vars, **kw)(ct, ptv, mask)
    via_aot = make_cascade_fn(seg, seg_vars, dose, dose_vars, aot=True,
                              **kw)(ct, ptv, mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(via_aot), rtol=1e-6)

    cast = make_cascade_fn(seg, seg_vars, dose, dose_vars, aot=True,
                           input_dtype=jnp.bfloat16, **kw)(ct, ptv, mask)
    assert np.isfinite(np.asarray(cast.astype(jnp.float32))).all()


def test_parser_serve_dtype():
    from dose_prediction_tpu.cli.main import build_parser

    ap = build_parser()
    args = ap.parse_args(["infer", "--patient", "p", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--out", "o.nii.gz",
                          "--serve-dtype", "bfloat16"])
    assert args.serve_dtype == "bfloat16"
    args = ap.parse_args(["linked-eval", "--data", "x", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--serve-dtype", "bfloat16"])
    assert args.serve_dtype == "bfloat16"
