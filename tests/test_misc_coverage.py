"""Coverage for remaining corners: fused cascade mode, prefetch error
propagation, StepTimer, config flags."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_cascade_fused_matches_staged(rng):
    from dose_prediction_tpu.infer.cascade import make_cascade_fn
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    ct = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32))
    ptv = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.1).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.7).astype(np.float32))
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 32, 9)))

    kw = dict(roi_size=(32, 32, 32), sw_batch_size=1)
    staged = make_cascade_fn(seg, seg_vars, dose, dose_vars, fuse=False, **kw)
    fused = make_cascade_fn(seg, seg_vars, dose, dose_vars, fuse=True, **kw)
    a = np.asarray(staged(ct, ptv, mask))
    b = np.asarray(fused(ct, ptv, mask))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_device_prefetch_propagates_errors():
    from dose_prediction_tpu.data.pipeline import device_prefetch

    def bad_iterator():
        yield {"x": np.ones(3, np.float32)}
        raise RuntimeError("loader exploded")

    it = device_prefetch(bad_iterator())
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(it)


def test_step_timer_summary():
    import time

    from dose_prediction_tpu.utils.profiling import StepTimer, trace

    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(jnp.ones((4,)))
    s = t.summary()
    assert s["n"] == 3 and s["p50_s"] >= 0.01
    # trace() no-ops cleanly with and without a dir
    with trace(None):
        pass


def test_config_flags_env(monkeypatch):
    import importlib

    monkeypatch.setenv("DPT_PALLAS_ATTENTION", "0")
    import dose_prediction_tpu.core.config as cfg

    importlib.reload(cfg)
    assert cfg.Flags().use_pallas_attention is False
    # dataclass defaults bind at class definition: env is read at import time
    monkeypatch.setenv("DPT_PALLAS_ATTENTION", "1")
    importlib.reload(cfg)
    assert cfg.Flags().use_pallas_attention is True
    # restore module-level FLAGS to defaults for other tests
    monkeypatch.undo()
    importlib.reload(cfg)


def test_vit_pos_embed_grid_adaptation():
    """trained_grid: a ViT checkpoint trained on one token grid runs on
    another — the learned pos-embedding is trilinearly resized (framework
    extension beyond the fixed-grid MONAI ViT)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dose_prediction_tpu.nn.vit import ViT3D

    vit_small = ViT3D(hidden_size=24, mlp_dim=48, num_layers=1, num_heads=2,
                      patch_size=8)
    x32 = jnp.zeros((1, 32, 32, 32, 1))          # 4^3 = 64 tokens
    v = vit_small.init(jax.random.PRNGKey(0), x32)
    assert v["params"]["patch_embedding"]["pos_embedding"].shape == (1, 64, 24)

    # same params, larger input, via trained_grid
    vit_adapted = ViT3D(hidden_size=24, mlp_dim=48, num_layers=1, num_heads=2,
                        patch_size=8, trained_grid=(4, 4, 4))
    x48 = jnp.zeros((1, 48, 48, 48, 1))          # 6^3 = 216 tokens
    tokens, hidden = vit_adapted.apply(v, x48)
    assert tokens.shape == (1, 216, 24)

    # identity when the runtime grid equals the trained grid
    t_plain, _ = vit_small.apply(v, x32)
    t_adapt, _ = vit_adapted.apply(v, x32)
    np.testing.assert_allclose(np.asarray(t_plain), np.asarray(t_adapt),
                               rtol=1e-6, atol=1e-6)


def test_mlflow_export_replays_jsonl(tmp_path):
    """MLflow shim (reference MLFlowLogger parity surface,
    train_light_pyfer.py:316-326): replay a metrics.jsonl into a (fake)
    tracking client preserving keys and steps; live mirror forwards log()."""
    import contextlib

    from dose_prediction_tpu.utils.logging import MetricLogger
    from dose_prediction_tpu.utils.mlflow_export import MlflowMirror, export_jsonl

    logger = MetricLogger(tmp_path, run_name="pyfer", mirror_stdout=False)
    logger.log({"train_mean_loss": 1.5}, 1)
    logger.log({"mean_dose_score": -2.5, "val_loss": 0.3}, 5)
    logger.close()

    class FakeMlflow:
        def __init__(self):
            self.metrics = []
            self.uri = None
            self.runs = []

        def set_tracking_uri(self, uri):
            self.uri = uri

        def set_experiment(self, name):
            self.experiment = name

        @contextlib.contextmanager
        def start_run(self, run_name=None):
            self.runs.append(run_name)
            yield

        def log_metric(self, k, v, step=0):
            self.metrics.append((k, v, step))

        def end_run(self):
            pass

    fake = FakeMlflow()
    n = export_jsonl(tmp_path / "metrics.jsonl", tracking_uri="http://x",
                     experiment="dose", client=fake)
    assert n == 3
    assert fake.uri == "http://x"
    assert fake.runs == ["pyfer"]
    assert ("train_mean_loss", 1.5, 1) in fake.metrics
    assert ("mean_dose_score", -2.5, 5) in fake.metrics

    # live mirror: a second logger wrapped with the fake client
    class FakeRunCtx(FakeMlflow):
        def start_run(self, run_name=None):   # mirror keeps the run open
            self.runs.append(run_name)
            return None

    fake2 = FakeRunCtx()
    base = MetricLogger(tmp_path / "m2", run_name="c3d", mirror_stdout=False)
    mirror = MlflowMirror(base, client=fake2)
    mirror.log({"train_mean_loss": 0.7}, 2)
    assert ("train_mean_loss", 0.7, 2) in fake2.metrics
    assert (tmp_path / "m2" / "metrics.jsonl").exists()
    mirror.close()
