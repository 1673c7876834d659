"""Unified CLI — the layer the reference never had (SURVEY.md §1: every entry
point is a hand-edited ``if __name__ == '__main__'`` with placeholder paths).

    python -m dose_prediction_tpu train pyfer --data 'path/pt_*' ...
    python -m dose_prediction_tpu train transeg ...
    python -m dose_prediction_tpu eval  --data ... --ckpt ...
    python -m dose_prediction_tpu infer --ct ... --ptv ...    (linked cascade)
    python -m dose_prediction_tpu tune  --num-samples 10
    python -m dose_prediction_tpu kfold --folds 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


# the pyfer-tuned default (train_light_pyfer.py:296); GAN trainers keep their
# own reference LRs unless the user explicitly overrides --lr
_DEFAULT_LR = 0.0006130697604327541


def resolve_optimizer(explicit, model_name) -> str:
    """Per-model optimizer default: the reference trains the flagship with
    bnb Adam8bit (train_light_pyfer.py:12,195) and every other trainer with
    plain Adam/AdamW — so `--optimizer` unset means adam8bit for pyfer and
    adamw otherwise. An explicit flag always wins."""
    if explicit:
        return explicit
    return "adam8bit" if model_name == "pyfer" else "adamw"


def default_flagship_model(act="mish", multiS_conv=True, remat_blocks=False,
                           small=False, dtype=None):
    """The DosePyfer the CLI builds for `train pyfer` with bare flags.
    Module-level so scripts/build_train_aot.py and the artifact-spec tests
    construct the EXACT quick-start model (the train-AOT spec gate matches
    on every model field — a drifted copy would make the shipped executables
    silently unreachable). Defaults mirror the reference's tuned config
    (act='mish', multiS_conv=True, train_light_pyfer.py:293-300).
    ``dtype`` is the serve-path activation dtype (infer --serve-dtype);
    None keeps the class default."""
    from dose_prediction_tpu.models import DosePyfer

    kw = {"dtype": dtype} if dtype is not None else {}
    if small:
        return DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                         feature_size=2, hidden_size=24, mlp_dim=48,
                         num_layers=4, num_heads=2, act=act,
                         multiS_conv=multiS_conv, remat_blocks=remat_blocks,
                         **kw)
    return DosePyfer(act=act, multiS_conv=multiS_conv,
                     remat_blocks=remat_blocks, **kw)


def default_seg_model(out_ch=8, block_family="seg", trained_grid=None,
                      dtype=None, remat_blocks=False, k7_mode="dense",
                      small=False):
    """The TranSeg the CLI builds for `train transeg` with bare flags (same
    single-construction-path contract as default_flagship_model)."""
    from dose_prediction_tpu.models import TranSeg

    kw = {"dtype": dtype} if dtype is not None else {}
    kw["remat_blocks"] = remat_blocks
    kw["k7_mode"] = k7_mode
    if small:
        return TranSeg(out_ch=out_ch, feature_size=2, hidden_size=24,
                       mlp_dim=48, num_layers=4, num_heads=2,
                       block_family=block_family, trained_grid=trained_grid,
                       **kw)
    return TranSeg(out_ch=out_ch, block_family=block_family,
                   trained_grid=trained_grid, **kw)


# model-constructor fields that may legitimately differ between training and
# evaluation/serving (they change execution, not the learned function)
_EXEC_ONLY_FIELDS = {"dtype", "remat_blocks", "trained_grid"}


def _check_ckpt_config(ckpt_path, *models) -> None:
    """Eval/serve twin of the train resume guard: training records its
    graph-determining settings in <ckpt-dir>/run_config.json
    (core/checkpoint.py); constructing a DIFFERENT architecture over the
    restored params is invisible to param matching (act changes no shapes)
    and silently produces wrong predictions/scores. Each given model is
    checked against the recorded entry of its class; pre-sidecar checkpoints
    (or import-torch outputs) have no record and skip the check.
    ``DPT_SKIP_CONFIG_CHECK=1`` overrides."""
    if os.environ.get("DPT_SKIP_CONFIG_CHECK") == "1":
        return
    from dose_prediction_tpu.infer import aot as AOT

    p = Path(ckpt_path)
    for cand in (p, p.parent):
        f = cand / "run_config.json"
        if f.exists():
            break
    else:
        return
    try:
        stored = json.loads(f.read_text())
    except (OSError, ValueError):
        return
    recorded = {m.get("model"): m.get("config", {})
                for m in stored.get("models", [])}
    for model in models:
        name = type(model).__name__
        if name not in recorded:
            continue
        want = {k: v for k, v in recorded[name].items()
                if k not in _EXEC_ONLY_FIELDS}
        have = {k: v for k, v in AOT.model_spec(model).items()
                if k not in _EXEC_ONLY_FIELDS}
        diffs = sorted(k for k in set(want) | set(have)
                       if want.get(k) != have.get(k))
        if diffs:
            detail = ", ".join(f"{k}: trained {want.get(k)!r} vs now "
                               f"{have.get(k)!r}" for k in diffs)
            raise SystemExit(
                f"checkpoint {ckpt_path} was trained with a different {name} "
                f"configuration — {detail}. The params restore cleanly either "
                f"way, so continuing would score/serve the WRONG architecture "
                f"(did a CLI default change, e.g. --act?). Pass the recorded "
                f"flags, or set DPT_SKIP_CONFIG_CHECK=1 to override.")


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data", required=True, help="glob for patient dirs, e.g. 'data/pt_*'")
    p.add_argument("--val-data", default=None)
    p.add_argument("--size", type=int, default=None, help="limit #patients")
    p.add_argument("--epochs", type=int, default=1300)
    p.add_argument("--check-val", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=_DEFAULT_LR)
    p.add_argument("--weight-decay", type=float, default=0.00016303111017674179)
    p.add_argument("--optimizer", choices=["adamw", "adam8bit"], default=None,
                   help="default: adam8bit for pyfer (the reference trains "
                        "the flagship with bnb Adam8bit, "
                        "train_light_pyfer.py:12,195), adamw otherwise")
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--mesh", default=None,
                   help="SPMD mesh, e.g. 'data=4' or 'data=4,model=2' "
                        "(batch-size must divide by the data axis); 'auto' = "
                        "data over every device the runtime sees (the whole "
                        "pod under --multihost)")
    p.add_argument("--model-size", choices=["full", "small"], default="full",
                   help="'small' = reduced-width dev model for smoke runs/CI")
    p.add_argument("--feed-dtype", choices=["float32", "bfloat16", "packed"],
                   default="float32",
                   help="bfloat16 = native fused augmentation + half H2D "
                        "payload; packed = bit-packed masks + on-device "
                        "augmentation, 6x less H2D (data/packed.py)")
    p.add_argument("--save-per-epoch", type=int, default=None,
                   help="every N epochs also write a never-rotated "
                        "'iter_<step>' archival checkpoint (NetworkTrainer "
                        "save_per_epoch, network_trainer.py:304-307)")
    p.add_argument("--samples-per-epoch", type=int, default=None,
                   help="fix the epoch at N samples, cycling through the "
                        "shuffled cohort with wraparound (the legacy "
                        "loader's num_samples_per_epoch, "
                        "dataloader_OpenKBP_C3D.py:117-143)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="average k micro-batch grads per update (effective "
                        "batch k*batch-size at micro-batch memory)")
    p.add_argument("--remat-blocks", action="store_true",
                   help="per-block remat in the flagship decoder: lower "
                        "activation memory, enables device batch >=3 at 128^3")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the first training "
                        "epoch here (TensorBoard/XProf)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="dose_prediction_tpu",
                                 description="TPU-native dose prediction framework")
    ap.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                    help="force the jax backend before first device use. "
                         "'cpu' works even where a site hook overrides the "
                         "JAX_PLATFORMS env var (e.g. to debug on a host "
                         "whose TPU is unreachable); 'auto' = jax default")
    ap.add_argument("--multihost", action="store_true",
                    help="join the multi-host runtime before training (one "
                         "process per host; parallel/multihost.py). On TPU "
                         "pods everything is auto-detected; elsewhere also "
                         "pass --coordinator/--num-processes/--process-id. "
                         "Combine with --mesh data=<total chips>")
    ap.add_argument("--coordinator", default=None,
                    help="multihost coordinator host:port (auto on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None,
                    help="multihost world size (auto on TPU pods)")
    ap.add_argument("--process-id", type=int, default=None,
                    help="this process's rank (auto on TPU pods)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train", help="train a model")
    tr.add_argument("model", choices=["pyfer", "c3d", "hdunet", "transeg",
                                      "dosegan", "vitgan", "exp"])
    _add_common(tr)
    tr.add_argument("--pretrained-c3d", default=None,
                    help="checkpoint dir of a trained C3D cascade (net_A surgery)")
    tr.add_argument("--pretrained-critic", default=None,
                    help="vitgan: MedicalNet resnet_10 torch pickle for the "
                         "critic; its leaves stay frozen until the unfreeze "
                         "epoch (train_light_gan.py:136-141)")
    tr.add_argument("--unfreeze-epoch", type=int, default=10,
                    help="vitgan: epoch at which the critic fully unfreezes "
                         "(FineTuneCB, train_light_gan.py:85-96)")
    tr.add_argument("--no-freeze", action="store_true")
    tr.add_argument("--delta1", type=float, default=10.0)
    tr.add_argument("--delta2", type=float, default=8.0)
    tr.add_argument("--act", choices=["relu", "mish"], default="mish",
                    help="model activation: pyfer decoder (tuned default "
                         "mish, train_light_pyfer.py:294) and the exp "
                         "generators (train_light_exp_models.py:353-363)")
    tr.add_argument("--mode-model", type=int, choices=[0, 1], default=1,
                    help="seg task: 0 = plain MONAI UNETR, 1 = TranSeg "
                         "(train_light_transeg.py:93-124)")
    tr.add_argument("--block-family", choices=["seg", "old", "ablation"],
                    default="seg", help="TranSeg conv-block flavor: 'seg' "
                    "(Models/, IN), 'old' (OldModels TRANSEG, BatchNorm), "
                    "'ablation' (base_blocks_ablation)")
    tr.add_argument("--k7-mode", choices=["dense", "separable"],
                    default="dense",
                    help="seg task: 'separable' trains the 1-D-chain k7 "
                         "decoder variant (343→21 taps/conv — the seg-sweep "
                         "latency lever; warm-startable from a dense "
                         "checkpoint via nn/separable.py). 'dense' = "
                         "reference parity")
    tr.add_argument("--private-data", action="store_true",
                    help="seg task: treat --data as the private 13-OAR head "
                         "dataset (fixed 16-patient val split, "
                         "train_light_transeg.py:64-82)")
    tr.add_argument("--roi", type=int, default=96,
                    help="seg task: training crop / validation sliding-window "
                         "ROI (the reference trains at 96, "
                         "train_light_transeg.py:151-158)")
    # C3D optimizer/scheduler selection (train_light_c3d.py:179-243)
    tr.add_argument("--lr-encoder", type=float, default=None,
                    help="c3d: separate encoder LR (network_trainer.py:110-118)")
    tr.add_argument("--lr-decoder", type=float, default=None,
                    help="c3d: separate decoder LR")
    tr.add_argument("--scheduler", choices=["multistep", "cosine", "plateau"],
                    default=None, help="c3d LR schedule (horizons in optimizer steps)")
    tr.add_argument("--milestones", type=int, nargs="*", default=[],
                    help="multistep decay boundaries (steps)")
    tr.add_argument("--gamma", type=float, default=0.1)
    tr.add_argument("--t-max", type=int, default=None, help="cosine horizon (steps)")
    tr.add_argument("--eta-min", type=float, default=0.0)

    _DOSE_MODELS = ["pyfer", "c3d", "hdunet", "dosegan", "vitgan", "exp"]

    ev = sub.add_parser("eval", help="OpenKBP scoring sweep")
    _add_common(ev)
    ev.add_argument("--model", choices=_DOSE_MODELS, default="pyfer",
                    help="which trained dose model the checkpoint belongs to "
                         "(every reference trainer has a test path, e.g. "
                         "train_light_c3d.py:245-322)")
    ev.add_argument("--ckpt", required=True)
    ev.add_argument("--act", choices=["relu", "mish"], default="mish",
                    help="model activation the checkpoint was trained with "
                         "(pyfer + exp; mismatches against the checkpoint's "
                         "run_config.json are refused)")
    ev.add_argument("--plots-dir", default=None,
                    help="write per-patient DVH figures + GT/pred/error slice "
                         "triptychs here (train_light_pyfer.py:222-263)")

    se = sub.add_parser("seg-eval",
                        help="OAR segmentation scoring sweep: sliding-window "
                             "Dice + HD95 + DiceCE val loss over a cohort "
                             "(the reference seg test path, "
                             "train_light_transeg.py:205-242)")
    _add_common(se)
    se.add_argument("--ckpt", required=True, help="seg-model checkpoint "
                    "(trainer slot or import-torch output)")
    se.add_argument("--mode-model", type=int, choices=[0, 1], default=1,
                    help="0 = plain MONAI UNETR, 1 = TranSeg")
    se.add_argument("--block-family", choices=["seg", "old", "ablation"],
                    default="seg")
    se.add_argument("--k7-mode", choices=["dense", "separable"],
                    default="dense",
                    help="the decoder k7 flavor the checkpoint was trained "
                         "with (see train --k7-mode)")
    se.add_argument("--sw-batch", type=int, default=4)
    se.add_argument("--roi", type=int, default=96,
                    help="sliding-window ROI the checkpoint was trained at")
    se.add_argument("--private-data", action="store_true",
                    help="treat --data as the private 13-OAR head dataset "
                         "(scores its fixed 16-patient val split)")

    inf = sub.add_parser("infer", help="linked cascade inference on one patient")
    inf.add_argument("--patient", required=True, help="patient directory")
    inf.add_argument("--seg-ckpt", required=True)
    inf.add_argument("--dose-ckpt", required=True)
    inf.add_argument("--out", required=True, help="output dose .nii.gz")
    inf.add_argument("--seg-mode", choices=["sliding", "dense"], default="sliding",
                     help="'dense' = one full-volume seg forward (≈2.6× faster "
                          "serve; validate Dice vs 'sliding' before defaulting)")
    inf.add_argument("--model-size", choices=["full", "small"], default="full")
    inf.add_argument("--roi", type=int, default=96,
                     help="the ROI the seg checkpoint was trained at; in "
                          "--seg-mode dense the pos-embed grid is derived "
                          "from it (roi // 16)")
    inf.add_argument("--block-family", choices=["seg", "old", "ablation"],
                     default="seg",
                     help="TranSeg conv-block flavor of the seg checkpoint "
                          "('old' = what import-torch produces for reference "
                          "mode_model=1 sources)")
    inf.add_argument("--k7-mode", choices=["dense", "separable"],
                     default="dense",
                     help="decoder k7 flavor of the seg checkpoint")
    inf.add_argument("--serve-dtype", choices=["float32", "bfloat16"],
                     default="float32",
                     help="'bfloat16' = TPU serving config: bf16 activations "
                          "(params stay f32) + the shipped pre-compiled serve "
                          "executables (artifacts/serve_aot/) — cold start in "
                          "seconds instead of minutes; 'float32' keeps "
                          "reference numerics and always jit-compiles")

    le = sub.add_parser("linked-eval",
                        help="cohort end-to-end cascade scoring: CT → seg → "
                             "one-hot OARs → dose, with dose/DVH/IVS scores, "
                             "DVH plots and slice triptychs "
                             "(train_light_linked_model.py:138-228)")
    _add_common(le)
    le.add_argument("--seg-ckpt", required=True)
    le.add_argument("--dose-ckpt", required=True)
    le.add_argument("--plots-dir", default=None)
    le.add_argument("--roi", type=int, default=96, help="seg sliding-window ROI")
    le.add_argument("--sw-batch", type=int, default=4)
    le.add_argument("--seg-mode", choices=["sliding", "dense"], default="sliding")
    le.add_argument("--block-family", choices=["seg", "old", "ablation"],
                    default="seg",
                    help="TranSeg conv-block flavor of the seg checkpoint "
                         "('old' = what import-torch produces for reference "
                         "mode_model=1 sources)")
    le.add_argument("--k7-mode", choices=["dense", "separable"],
                    default="dense",
                    help="decoder k7 flavor of the seg checkpoint")
    le.add_argument("--no-ivs", action="store_true")
    le.add_argument("--serve-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="'bfloat16' = TPU serving config: bf16 activations + "
                         "shipped AOT serve executables when the geometry "
                         "matches (--sw-batch 8 for the shipped sweep)")

    pr = sub.add_parser("predict", help="dose predictions for a cohort → NIfTI "
                        "files (the reference test_step's saved outputs; score "
                        "the directory with evaluation.metrics.score_prediction_dirs)")
    _add_common(pr)
    pr.add_argument("--model", choices=_DOSE_MODELS, default="pyfer")
    pr.add_argument("--ckpt", required=True, help="dose-model checkpoint")
    pr.add_argument("--act", choices=["relu", "mish"], default="mish",
                    help="exp: generator activation the checkpoint was "
                         "trained with")
    pr.add_argument("--out-dir", required=True,
                    help="one <out-dir>/<patient_id>/dose.nii.gz per patient")

    it = sub.add_parser(
        "import-torch",
        help="convert a reference torch checkpoint (NetworkTrainer .pkl, "
             "Lightning .ckpt, or bare state dict) into a framework "
             "checkpoint servable by eval/predict/infer/linked-eval "
             "(core/torch_import.py) — the migration path for reference-"
             "trained weights")
    it.add_argument("--kind", choices=["c3d", "pyfer", "transeg", "unetr", "resnet10",
                                       "hdunet", "dosegan-g", "dosegan-d",
                                       "vitgan-g", "exp-gen"],
                    required=True,
                    help="which reference network the source holds ('unetr' "
                         "= the seg task's mode_model=0 plain MONAI UNETR; "
                         "'vitgan-g' = the ViT-GAN generator, "
                         "train_light_gan.py:124; 'exp-gen' = the exp-models "
                         "TestModel generator, train_light_exp_models.py:118)")
    it.add_argument("--act", choices=["relu", "mish"], default="mish",
                    help="exp-gen: generator activation the source was "
                         "trained with")
    it.add_argument("--src", required=True, help="torch checkpoint path")
    it.add_argument("--dest", required=True, help="output checkpoint directory")
    it.add_argument("--model-size", choices=["full", "small"], default="full")
    it.add_argument("--block-family", choices=["seg", "old", "ablation"],
                    default="old",
                    help="transeg flavor the source was trained with; the "
                         "reference's mode_model=1 trains the OldModels "
                         "TRANSEG flavor (train_light_transeg.py:20) = 'old'")
    it.add_argument("--volume-size", type=int, default=128,
                    help="dose-model init volume (pyfer/c3d)")
    it.add_argument("--roi", type=int, default=96, help="transeg init volume")
    it.add_argument("--strict", action="store_true",
                    help="fail if any target leaf was not covered by the "
                         "source (default mirrors the reference's "
                         "strict=False surgery, dose_pyfer.py:394-407)")

    op = sub.add_parser(
        "openkbp-prepare",
        help="convert the OFFICIAL OpenKBP CSV release (per-patient sparse "
             "csv matrices) into the NIfTI layout train/eval consume "
             "(data/openkbp_prepare.py). Pure host numpy; no device needed.")
    op.add_argument("--csv-dir", required=True,
                    help="root of the official release (holds pt_*/ dirs of "
                         "ct.csv, dose.csv, masks, voxel_dimensions.csv)")
    op.add_argument("--out-dir", required=True,
                    help="output root; one <out-dir>/<patient_id>/ NIfTI dir "
                         "per patient")
    op.add_argument("--pattern", default="pt_*",
                    help="patient-directory glob under --csv-dir")
    op.add_argument("--ct-offset", type=float, default=0.0,
                    help="added to CT values before writing (use -1024 if "
                         "your release stores offset-unsigned CT instead of "
                         "Hounsfield units; the training transform expects HU)")
    op.add_argument("--assume-spacing", default=None, metavar="D,H,W",
                    help="voxel spacing to use for patients MISSING "
                         "voxel_dimensions.csv (otherwise an error: DVH/"
                         "D0.1cc metrics depend on the true voxel volume)")

    sc = sub.add_parser(
        "score",
        help="directory-based OpenKBP scoring: saved dose.nii.gz predictions "
             "(the predict layout) vs ground-truth patient folders — "
             "get_Dose_score_and_DVH_score, evaluate_openKBP.py:84-146. "
             "Pure host numpy; no device needed.")
    sc.add_argument("--pred-dir", required=True,
                    help="directory of <patient_id>/dose.nii.gz predictions")
    sc.add_argument("--gt-dir", required=True,
                    help="plain directory (not a glob) whose <patient_id>/ "
                         "folders hold dose.nii.gz, possible_dose_mask.nii.gz "
                         "and the structure masks")

    tu = sub.add_parser("tune", help="ASHA hyperparameter search")
    _add_common(tu)
    tu.add_argument("--num-samples", type=int, default=10)
    tu.add_argument("--sampler", choices=["random", "tpe", "gp"], default="tpe",
                    help="'tpe' = OptunaSearch analogue, 'gp' = BayesOptSearch "
                         "analogue (GP expected improvement)")
    tu.add_argument("--max-concurrent", type=int, default=1,
                    help="parallel trials (one per device sub-slice)")
    tu.add_argument("--grace-period", type=int, default=1,
                    help="ASHA grace period in validation rounds")
    tu.add_argument("--resume", action="store_true",
                    help="continue an interrupted search from "
                         "<log-dir>/trials.jsonl (completed trials seed the "
                         "sampler and the ASHA rungs; only the remaining "
                         "trials run)")

    kf = sub.add_parser("kfold", help="k-fold cross validation")
    _add_common(kf)
    kf.add_argument("--folds", type=int, default=6)
    kf.add_argument("--start-fold", type=int, default=0)

    sub.add_parser("bench", help="run the 128³ cascade latency benchmark")

    dr = sub.add_parser(
        "doctor",
        help="deployment health report: versions, backend, native IO, "
             "compile-cache state, AOT-artifact provenance vs the running "
             "runtime (stale artifacts otherwise degrade silently into "
             "minutes-long recompiles), and optional --data sanity")
    dr.add_argument("--data", default=None,
                    help="also sanity-check a patient-dir glob (e.g. "
                         "'/data/train-pats/pt_*')")
    dr.add_argument("--probe", action="store_true",
                    help="run a tiny device computation in a killable "
                         "subprocess and report its round-trip latency — "
                         "the hang-safe way to check tunnel health (with "
                         "--probe doctor never touches the backend "
                         "in-process)")
    dr.add_argument("--probe-timeout", type=float, default=600.0,
                    help="probe budget in seconds before the device is "
                         "declared unresponsive (default 600; first contact "
                         "on a fresh tunnel session can take minutes)")
    dr.add_argument("--json", action="store_true",
                    help="emit the full machine-readable report instead of "
                         "the [ok]/[warn] lines")
    dr.add_argument("--strict", action="store_true",
                    help="exit 1 when any warning is present (CI gate)")

    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform != "auto":
        # must happen before ANY jax device use; the env var alone is not
        # enough because a site hook can override it after process start
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.multihost:
        if args.cmd == "tune":
            raise SystemExit(
                "--multihost does not compose with tune: HPO parallelizes "
                "TRIALS across local devices (one search per host; aggregate "
                "trials.jsonl journals instead)")
        # must also precede first device use; after this jax.devices() spans
        # every host and --mesh axes can cover the whole pod
        from dose_prediction_tpu.parallel import multihost as MH

        MH.initialize(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)

    if args.cmd == "openkbp-prepare":
        # host-only conversion — usable with no jax backend at all
        from dose_prediction_tpu.data.openkbp_prepare import prepare_cohort

        spacing = None
        if args.assume_spacing:
            try:
                spacing = tuple(float(s) for s in args.assume_spacing.split(","))
            except ValueError:
                raise SystemExit("--assume-spacing wants three numbers: D,H,W")
            if len(spacing) != 3 or any(not (s > 0) for s in spacing):
                raise SystemExit("--assume-spacing wants three POSITIVE "
                                 "values: D,H,W (the voxel volume feeds "
                                 "DVH/D0.1cc)")
        n = prepare_cohort(args.csv_dir, args.out_dir, pattern=args.pattern,
                           ct_offset=args.ct_offset, default_spacing=spacing)
        print(json.dumps({"patients_converted": n, "out_dir": args.out_dir}))
        return 0

    if args.cmd == "doctor":
        # report-only: must not create/seed the compile cache it reports on
        from dose_prediction_tpu.cli import doctor

        return doctor.run(args)

    if args.cmd != "score":
        # every other subcommand compiles XLA programs: enable the persistent
        # compilation cache + seed it from the shipped artifacts BEFORE any
        # compilation (core/bootstrap.py; a resumed `train` would otherwise
        # pay the full minutes-long cold compile on every process start).
        # 'score' stays host-only — it must work with no jax backend at all.
        from dose_prediction_tpu.core.bootstrap import configure_compile_cache

        configure_compile_cache()

    if args.cmd == "bench":
        import runpy

        runpy.run_path(str(Path(__file__).resolve().parent.parent.parent / "bench.py"),
                       run_name="__main__")
        return 0

    if args.cmd == "score":
        # host-only numpy path — keep it usable with no device/backend at all
        import math

        from dose_prediction_tpu.evaluation.metrics import score_prediction_dirs

        dose_dif, dvh_dif, metric_means = score_prediction_dirs(
            args.pred_dir, args.gt_dir)
        if math.isnan(dose_dif):
            print("score: no scorable patients — check that <pred-dir> holds "
                  "<patient_id>/dose.nii.gz and <gt-dir> (a plain directory, "
                  "not a glob) holds matching <patient_id>/ folders with "
                  "dose.nii.gz + possible_dose_mask.nii.gz", file=sys.stderr)
            return 1
        print(json.dumps({"dose_score": dose_dif, "dvh_score": dvh_dif,
                          "metrics": metric_means}, indent=2))
        return 0

    # lazy imports: CLI help must not pull in jax
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.train.trainers import (
        CascadeC3DTrainer,
        DoseGANTrainer,
        HDUNetTrainer,
        PyferTrainer,
        TrainConfig,
        TranSegTrainer,
    )

    def parse_mesh(spec):
        if not spec:
            return None
        if spec == "auto":
            # dp over every device the runtime sees (after MH.initialize this
            # is the whole pod) — no hand-computed chip totals
            import jax

            return {"data": jax.device_count()}
        return {k: int(v) for k, v in
                (item.split("=") for item in spec.split(","))}

    def make_cfg(model_name: str = None) -> TrainConfig:
        return TrainConfig(
            max_epochs=args.epochs, check_val=args.check_val,
            batch_size=args.batch_size, learning_rate=args.lr,
            weight_decay=args.weight_decay, ckpt_dir=args.ckpt_dir,
            log_dir=args.log_dir, seed=args.seed, max_steps=args.max_steps,
            optimizer=resolve_optimizer(getattr(args, "optimizer", None),
                                        model_name),
            delta1=getattr(args, "delta1", 10.0), delta2=getattr(args, "delta2", 8.0),
            freeze_net_a=not getattr(args, "no_freeze", False),
            mesh_shape=parse_mesh(getattr(args, "mesh", None)),
            feed_dtype=getattr(args, "feed_dtype", "float32"),
            samples_per_epoch=getattr(args, "samples_per_epoch", None),
            save_per_epoch=getattr(args, "save_per_epoch", None),
            grad_accum=getattr(args, "grad_accum", 1),
            remat_blocks=getattr(args, "remat_blocks", False),
            profile_dir=getattr(args, "profile_dir", None),
            lr_encoder=getattr(args, "lr_encoder", None),
            lr_decoder=getattr(args, "lr_decoder", None),
            scheduler=getattr(args, "scheduler", None),
            milestones=tuple(getattr(args, "milestones", []) or []),
            gamma=getattr(args, "gamma", 0.1),
            t_max=getattr(args, "t_max", None),
            eta_min=getattr(args, "eta_min", 0.0),
        )

    def pyfer_model(act=None, multiS_conv=True):
        # honor --act (parser default 'mish' = the reference's tuned value,
        # train_light_pyfer.py:294); tune trials pass their sampled act
        if act is None:
            act = getattr(args, "act", "mish")
        return default_flagship_model(
            act=act, multiS_conv=multiS_conv,
            remat_blocks=getattr(args, "remat_blocks", False),
            small=getattr(args, "model_size", "full") == "small")

    def transeg_model(out_ch=8, block_family="seg", trained_grid=None, dtype=None):
        # remat only matters for training; eval/infer parsers don't define it
        return default_seg_model(
            out_ch=out_ch, block_family=block_family,
            trained_grid=trained_grid, dtype=dtype,
            remat_blocks=getattr(args, "remat_blocks", False),
            k7_mode=getattr(args, "k7_mode", "dense"),
            small=getattr(args, "model_size", "full") == "small")

    def unetr_model(out_ch=8):
        from dose_prediction_tpu.models import UNETR

        if getattr(args, "model_size", "full") == "small":
            return UNETR(out_ch=out_ch, feature_size=2, hidden_size=24,
                         mlp_dim=48, num_layers=4, num_heads=2)
        return UNETR(out_ch=out_ch)

    def build_dose_trainer(model_name: str, cfg, shape):
        """ONE construction path for ``train`` and ``eval``/``predict`` so a
        train → eval round trip always rebuilds the identical architecture
        (small or full; generator configs pinned to the reference's)."""
        small = getattr(args, "model_size", "full") == "small"
        lr_override = getattr(args, "lr", _DEFAULT_LR) != _DEFAULT_LR
        ex = (1, *shape, 9)
        if model_name == "pyfer":
            pre = None
            if getattr(args, "pretrained_c3d", None):
                if args.pretrained_c3d.endswith((".pkl", ".pt", ".pth", ".ckpt")):
                    # reference-format torch pickle (create_pretrained_unet
                    # source, c3d.py:172-204) → converted flax tree; surgery
                    # happens in PyferTrainer via load_pretrained_net_a
                    from dose_prediction_tpu.core.torch_import import (
                        c3d_key_map,
                        load_torch_checkpoint,
                        state_dict_to_tree,
                    )
                    pre = state_dict_to_tree(
                        load_torch_checkpoint(args.pretrained_c3d), c3d_key_map)
                else:
                    from dose_prediction_tpu.core.checkpoint import restore_checkpoint
                    pre = restore_checkpoint(args.pretrained_c3d)
                    pre = pre.get("state", pre).get("params", pre)
            return PyferTrainer(cfg, model=pyfer_model(),
                                pretrained_c3d_params=pre, example_shape=ex)
        if model_name == "c3d":
            from dose_prediction_tpu.models import CascadeC3D

            model = CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                               list_ch_B=(-1, 2, 4, 8, 16, 32)) if small else None
            return CascadeC3DTrainer(cfg, model=model, example_shape=ex)
        if model_name == "hdunet":
            from dose_prediction_tpu.models import HDUNet

            model = HDUNet(growth_rate=4, upsample_chan=8) if small else None
            return HDUNetTrainer(cfg, model=model, example_shape=ex)
        if model_name == "dosegan":
            # GAN LRs default to the reference's values; an explicit --lr
            # overrides (the parser default is the pyfer-tuned value, which
            # would be wrong for the GANs)
            kw = {"ngf": 4, "ndf": 4} if small else {}
            if lr_override:
                kw["gan_lr"] = args.lr
            return DoseGANTrainer(cfg, example_shape=ex, **kw)
        if model_name == "vitgan":
            from dose_prediction_tpu.models.experiments import vitgan_generator
            from dose_prediction_tpu.train.gan import VitGANTrainer

            kw = {"g_lr": args.lr, "d_lr": args.lr} if lr_override else {}
            return VitGANTrainer(
                cfg, generator=vitgan_generator(small), example_shape=ex,
                unfreeze_epoch=getattr(args, "unfreeze_epoch", 10),
                pretrained_critic=getattr(args, "pretrained_critic", None), **kw)
        # exp
        from dose_prediction_tpu.models.experiments import exp_generator
        from dose_prediction_tpu.train.trainers import ExpModelTrainer

        return ExpModelTrainer(
            cfg, exp_generator(small, act=getattr(args, "act", "mish")),
            example_shape=ex)

    if args.cmd == "import-torch":
        import numpy as np

        import jax
        import jax.numpy as jnp

        from dose_prediction_tpu.core import torch_import as TI
        from dose_prediction_tpu.core.checkpoint import save_checkpoint

        small = args.model_size == "small"
        if args.kind == "transeg":
            model = transeg_model(block_family=args.block_family)
            shape = (1, args.roi, args.roi, args.roi, 1)
        elif args.kind == "unetr":
            model = unetr_model()
            shape = (1, args.roi, args.roi, args.roi, 1)
        elif args.kind == "resnet10":
            from dose_prediction_tpu.models.experiments import ResNet3D

            model = (ResNet3D(widths=(4, 8, 16, 32)) if small else ResNet3D())
            s = min(args.volume_size, 64)   # conv-only: shapes volume-free
            shape = (1, s, s, s, 1)
        elif args.kind == "hdunet":
            from dose_prediction_tpu.models import HDUNet

            model = (HDUNet(growth_rate=4, upsample_chan=8) if small else HDUNet())
            s = min(args.volume_size, 64)
            shape = (1, s, s, s, 9)
        elif args.kind == "dosegan-g":
            from dose_prediction_tpu.models.dosegan import UnetGenerator3D

            model = UnetGenerator3D(out_ch=1, ngf=4 if small else 64)
            s = min(args.volume_size, 64)   # 6 down levels need >= 64
            shape = (1, s, s, s, 9)
        elif args.kind == "dosegan-d":
            from dose_prediction_tpu.models.dosegan import NLayerDiscriminator

            model = NLayerDiscriminator(ndf=4 if small else 64)
            s = min(args.volume_size, 64)
            shape = (1, s, s, s, 1)
        elif args.kind in ("vitgan-g", "exp-gen"):
            from dose_prediction_tpu.models.experiments import (
                exp_generator,
                vitgan_generator,
            )

            model = (vitgan_generator(small) if args.kind == "vitgan-g"
                     else exp_generator(small, act=args.act))
            s = args.volume_size   # ViT pos-embed grid is volume-dependent
            shape = (1, s, s, s, 9)
        else:
            # pyfer's ViT pos-embed grid IS volume-dependent — init at the
            # true serve volume; the conv-only C3D can init small
            model = pyfer_model() if args.kind == "pyfer" else None
            s = args.volume_size
            if model is None:
                from dose_prediction_tpu.models import CascadeC3D

                model = (CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                                    list_ch_B=(-1, 2, 4, 8, 16, 32)) if small
                         else CascadeC3D())
                s = min(args.volume_size, 64)
            shape = (1, s, s, s, 9)
        # REAL model init (one jit'd forward): any target leaf the source does
        # not cover keeps its proper initialization — the reference's
        # strict=False load semantics (dose_pyfer.py:394-407; MedicalNet
        # pickles carry no fc, which must stay trainable-at-init, not zeros)
        variables = jax.tree.map(
            np.asarray,
            jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.zeros(shape, jnp.float32)))
        sd = TI.load_torch_checkpoint(args.src)
        if args.kind == "pyfer":
            imported, stats = TI.import_pyfer(sd, variables)
        elif args.kind == "transeg":
            imported, stats = TI.import_transeg(sd, variables)
        elif args.kind == "unetr":
            imported, stats = TI.import_unetr(sd, variables)
        elif args.kind == "resnet10":
            imported, stats = TI.import_resnet10(sd, variables)
        elif args.kind == "hdunet":
            imported, stats = TI.import_hdunet(sd, variables)
        elif args.kind == "dosegan-g":
            imported, stats = TI.import_dosegan_g(sd, variables)
        elif args.kind == "dosegan-d":
            imported, stats = TI.import_dosegan_d(sd, variables)
        elif args.kind in ("vitgan-g", "exp-gen"):
            imported, stats = TI.import_vitgen(sd, variables)
        else:
            params, stats = TI.import_c3d_cascade(sd, variables["params"])
            imported = {"params": params,
                        "batch_stats": variables.get("batch_stats", {})}
        print(f"[import-torch] {args.kind}: copied {stats['copied']} / "
              f"inside {stats['inside']}, missing {stats['missing']}, "
              f"unused {stats['unused']}")
        # strict = every target leaf actually RECEIVED a copy: 'missing'
        # counts source paths absent from the target; an in-target path whose
        # shape mismatched (merge_partial skips the copy) shows up only as
        # copied < inside — both violate the strict contract
        if args.strict and (stats["missing"] or stats["copied"] < stats["inside"]):
            print(f"[import-torch] --strict: {stats['missing']} leaves not "
                  f"covered by the source, "
                  f"{stats['inside'] - stats['copied']} skipped on shape "
                  "mismatch", file=sys.stderr)
            return 1
        save_checkpoint(args.dest, imported)
        print(f"[import-torch] wrote {args.dest}")
        return 0

    if args.cmd == "train":
        cfg = make_cfg(args.model)
        if args.model == "transeg" and getattr(args, "private_data", False):
            from dose_prediction_tpu.data.private_seg import PrivateSegDataset
            from dose_prediction_tpu.train.trainers import TranSegTrainer

            train_ds = PrivateSegDataset(args.data, split="train").as_seg()
            val_ds = PrivateSegDataset(args.val_data or args.data, split="val").as_seg()
            trainer = TranSegTrainer(
                cfg, model=transeg_model(
                    out_ch=14,
                    block_family=getattr(args, "block_family", "seg")),
                crop=(args.roi,) * 3, num_classes=14)
            trainer.fit(train_ds, val_ds)
            return 0
        if args.model == "transeg":
            if getattr(args, "mode_model", 1) == 0:
                from dose_prediction_tpu.train.trainers import UNETRSegTrainer

                trainer = UNETRSegTrainer(cfg, model=unetr_model(),
                                          crop=(args.roi,) * 3)
            else:
                trainer = TranSegTrainer(
                    cfg, model=transeg_model(
                        block_family=getattr(args, "block_family", "seg")),
                    crop=(args.roi,) * 3)
            train_ds = OpenKBPDataset(args.data, size=args.size)
            val_ds = (OpenKBPDataset(args.val_data, keep_structures=True)
                      if args.val_data else None)
            trainer.fit(train_ds, val_ds)
            return 0
        train_ds = OpenKBPDataset(args.data, size=args.size)
        val_ds = OpenKBPDataset(args.val_data, keep_structures=True) if args.val_data else None
        # the ViT pos-embed grid is shape-specific: derive the example shape
        # from the actual data rather than assuming 128³
        shape = train_ds.patients[0].ct.shape
        trainer = build_dose_trainer(args.model, cfg, shape)
        trainer.fit(train_ds, val_ds)
        return 0

    def _graft_variables(state, variables, what: str):
        """Replace a TrainState's params/batch_stats with a checkpoint's,
        with a clear error if the checkpoint holds a different architecture
        (e.g. full-size weights into a --model-size small model)."""
        import numpy as np

        from dose_prediction_tpu.core.checkpoint import flatten_params

        src = flatten_params(variables["params"])
        tgt = flatten_params(state.params)
        if set(src) != set(tgt):
            missing = sorted("/".join(k) for k in set(tgt) - set(src))[:5]
            extra = sorted("/".join(k) for k in set(src) - set(tgt))[:5]
            raise SystemExit(
                f"checkpoint does not match the constructed {what} "
                f"architecture (check --model/--model-size/--act): "
                f"missing leaves {missing}, unexpected leaves {extra}")
        bad = [("/".join(k), tuple(np.shape(src[k])), tuple(np.shape(tgt[k])))
               for k in tgt if np.shape(src[k]) != np.shape(tgt[k])]
        if bad:
            raise SystemExit(
                f"checkpoint leaf shapes do not match the constructed {what} "
                f"architecture (check --model-size): {bad[:5]}")
        return state.replace(params=variables["params"],
                             batch_stats=variables.get("batch_stats") or {})

    def restored_dose_trainer(model_name: str, shape):
        """Trainer + unified ``predict_fn(batch) -> Gy prediction`` for a
        trained checkpoint of ANY dose model — every reference trainer has a
        test path (train_light_{pyfer:199,c3d:245,hdunet:165,dosegan:207,
        gan,exp_models:263}.py), so eval/predict must too. The checkpoint may
        be a trainer slot ({'state'|'g'+'d', 'epoch'}) OR the bare variables
        import-torch writes — variables_from_checkpoint normalizes both."""
        from dose_prediction_tpu.core.checkpoint import (
            restore_checkpoint,
            variables_from_checkpoint,
        )

        tr = build_dose_trainer(model_name, make_cfg(model_name), shape)
        _check_ckpt_config(args.ckpt,
                           *([tr.gen, tr.disc]
                             if model_name in ("dosegan", "vitgan")
                             else [tr.model]))
        raw = restore_checkpoint(args.ckpt)
        variables = variables_from_checkpoint(raw)
        if model_name in ("dosegan", "vitgan"):
            tr.g_state = _graft_variables(tr.g_state, variables, "generator")
            if isinstance(raw, dict) and isinstance(raw.get("d"), dict):
                tr.d_state = _graft_variables(
                    tr.d_state,
                    {"params": raw["d"]["params"],
                     "batch_stats": raw["d"].get("batch_stats") or {}},
                    "discriminator")
        else:
            tr.state = _graft_variables(tr.state, variables, "model")

        if model_name == "pyfer":
            predict_fn = lambda batch: tr.eval_step(tr.state, batch)["prediction"]
        elif model_name == "c3d":
            from dose_prediction_tpu.evaluation import metrics as M

            predict_fn = lambda batch: M.postprocess_prediction_jax(
                tr._predict(tr.state.params, batch["input"]), batch["gt"][..., 1:2])
        elif model_name == "hdunet":
            predict_fn = lambda batch: tr.eval_step(tr.state.params, batch)[2]
        elif model_name == "dosegan":
            predict_fn = lambda batch: tr.eval_step(
                tr.g_state.params, tr.g_state.batch_stats, batch)[2]
        else:  # vitgan / exp: sliding-window ×val_scale predictions
            from dose_prediction_tpu.evaluation import metrics as M

            state = tr.g_state if model_name == "vitgan" else tr.state
            run = tr._sw_run(4)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            predict_fn = lambda batch: M.postprocess_prediction_jax(
                run(batch["input"], variables), batch["gt"][..., 1:2],
                scale=tr.val_scale)
        return tr, predict_fn

    if args.cmd == "eval":
        ds = OpenKBPDataset(args.data, size=args.size, keep_structures=True)
        trainer, _ = restored_dose_trainer(args.model, ds.patients[0].ct.shape)
        results = trainer.test(ds, plots_dir=args.plots_dir)
        print(json.dumps({k: v for k, v in results.items() if k != "per_patient"}, indent=2))
        return 0

    if args.cmd == "seg-eval":
        from dose_prediction_tpu.core.checkpoint import (
            restore_checkpoint,
            variables_from_checkpoint,
        )
        from dose_prediction_tpu.train.trainers import TranSegTrainer as _TST

        if getattr(args, "private_data", False):
            from dose_prediction_tpu.data.private_seg import PrivateSegDataset

            ds = PrivateSegDataset(args.data, split="val").as_seg()
            num_classes = 14
        else:
            ds = OpenKBPDataset(args.data, size=args.size, keep_structures=True)
            num_classes = 8
        cfg = make_cfg()
        crop = (args.roi,) * 3
        if args.mode_model == 0:
            from dose_prediction_tpu.train.trainers import UNETRSegTrainer

            tr = UNETRSegTrainer(cfg, model=unetr_model(out_ch=num_classes),
                                 crop=crop, num_classes=num_classes)
        else:
            tr = _TST(cfg, model=transeg_model(out_ch=num_classes,
                                               block_family=args.block_family),
                      crop=crop, num_classes=num_classes)
        _check_ckpt_config(args.ckpt, tr.model)
        variables = variables_from_checkpoint(restore_checkpoint(args.ckpt))
        tr.state = _graft_variables(tr.state, variables, "seg model")
        dice, hd95, val_loss = tr.validate(ds, sw_batch_size=args.sw_batch)
        print(json.dumps({"dice_metric": dice, "hd95_metric": hd95,
                          "val_loss": val_loss}, indent=2))
        return 0

    if args.cmd == "predict":
        import jax.numpy as jnp
        import numpy as np
        from dose_prediction_tpu.data.nifti import write_nifti

        ds = OpenKBPDataset(args.data, size=args.size)
        _, predict_fn = restored_dose_trainer(args.model, ds.patients[0].ct.shape)
        out_root = Path(args.out_dir)
        for p in ds.patients:
            batch = {"input": jnp.asarray(p.model_input[None]),
                     "gt": jnp.asarray(p.gt[None])}
            pred = np.asarray(predict_fn(batch))[0, ..., 0]
            out = out_root / p.patient_id
            out.mkdir(parents=True, exist_ok=True)
            write_nifti(out / "dose.nii.gz", pred, spacing=p.spacing)
            print(f"wrote {out / 'dose.nii.gz'}")
        return 0

    if args.cmd == "linked-eval":
        from dose_prediction_tpu.train.linked import LinkedModel

        from dose_prediction_tpu.models import TranSeg

        ds = OpenKBPDataset(args.data, size=args.size, keep_structures=True)
        seg_model, dose_model = None, None
        if getattr(args, "model_size", "full") == "small":
            grid = ((args.roi // TranSeg.patch_size,) * 3
                    if args.seg_mode == "dense" else None)
            seg_model = transeg_model(block_family=args.block_family,
                                      trained_grid=grid)
            dose_model = pyfer_model()
        if args.seg_mode == "dense":
            print("[linked-eval] seg_mode=dense: one full-volume seg forward; "
                  "exact only when roi >= volume — compare Dice vs "
                  "--seg-mode sliding before serving with it "
                  "(docs/PERFORMANCE.md 'dense fast path')")
        model = LinkedModel(seg_model=seg_model, dose_model=dose_model,
                            seg_ckpt=args.seg_ckpt, dose_ckpt=args.dose_ckpt,
                            roi_size=(args.roi,) * 3, sw_batch_size=args.sw_batch,
                            seg_mode=args.seg_mode,
                            serve_dtype=getattr(args, "serve_dtype", "float32"),
                            seg_block_family=args.block_family,
                            seg_k7_mode=getattr(args, "k7_mode", "dense"))
        _check_ckpt_config(args.seg_ckpt, model.seg_model)
        _check_ckpt_config(args.dose_ckpt, model.dose_model)
        results = model.evaluate(ds, log_dir=args.log_dir,
                                 plots_dir=args.plots_dir,
                                 with_ivs=not args.no_ivs)
        print(json.dumps({k: v for k, v in results.items()
                          if k not in ("per_patient", "ivs")}, indent=2))
        return 0

    if args.cmd == "infer":
        import jax.numpy as jnp
        import numpy as np
        from dose_prediction_tpu.core.checkpoint import restore_checkpoint
        from dose_prediction_tpu.data.nifti import write_nifti
        from dose_prediction_tpu.data.openkbp import load_patient
        from dose_prediction_tpu.infer.cascade import make_cascade_fn
        from dose_prediction_tpu.models import DosePyfer, TranSeg

        from dose_prediction_tpu.core.checkpoint import variables_from_checkpoint

        p = load_patient(args.patient)
        serve_bf16 = getattr(args, "serve_dtype", "float32") == "bfloat16"
        dtype = jnp.bfloat16 if serve_bf16 else jnp.float32
        # dense mode: the pos-embed grid comes from the ROI the checkpoint
        # was trained at (roi // patch), not a hardcoded 96³ assumption
        grid = ((args.roi // TranSeg.patch_size,) * 3
                if args.seg_mode == "dense" else None)
        seg = transeg_model(block_family=args.block_family,
                            trained_grid=grid, dtype=dtype)
        # single-construction-path contract: a hand-rolled DosePyfer here
        # could drift from train/eval's defaults (and from the serve-AOT
        # build spec), silently serving a different graph
        dose = default_flagship_model(
            small=getattr(args, "model_size", "full") == "small", dtype=dtype)
        _check_ckpt_config(args.seg_ckpt, seg)
        _check_ckpt_config(args.dose_ckpt, dose)
        seg_vars = variables_from_checkpoint(restore_checkpoint(args.seg_ckpt))
        dose_vars = variables_from_checkpoint(restore_checkpoint(args.dose_ckpt))
        # the shipped AOT sweep was built at roi 96 / sw_batch 8 (bench geometry)
        run = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                              roi_size=(args.roi,) * 3,
                              seg_mode=args.seg_mode,
                              sw_batch_size=8 if serve_bf16 else 4,
                              aot=serve_bf16,
                              input_dtype=dtype if serve_bf16 else None)
        out = run(jnp.asarray(p.ct[None, ..., None]),
                  jnp.asarray(p.ptv[None, ..., None]),
                  jnp.asarray(p.dose_mask[None, ..., None]))
        write_nifti(args.out, np.asarray(out)[0, ..., 0], spacing=p.spacing)
        print(f"wrote {args.out}")
        return 0

    if args.cmd == "tune":
        from dose_prediction_tpu.train.tune import ASHAScheduler, run_search

        if args.mesh and args.max_concurrent > 1:
            raise SystemExit(
                "--mesh does not compose with --max-concurrent > 1: "
                "concurrent trials parallelize one-per-device, while a mesh "
                "spans devices — together they contend for the same chips. "
                "Drop one of the flags (a mesh per trial is fine with "
                "--max-concurrent 1).")
        train_ds = OpenKBPDataset(args.data, size=args.size)
        val_ds = OpenKBPDataset(args.val_data, size=args.size) if args.val_data else train_ds
        shape = train_ds.patients[0].ct.shape

        import itertools
        trial_counter = itertools.count()

        def train_trial(config, report):
            tid = next(trial_counter)   # per-trial ckpt/log dirs (safe when concurrent)
            cfg = make_cfg("pyfer")
            cfg = type(cfg)(**{**cfg.__dict__,
                               "learning_rate": config["lr"],
                               "weight_decay": config["weight_decay"],
                               "max_epochs": args.epochs,
                               "ckpt_dir": str(Path(args.ckpt_dir) / f"trial_{tid}"),
                               "log_dir": str(Path(args.log_dir) / f"trial_{tid}")})
            model = pyfer_model(act=config["act"], multiS_conv=config["multiS_conv"])
            trainer = PyferTrainer(cfg, model=model,
                                   example_shape=(1, *shape, 9))
            rounds = {"n": 0}

            # report each validation round; ASHA returning True halts the fit
            def on_validation(epoch, metrics):
                rounds["n"] += 1
                return report(rounds["n"], -metrics["mean_dose_score"])

            trainer.fit(train_ds, val_ds, resume=False, on_validation=on_validation)
            return -trainer.best_val  # minimize dose score

        # pin the settings shared by every trial (NOT searched over) next to
        # the journal: resuming after a CLI default flip (e.g. the pyfer
        # optimizer adamw→adam8bit) would otherwise mix trials trained under
        # different optimizers into one sampler/rung history, making the
        # reported best_config unreproducible
        shared = {"optimizer": make_cfg("pyfer").optimizer,
                  "model_size": getattr(args, "model_size", "full"),
                  "feed_dtype": getattr(args, "feed_dtype", "float32")}
        shared_path = Path(args.log_dir) / "tune_config.json"
        if args.resume and shared_path.exists():
            prior = json.loads(shared_path.read_text())
            if prior != shared:
                raise SystemExit(
                    f"tune --resume: this search's journaled trials ran with "
                    f"{prior}, the current invocation would run {shared} — "
                    f"their scores are not comparable. Relaunch with the "
                    f"recorded settings (e.g. --optimizer "
                    f"{prior.get('optimizer')}) or start a fresh --log-dir.")
        shared_path.parent.mkdir(parents=True, exist_ok=True)
        shared_path.write_text(json.dumps(shared, indent=2, sort_keys=True))
        scheduler = ASHAScheduler(max_t=max(1, args.epochs // args.check_val),
                                  grace_period=args.grace_period, mode="min")
        res = run_search(train_trial, num_samples=args.num_samples,
                         scheduler=scheduler, sampler=args.sampler,
                         max_concurrent=args.max_concurrent,
                         out_dir=args.log_dir, resume=args.resume)
        print(json.dumps({"best_config": res["best_config"],
                          "best_value": res["best_value"],
                          "num_early_stopped": res["num_early_stopped"]},
                         indent=2, default=str))
        return 0

    if args.cmd == "kfold":
        from dose_prediction_tpu.train.kfold import run_kfold

        ds = OpenKBPDataset(args.data, size=args.size, keep_structures=True)

        def make_trainer(fold, ckpt_dir):
            cfg = make_cfg("pyfer")
            cfg = type(cfg)(**{**cfg.__dict__, "ckpt_dir": ckpt_dir})
            return PyferTrainer(cfg, model=pyfer_model(),
                                example_shape=(1, *ds.patients[0].ct.shape, 9))

        results = run_kfold(ds, make_trainer, n_folds=args.folds,
                            start_fold=args.start_fold, base_dir=args.ckpt_dir)
        print(json.dumps({f: {"mean_dose_score": r.get("mean_dose_score")}
                          for f, r in results.items()}, indent=2))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
