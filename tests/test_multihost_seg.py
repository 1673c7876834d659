"""Multi-host seg training: TranSegTrainer.fit across two real processes on a
dp=2 mesh, with the per-process seg feed (seg_batches process_rows — each host
gathers only its crops of the global batch on one shared rng stream). The
subprocess pair must match a single-process run of the SAME config on a local
dp=2 mesh, proving the sliced feed reassembles the exact global batches."""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    pid = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
    from dose_prediction_tpu.parallel import multihost as MH
    MH.initialize(coordinator_address="127.0.0.1:" + port,
                  num_processes=2, process_id=pid)
    import os, time
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.models import TranSeg
    from dose_prediction_tpu.train.trainers import TranSegTrainer, TrainConfig

    data_dir = work + "/data"
    if pid == 0:
        pattern = make_synthetic_dataset(data_dir, n_patients=2,
                                         shape=(32, 32, 32))
        open(work + "/data_ready", "w").write("ok")
    else:
        while not os.path.exists(work + "/data_ready"):
            time.sleep(0.5)
        pattern = data_dir + "/pt_*"
    ds = OpenKBPDataset(pattern)

    model = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                    num_layers=2, num_heads=2)
    # ONE shared ckpt dir: orbax multiprocess saves are barrier-coordinated,
    # so every rank must participate in the same checkpoint
    cfg = TrainConfig(max_epochs=1, check_val=50, batch_size=2,
                      learning_rate=1e-3, mesh_shape={{"data": 2}},
                      ckpt_dir=work + "/ckpt",
                      log_dir=work + "/logs")
    tr = TranSegTrainer(cfg, model=model, crop=(16, 16, 16))
    tr.fit(ds, val_ds=None, num_samples=2, resume=False)
    # multihost validation: lockstep sliding-window sweep on the global mesh
    # (uncommitted numpy inputs; the window batch shards over 'data')
    dice, hd95, vloss = tr.validate(ds, sw_batch_size=2)
    print(f"RESULT pid={{pid}} loss={{float(tr.state.moving_loss):.6f}} "
          f"step={{int(tr.state.step)}} vloss={{vloss:.6f}}", flush=True)
""").format(repo=str(REPO))


@pytest.mark.slow
def test_two_process_seg_trainer_matches_single_process(tmp_path):
    port = str(55200 + os.getpid() % 500)
    procs = [subprocess.Popen(
                 [sys.executable, "-c", WORKER, str(pid), port,
                  str(tmp_path)],
                 stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    results = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost seg worker hung")
        assert p.returncode == 0, out
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results.append((float(parts["loss"]), int(parts["step"]),
                        float(parts["vloss"])))
    assert results[0] == results[1]                   # replicas in lockstep
    loss2p, step2p, vloss2p = results[0]
    assert np.isfinite(loss2p) and loss2p > 0.0
    assert np.isfinite(vloss2p) and vloss2p > 0.0     # multihost val sweep ran
    assert step2p == 2                # 2 patients x 2 crops / global batch 2

    # single-process reference on a local dp=2 mesh, same config/seed: the
    # per-process sliced feed must have reassembled the SAME global batches
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.models import TranSeg
    from dose_prediction_tpu.train.trainers import TranSegTrainer, TrainConfig

    ds = OpenKBPDataset(str(tmp_path / "data" / "pt_*"))
    model = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                    num_layers=2, num_heads=2)
    cfg = TrainConfig(max_epochs=1, check_val=50, batch_size=2,
                      learning_rate=1e-3, mesh_shape={"data": 2},
                      ckpt_dir=str(tmp_path / "ckpt_ref"),
                      log_dir=str(tmp_path / "logs_ref"))
    tr = TranSegTrainer(cfg, model=model, crop=(16, 16, 16))
    tr.fit(ds, val_ds=None, num_samples=2, resume=False)
    assert int(tr.state.step) == step2p
    assert float(tr.state.moving_loss) == pytest.approx(loss2p, rel=1e-4)
