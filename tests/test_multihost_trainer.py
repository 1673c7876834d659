"""Multi-host PRODUCT-path training: PyferTrainer.fit on a dp=2 mesh spanning
two real processes — per-host batch shards through device_prefetch, GSPMD
gradient all-reduce, and a coordinated orbax checkpoint to a shared dir."""

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
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train.trainers import PyferTrainer, TrainConfig

    # every process loads the same synthetic cohort (a pod's shared fs);
    # process 0 generates, 1 waits for the marker file
    import time
    data_dir = work + "/data"
    if pid == 0:
        pattern = make_synthetic_dataset(data_dir, n_patients=2,
                                         shape=(32, 32, 32))
        open(work + "/data_ready", "w").write("ok")
    else:
        while not __import__("os").path.exists(work + "/data_ready"):
            time.sleep(0.5)
        pattern = data_dir + "/pt_*"
    ds = OpenKBPDataset(pattern)

    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                      feature_size=2, hidden_size=24, mlp_dim=48,
                      num_layers=2, num_heads=2)
    cfg = TrainConfig(max_epochs=2, check_val=2, batch_size=2,
                      learning_rate=1e-3, mesh_shape={{"data": 2}},
                      ckpt_dir=work + "/ckpt", log_dir=work + "/logs")
    tr = PyferTrainer(cfg, model=model, example_shape=(2, 32, 32, 32, 9))
    # val_ds exercises the multiprocess REPLICATED feed (full-volume batches
    # assembled via make_array_from_process_local_data on every process) and
    # the coordinated monitored checkpoint save
    tr.fit(ds, val_ds=ds, resume=False)
    print(f"RESULT pid={{pid}} loss={{float(tr.state.moving_loss):.6f}} "
          f"step={{int(tr.state.step)}} val={{tr.best_val:.6f}}", flush=True)
""").format(repo=str(REPO))


@pytest.mark.slow
def test_two_process_pyfer_trainer_fit(tmp_path):
    port = str(54200 + os.getpid() % 500)
    procs = [subprocess.Popen(
                 [sys.executable, "-c", WORKER, str(pid), port,
                  str(tmp_path)],
                 stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    results = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            partials = []
            for q in procs:
                q.kill()
                try:
                    partials.append(q.communicate(timeout=10)[0])
                except Exception:
                    partials.append("<no output>")
            pytest.fail("multihost trainer worker hung; partial output:\n"
                        + "\n---\n".join(partials))
        assert p.returncode == 0, out
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results.append((float(parts["loss"]), int(parts["step"]),
                        float(parts["val"])))
    # replicas trained in lockstep to the same state (incl. the replicated
    # validation sweep's mean_dose_score)
    assert results[0] == results[1]
    loss, step, val = results[0]
    assert np.isfinite(loss) and loss > 0.0
    assert step == 2                                  # 2 epochs x 1 batch
    assert np.isfinite(val) and val < 0.0             # -masked MAE in Gy
    # the coordinated orbax 'last' slot landed in the shared dir
    assert (tmp_path / "ckpt" / "last").exists()
    # non-zero processes logged to a suffixed file (no interleaving)
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    assert (tmp_path / "logs" / "metrics.p1.jsonl").exists()
