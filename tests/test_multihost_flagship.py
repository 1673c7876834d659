"""Multi-host flagship step: the REAL DOSE-PYFER training step (GenLoss deep
supervision, frozen net_A, adamw) across two processes on a dp=2 global mesh
— proves the product step functions are multi-host clean, not just the toy
matmul in test_multihost."""

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
    pid = int(sys.argv[1]); port = sys.argv[2]
    from dose_prediction_tpu.parallel import multihost as MH
    MH.initialize(coordinator_address="127.0.0.1:" + port,
                  num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train import state as S
    from dose_prediction_tpu.train import steps as STEP

    mesh = MH.global_mesh({{"data": 2}})
    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                      feature_size=2, hidden_size=24, mlp_dim=48,
                      num_layers=2, num_heads=2)
    x0 = jnp.zeros((1, 32, 32, 32, 9), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    repl = NamedSharding(mesh, P())
    variables = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a), repl), variables)
    freeze = S.cascade_freeze_labels(variables["params"])
    tx = S.make_optimizer(learning_rate=1e-3, weight_decay=1e-4,
                          freeze_labels=freeze)
    state = S.create_train_state(variables, tx)
    print(f"pid={{pid}} state ready", flush=True)
    step = STEP.make_pyfer_train_step(model, tx, freeze=True, donate=False)

    rng = np.random.default_rng(7)                 # same global batch on
    full_inp = rng.normal(size=(2, 32, 32, 32, 9)).astype(np.float32)
    full_gt = np.abs(rng.normal(size=(2, 32, 32, 32, 2))).astype(np.float32)
    sl = MH.process_slice(2)
    batch = MH.shard_host_batch(
        mesh, {{"input": full_inp[sl], "gt": full_gt[sl]}})
    state, loss = step(state, batch)
    print(f"RESULT pid={{pid}} loss={{float(loss):.6f}}", flush=True)
""").format(repo=str(REPO))


@pytest.mark.slow
def test_two_process_flagship_train_step():
    port = str(53700 + os.getpid() % 500)
    procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    losses = []
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
            pytest.fail("flagship multihost worker hung; partial output:\n"
                        + "\n---\n".join(partials))
        assert p.returncode == 0, out
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        losses.append(float(line.split("loss=")[1]))
    assert losses[0] == losses[1]                    # replicas in lockstep
    assert np.isfinite(losses[0]) and losses[0] > 0.0
