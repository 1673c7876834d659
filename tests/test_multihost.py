"""Multi-host SPMD (parallel/multihost.py): two real processes, 4 virtual CPU
devices each, one dp=8 global mesh — the cross-host scale-out path that the
single-process virtual mesh cannot exercise."""

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
    jax.config.update("jax_num_cpu_devices", 4)
    pid = int(sys.argv[1]); port = sys.argv[2]
    from dose_prediction_tpu.parallel import multihost as MH
    MH.initialize(coordinator_address="127.0.0.1:" + port,
                  num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = MH.global_mesh({{"data": 8}})

    # every process owns its contiguous half of a 8x3 global batch
    sl = MH.process_slice(8)
    full_x = np.arange(24, dtype=np.float32).reshape(8, 3)
    full_y = np.linspace(0, 1, 8, dtype=np.float32)
    x = MH.shard_host_batch(mesh, full_x[sl])
    y = MH.shard_host_batch(mesh, full_y[sl])
    w = jax.device_put(np.full((3,), 0.1, np.float32),
                       NamedSharding(mesh, P()))       # replicated params

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)          # GSPMD inserts the psum
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.01 * g

    loss, w2 = step(w, x, y)
    print(f"RESULT pid={{pid}} loss={{float(loss):.6f}} "
          f"wsum={{float(jnp.sum(w2)):.6f}}", flush=True)
""").format(repo=str(REPO))


def test_two_process_dp_mesh_matches_numpy():
    port = str(53200 + os.getpid() % 500)
    procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker hung")
        outs.append(out)
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[parts["pid"]] = (float(parts["loss"]), float(parts["wsum"]))
    assert results["0"] == results["1"]                 # replicas agree

    # numpy ground truth of the same global step
    x = np.arange(24, dtype=np.float32).reshape(8, 3)
    y = np.linspace(0, 1, 8, dtype=np.float32)
    w = np.full((3,), 0.1, np.float32)
    r = x @ w - y
    loss = float(np.mean(r ** 2))
    g = 2.0 * (x.T @ r) / 8.0
    wsum = float(np.sum(w - 0.01 * g))
    got_loss, got_wsum = results["0"]
    assert got_loss == pytest.approx(loss, rel=1e-5)
    assert got_wsum == pytest.approx(wsum, rel=1e-5)
