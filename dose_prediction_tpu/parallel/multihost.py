"""Multi-host (multi-process) SPMD: scale past one host's chips.

One JAX process per host; `jax.distributed.initialize` wires them into a
single runtime whose `jax.devices()` spans every host. A `Mesh` built over
that global device list makes GSPMD insert cross-host collectives
automatically — gradient all-reduce rides ICI within a slice and DCN across
slices, with no bespoke communication code (the same design as the
single-host `parallel.mesh`, SURVEY.md §2.9/§5.8; the reference's nearest
analogues are nn.DataParallel and RayStrategy(num_workers),
network_trainer.py:104 / tune_light_pyfer.py:36, both single-host).

The primitives here are process-count agnostic and CPU-testable: the test
suite spawns two local processes with 4 virtual CPU devices each and runs a
dp=8 sharded step (tests/test_multihost.py). On a real TPU pod, call
``initialize()`` with no arguments — the TPU runtime auto-detects the
coordinator and process ids.

Typical use (one process per host):

    from dose_prediction_tpu.parallel import multihost as MH
    MH.initialize()                              # TPU pod: auto-detected
    mesh = MH.global_mesh({"data": jax.device_count()})
    batch = MH.shard_host_batch(mesh, local_batch)   # per-host shard in
    state, loss = jitted_step(state, batch)          # GSPMD does the psum
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join this process to the multi-host runtime.

    MUST run before any other JAX call that touches devices. On TPU pods
    every argument is auto-detected (pass nothing); on CPU/GPU clusters pass
    the coordinator's ``host:port``, the world size, and this process's rank.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_sizes: Dict[str, int]) -> Mesh:
    """A Mesh over the GLOBAL device list (every process's chips).

    Axis order follows dict order; the product must equal
    ``jax.device_count()``. Keep the fastest-varying (last) axis within a
    host so tensor-parallel collectives ride ICI, and put 'data' first so
    the gradient all-reduce is the only traffic that crosses DCN.
    """
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    total = int(np.prod(sizes))
    devices = jax.devices()
    if total != len(devices):
        raise ValueError(f"mesh axes {axis_sizes} need {total} devices, the "
                         f"global runtime has {len(devices)}")
    return Mesh(np.array(devices).reshape(sizes), names)


def shard_host_batch(mesh: Mesh, local_batch: Any, *,
                     axis: str = "data") -> Any:
    """Per-process local arrays → one global jax.Array sharded over ``axis``.

    Every process passes ITS shard of the global batch (equal sizes); the
    global leading dim is ``local_dim * num_processes``. Data never leaves
    its host — the returned array is addressable only where it lives, which
    is exactly what a dp training step needs.
    """
    num = jax.process_count()

    def one(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        global_shape = (x.shape[0] * num,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, global_shape)

    return jax.tree.map(one, local_batch)


def process_slice(n_items: int) -> slice:
    """The contiguous slice of a length-``n_items`` dataset owned by this
    process (equal split; n_items must divide by process_count). Use to give
    each host its own patients before shard_host_batch."""
    num, pid = jax.process_count(), jax.process_index()
    if n_items % num:
        raise ValueError(f"{n_items} items do not split over {num} processes")
    per = n_items // num
    return slice(pid * per, (pid + 1) * per)
