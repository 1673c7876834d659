"""Device mesh + sharding policies (SPMD over ICI).

The reference's only scale-out is single-process nn.DataParallel
(NetworkTrainer/network_trainer.py:104) plus Ray trial workers
(tune_light_pyfer.py:36). The TPU-native replacement (SURVEY.md §2.9):

- a ``Mesh`` over ('data', 'model') axes;
- data parallelism = batch dim sharded over 'data' (XLA inserts the psum
  gradient all-reduce over ICI);
- tensor parallelism = ViT attention heads / MLP hidden dims sharded over
  'model' (Megatron-style column/row splits on qkv/out_proj/linear1/linear2);
- everything else replicated.

Shardings are expressed as NamedSharding trees derived from parameter paths
and handed to jax.jit via in_shardings/out_shardings — no bespoke
communication code, GSPMD inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_sizes: Dict[str, int], *, devices=None) -> Mesh:
    """Build a mesh from {'data': n_dp, 'model': n_tp}; total must equal the
    device count. Axes of size 1 are kept (harmless) so one sharding rule set
    works from 1 chip to a full slice."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = int(np.prod(list(axis_sizes.values())))
    if devices.size != total:
        raise ValueError(f"mesh wants {total} devices, have {devices.size}")
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    return Mesh(devices.reshape(shape), names)


def data_parallel_mesh(n: Optional[int] = None) -> Mesh:
    n = n if n is not None else len(jax.devices())
    return create_mesh({"data": n})


def dp_tp_mesh(n_data: int, n_model: int) -> Mesh:
    return create_mesh({"data": n_data, "model": n_model})


# ---------------------------------------------------------------------------
# sharding rules: (path regex, PartitionSpec)
# first match wins; default replicated
# ---------------------------------------------------------------------------

# Megatron-style split of the transformer:
#   qkv / linear1 : column-parallel (shard output features)
#   out_proj / linear2 : row-parallel (shard input features)
VIT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/qkv/kernel$", P(None, "model")),
    (r".*attn/out_proj/kernel$", P("model", None)),
    (r".*mlp/linear1/kernel$", P(None, "model")),
    (r".*mlp/linear1/bias$", P("model")),
    (r".*mlp/linear2/kernel$", P("model", None)),
    # wide conv kernels: shard output channels over 'model'
    (r".*(skip4|decoder4)/.*/kernel$", P(None, None, None, None, "model")),
)


def _spec_for_path(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = ()) -> Any:
    """NamedSharding tree for a param pytree from path-based rules."""

    def assign(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _spec_for_path(keys, rules)
        # drop axes that don't divide evenly (rule stays safe on any mesh)
        clean = []
        for dim, axis in enumerate(spec):
            if axis is None or axis not in mesh.shape:
                # rule names an axis this mesh doesn't have (e.g. tp rules on
                # a pure-dp mesh) — replicate that dim
                clean.append(None)
                continue
            size = mesh.shape[axis]
            if dim < leaf.ndim and leaf.shape[dim] % size == 0 and size > 1:
                clean.append(axis)
            else:
                clean.append(None)
        return NamedSharding(mesh, P(*clean) if clean else P())

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of activations over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, *, axis: str = "data") -> Any:
    sh = batch_sharding(mesh, axis=axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = VIT_TP_RULES) -> Any:
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
