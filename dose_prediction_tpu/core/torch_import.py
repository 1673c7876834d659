"""Torch-checkpoint → flax import (cross-framework weight surgery).

The reference ecosystem ships pretrained torch pickles — C3D cascades consumed
by create_pretrained_unet (dose_pyfer.py:363-407, c3d.py:172-204: a
NetworkTrainer pickle whose 'network_state_dict' is filtered to net_A /
conv_out_A keys and loaded strict=False) and MedicalNet ResNets
(models_experiments.py:1555-1588). This module converts those state dicts to
this framework's flax param trees so the pretrained-weights workflow survives
the framework switch:

- tensor layout conversion: Conv3d (O,I,kD,kH,kW) → (kD,kH,kW,I,O); Linear
  (O,I) → (I,O); norm weight→scale; 1-D tensors pass through;
- key mapping: a reference-specific translation from torch dotted keys to
  flax path tuples (C3D provided; new models add a map function);
- merge via core.checkpoint.merge_partial → the same strict=False,
  shape-checked semantics (missing/inside/unused accounting) the reference
  prints.

torch is only needed to *read* a pickle (load_torch_checkpoint); everything
else operates on numpy arrays, so converted trees can be saved with orbax and
reloaded without torch.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from dose_prediction_tpu.core.checkpoint import merge_partial

KeyMap = Callable[[str], Optional[Tuple[str, ...]]]


def convert_tensor(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Convert one torch tensor to the flax layout. Returns the flax LEAF name
    ('kernel'/'scale'/'bias'/...) and the converted array. ``name`` is the
    torch key (used to tell conv 'weight' from norm 'weight' by rank)."""
    value = np.asarray(value)
    leaf = name.rsplit(".", 1)[-1]
    if leaf == "weight":
        if value.ndim == 5:            # Conv3d (O,I,kD,kH,kW) → (kD,kH,kW,I,O)
            return "kernel", np.ascontiguousarray(value.transpose(2, 3, 4, 1, 0))
        if value.ndim == 4:            # Conv2d (O,I,kH,kW) → (kH,kW,I,O)
            return "kernel", np.ascontiguousarray(value.transpose(2, 3, 1, 0))
        if value.ndim == 2:            # Linear (O,I) → (I,O)
            return "kernel", np.ascontiguousarray(value.T)
        return "scale", value          # norm affine weight
    if leaf == "bias":
        return "bias", value
    if leaf == "running_mean":
        return "mean", value
    if leaf == "running_var":
        return "var", value
    return leaf, value


def state_dict_to_tree(sd: Dict[str, Any], key_map: KeyMap) -> Dict:
    """Build a nested flax-style dict from a torch state dict. ``key_map``
    translates a torch dotted key (WITHOUT its trailing .weight/.bias leaf)
    to a flax path tuple, or None to drop the entry."""
    nested: Dict = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        module_key = key.rsplit(".", 1)[0] if "." in key else ""
        path = key_map(module_key)
        if path is None:
            continue
        leaf_name, arr = convert_tensor(key, np.asarray(value))
        node = nested
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = arr
    return nested


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch pickle and return a flat {key: numpy} state dict. Handles
    the NetworkTrainer format ({'network_state_dict': ...},
    network_trainer.py:349-356), Lightning ({'state_dict': ...}) and bare
    state dicts; strips DataParallel 'module.' prefixes (:341-344)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("network_state_dict", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# C3D cascade key map (c3d.py module names → models/c3d.py flax names)
# ---------------------------------------------------------------------------

_C3D_PATTERNS = [
    # net_X.encoder.encoder_L.S.single_conv.0 → net_X/encoder/encoder_L_conv{S+1}/conv
    (re.compile(r"^(net_[AB])\.encoder\.encoder_(\d)\.(\d)\.single_conv\.0$"),
     lambda m: (m[1], "encoder", f"encoder_{m[2]}_conv{int(m[3]) + 1}", "conv")),
    (re.compile(r"^(net_[AB])\.encoder\.encoder_(\d)\.(\d)\.single_conv\.1$"),
     lambda m: (m[1], "encoder", f"encoder_{m[2]}_conv{int(m[3]) + 1}", "norm")),
    # net_X.decoder.decoder_conv_L.S.single_conv.0 → net_X/decoder/decoder_L_conv{S+1}/conv
    (re.compile(r"^(net_[AB])\.decoder\.decoder_conv_(\d)\.(\d)\.single_conv\.0$"),
     lambda m: (m[1], "decoder", f"decoder_{m[2]}_conv{int(m[3]) + 1}", "conv")),
    (re.compile(r"^(net_[AB])\.decoder\.decoder_conv_(\d)\.(\d)\.single_conv\.1$"),
     lambda m: (m[1], "decoder", f"decoder_{m[2]}_conv{int(m[3]) + 1}", "norm")),
    # net_X.decoder.upconv_L.conv.0/.1 → net_X/decoder/upconv_L/conv/{conv,norm}
    (re.compile(r"^(net_[AB])\.decoder\.upconv_(\d)\.conv\.0$"),
     lambda m: (m[1], "decoder", f"upconv_{m[2]}", "conv", "conv")),
    (re.compile(r"^(net_[AB])\.decoder\.upconv_(\d)\.conv\.1$"),
     lambda m: (m[1], "decoder", f"upconv_{m[2]}", "conv", "norm")),
    # cascade output heads
    (re.compile(r"^(conv_out_[AB])$"), lambda m: (m[1],)),
]


def c3d_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for the C3D cascade. Also accepts
    bare 'encoder./decoder.' keys (a single BaseUNet checkpoint) by treating
    them as net_A."""
    key = module_key
    if key.startswith(("encoder.", "decoder.")):
        key = "net_A." + key
    for pattern, build in _C3D_PATTERNS:
        m = pattern.match(key)
        if m:
            return build(m)
    return None


def import_c3d_cascade(sd_or_path, target_params: Any, *,
                       verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """create_pretrained_unet for torch sources: convert a torch C3D cascade
    state dict (or pickle path) and merge it into ``target_params`` with the
    reference's strict=False shape-checked semantics (c3d.py:172-204,
    dose_pyfer.py:363-407). Returns (params, surgery stats)."""
    sd = load_torch_checkpoint(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    tree = state_dict_to_tree(sd, c3d_key_map)
    return merge_partial(target_params, tree, verbose=verbose)
