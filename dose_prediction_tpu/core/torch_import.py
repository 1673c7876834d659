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


def convert_tensor(name: str, value: np.ndarray, *,
                   transposed: bool = False) -> Tuple[str, np.ndarray]:
    """Convert one torch tensor to the flax layout. Returns the flax LEAF name
    ('kernel'/'scale'/'bias'/...) and the converted array. ``name`` is the
    torch key (used to tell conv 'weight' from norm 'weight' by rank).
    ``transposed`` marks a ConvTranspose3d weight, whose torch layout is
    (I,O,kD,kH,kW) — ops.conv_transpose3d keeps the conv3d (k..,I,O) IO order
    and flips internally, so the channel axes swap differently."""
    value = np.asarray(value)
    leaf = name.rsplit(".", 1)[-1]
    if leaf == "weight":
        if value.ndim == 5:
            if transposed:             # ConvTranspose3d (I,O,k..) → (k..,I,O)
                return "kernel", np.ascontiguousarray(value.transpose(2, 3, 4, 0, 1))
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
    if leaf == "position_embeddings":  # monai ViT pos-embed param → ours
        return "pos_embedding", value
    return leaf, value


def state_dict_to_tree(sd: Dict[str, Any], key_map: KeyMap, *,
                       transposed: Optional[Callable[[str], bool]] = None) -> Dict:
    """Build a nested flax-style dict from a torch state dict. ``key_map``
    translates a torch dotted key (WITHOUT its trailing .weight/.bias leaf)
    to a flax path tuple, or None to drop the entry. ``transposed(module_key)``
    marks modules whose 5-D weights are ConvTranspose3d layouts."""
    nested: Dict = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        module_key = key.rsplit(".", 1)[0] if "." in key else ""
        path = key_map(module_key)
        if path is None:
            continue
        leaf_name, arr = convert_tensor(
            key, np.asarray(value),
            transposed=bool(transposed and transposed(module_key)))
        node = nested
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = arr
    return nested


def split_batch_stats(tree: Dict) -> Tuple[Dict, Dict]:
    """Split a converted tree into (params, batch_stats): BatchNorm running
    'mean'/'var' leaves move to the stats tree (flax keeps them in a separate
    collection), everything else stays in params."""
    params: Dict = {}
    stats: Dict = {}

    def walk(src, ppath):
        for k, v in src.items():
            if isinstance(v, dict):
                walk(v, ppath + (k,))
            else:
                dst = stats if k in ("mean", "var") else params
                node = dst
                for p in ppath:
                    node = node.setdefault(p, {})
                node[k] = v

    walk(tree, ())
    return params, stats


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


# ---------------------------------------------------------------------------
# DOSE-PYFER key map (dose_pyfer.py Model :325 module names → models/dose_pyfer
# flax names). net_A / conv_out_A reuse the C3D patterns; net_B covers the
# monai-0.7 ViT (patch_embedding/blocks.N/norm), the UnetrBasicBlock skip1 /
# UnetrPrUpBlock skip2-4 pyramid (dose_pyfer.py:69-113), the
# ModifiedUnetrUpBlock decoders with seg-family conv_3_1 internals
# (base_blocks.py:91-141, blocks_MDUNet.py:132-157), and the per-scale 1×1
# dose convertors (:297-305). The defined-but-unused `out` head (:306) drops.
# ---------------------------------------------------------------------------

def _res_block_path(prefix: Tuple[str, ...], tail: str) -> Optional[Tuple[str, ...]]:
    """conv{1,2,3}.conv / norm{1,2,3} of a monai UnetResBlock → our
    nn/unetr.py UnetResBlock names (convs named; norms flax-auto-numbered)."""
    m = re.match(r"^conv(\d)\.conv$", tail)
    if m:
        return prefix + (f"conv{m[1]}",)
    m = re.match(r"^norm(\d)$", tail)
    if m:
        return prefix + (f"InstanceNorm_{int(m[1]) - 1}",)
    return None


_PYFER_NETB_PATTERNS = [
    # --- ViT (monai PatchEmbeddingBlock perceptron + pre-norm blocks) ---
    (re.compile(r"^encoder\.vit\.patch_embedding\.patch_embeddings\.1$"),
     lambda m: ("encoder", "vit", "patch_embedding", "proj")),
    (re.compile(r"^encoder\.vit\.patch_embedding$"),   # position_embeddings param
     lambda m: ("encoder", "vit", "patch_embedding")),
    (re.compile(r"^encoder\.vit\.blocks\.(\d+)\.(norm1|norm2)$"),
     lambda m: ("encoder", "vit", f"block{m[1]}", m[2])),
    (re.compile(r"^encoder\.vit\.blocks\.(\d+)\.attn\.(qkv|out_proj)$"),
     lambda m: ("encoder", "vit", f"block{m[1]}", "attn", m[2])),
    (re.compile(r"^encoder\.vit\.blocks\.(\d+)\.mlp\.(linear1|linear2)$"),
     lambda m: ("encoder", "vit", f"block{m[1]}", "mlp", m[2])),
    (re.compile(r"^encoder\.vit\.norm$"), lambda m: ("encoder", "vit", "norm")),
    # --- skip1 (UnetrBasicBlock → UnetResBlock 'layer') ---
    (re.compile(r"^encoder\.skip1\.layer\.(.+)$"),
     lambda m: _res_block_path(("encoder", "skip1", "layer"), m[1])),
    # --- skip2-4 (UnetrPrUpBlock) ---
    (re.compile(r"^encoder\.(skip[234])\.transp_conv_init\.conv$"),
     lambda m: ("encoder", m[1], "transp_conv_init")),
    (re.compile(r"^encoder\.(skip[234])\.blocks\.(\d+)\.0\.conv$"),
     lambda m: ("encoder", m[1], f"up{m[2]}")),
    (re.compile(r"^encoder\.(skip[234])\.blocks\.(\d+)\.1\.(.+)$"),
     lambda m: _res_block_path(("encoder", m[1], f"block{m[2]}"), m[3])),
    # --- PyMSCDecoder stages (ModifiedUnetrUpBlock, multiS_conv=True) ---
    (re.compile(r"^decoder\.(decoder[1-4])\.transp_conv\.conv$"),
     lambda m: ("decoder", m[1], "transp_conv")),
    # conv_3_1: conv_3 = Sequential(conv_block_3, IN, act) — inner convs at
    # .0.conv.{0,3}; conv_7 analogous with BatchNorm3d at .0.conv.{1,4}
    (re.compile(r"^decoder\.(decoder[1-4])\.conv_block\.cov_\.conv_3\.0\.conv\.(0|3)$"),
     lambda m: ("decoder", m[1], "conv_block", "branch3",
                "conv0" if m[2] == "0" else "conv1")),
    (re.compile(r"^decoder\.(decoder[1-4])\.conv_block\.cov_\.conv_7\.0\.conv\.(0|3)$"),
     lambda m: ("decoder", m[1], "conv_block", "branch7",
                "conv0" if m[2] == "0" else "conv1")),
    (re.compile(r"^decoder\.(decoder[1-4])\.conv_block\.cov_\.conv_7\.0\.conv\.(1|4)$"),
     lambda m: ("decoder", m[1], "conv_block", "branch7",
                "norm0" if m[2] == "1" else "norm1")),
    (re.compile(r"^decoder\.(decoder[1-4])\.conv_block\.cov_\.conv\.0$"),
     lambda m: ("decoder", m[1], "conv_block", "fuse")),
    # --- deep-supervision heads ---
    (re.compile(r"^dose_convertors\.(\d)\.0$"),
     lambda m: (f"dose_convertor{m[1]}",)),
    # MainSubsetModel.out is constructed but never used in forward (:306,322)
    (re.compile(r"^out\.0$"), lambda m: None),
]


def pyfer_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for the full DOSE-PYFER cascade.
    Lightning-module 'model_.' prefixes (Pyfer holds its net as self.model_,
    train_light_pyfer.py:73) are stripped."""
    if module_key.startswith("model_."):
        module_key = module_key[len("model_."):]
    if module_key.startswith(("net_A.", "conv_out")) or module_key in (
            "conv_out_A", "conv_out_B"):
        return c3d_key_map(module_key)
    if not module_key.startswith("net_B."):
        return None
    key = module_key[len("net_B."):]
    for pattern, build in _PYFER_NETB_PATTERNS:
        m = pattern.match(key)
        if m:
            path = build(m)
            return None if path is None else ("net_B",) + path
    return None


_VITGEN_DUAL_PATTERNS = [
    # DualDilatedBlock decoders (multiS_conv=False — the ViT-GAN generator
    # config, train_light_gan.py:124-133): bare IN branches at
    # cov_.conv_{3,5,7}.conv.{0,3} (blocks_MDUNet.py:194-215; inner
    # InstanceNorms carry no params)
    (re.compile(r"^decoder\.(decoder[1-4])\.conv_block\.cov_\.conv_(3|5|7)\.conv\.(0|3)$"),
     lambda m: ("decoder", m[1], "conv_block", f"branch{m[2]}",
                "conv0" if m[3] == "0" else "conv1")),
]


def vitgen_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for the STANDALONE non-cascade ViT
    generator (MainSubsetModel, dose_pyfer.py:245-329 / VitGenerator,
    models_experiments.py:769-838 — identical module skeleton): the net_B
    subtree of DOSE-PYFER without the net_B prefix. Accepts bare state dicts
    and the Lightning prefixes 'model_.' (exp TestModel,
    train_light_exp_models.py:118) and 'generator.' (the GAN module,
    train_light_gan.py:124). Covers both decoder flavors: conv_3_1
    (multiS_conv=True, exp) and DualDilatedBlock (multiS_conv=False, vitgan)."""
    key = module_key
    for pre in ("model_.", "generator."):
        if key.startswith(pre):
            key = key[len(pre):]
            break
    for pattern, build in _VITGEN_DUAL_PATTERNS + _PYFER_NETB_PATTERNS:
        m = pattern.match(key)
        if m:
            return build(m)
    return None


def import_vitgen(sd_or_path, target_variables: Any, *,
                  verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import a torch ViT-generator checkpoint (exp TestModel / ViT-GAN
    generator, bare or Lightning-wrapped) into this framework's
    models.experiments.VitGenerator variables."""
    return _import_with_stats(sd_or_path, vitgen_key_map, target_variables,
                              transposed=pyfer_transposed_key, verbose=verbose)


def pyfer_transposed_key(module_key: str) -> bool:
    """Modules holding ConvTranspose3d weights in the DOSE-PYFER tree: the
    UnetrPrUpBlock init/up chain and the decoder transp convs."""
    return bool(re.search(r"(transp_conv|transp_conv_init)\.conv$", module_key)
                or re.search(r"\.blocks\.\d+\.0\.conv$", module_key))


# ---------------------------------------------------------------------------
# OAR-TranSeg key map (oar_transeg.py Model :14-185 / OldModels TRANSEG module
# names → models/transeg.py flax names). Both reference variants share the
# module skeleton — vit / encoder1-4 / decoder5-2 / out — and differ only in
# which blocks_MDUNet copy the decoders import (train_light_transeg.py:93-124):
# Models/ (seg flavor: Sequential-wrapped conv_3_1 branches, IN inner norms
# without params, fuse at `conv.0`) vs OldModels/ (BatchNorm conv blocks,
# bare branches `conv_3.conv.*`, bare fuse `conv`). The patterns below accept
# both spellings; BatchNorm running stats land in batch_stats. The
# DualDilatedBlock (multiS_conv=False) branch keys `conv_{3,5,7}.conv.*` are
# covered by the same optional-`.0` patterns.
# ---------------------------------------------------------------------------

# shared between TranSeg and the plain MONAI UNETR: the ViT trunk and the
# UnetrBasicBlock/UnetrPrUpBlock skip encoders (identical module names)
_SEG_COMMON_PATTERNS = [
    # --- ViT (monai PatchEmbeddingBlock perceptron + pre-norm blocks) ---
    (re.compile(r"^vit\.patch_embedding\.patch_embeddings\.1$"),
     lambda m: ("vit", "patch_embedding", "proj")),
    (re.compile(r"^vit\.patch_embedding$"),   # position_embeddings param
     lambda m: ("vit", "patch_embedding")),
    (re.compile(r"^vit\.blocks\.(\d+)\.(norm1|norm2)$"),
     lambda m: ("vit", f"block{m[1]}", m[2])),
    (re.compile(r"^vit\.blocks\.(\d+)\.attn\.(qkv|out_proj)$"),
     lambda m: ("vit", f"block{m[1]}", "attn", m[2])),
    (re.compile(r"^vit\.blocks\.(\d+)\.mlp\.(linear1|linear2)$"),
     lambda m: ("vit", f"block{m[1]}", "mlp", m[2])),
    (re.compile(r"^vit\.norm$"), lambda m: ("vit", "norm")),
    # --- encoder1 (UnetrBasicBlock → UnetResBlock 'layer') ---
    (re.compile(r"^encoder1\.layer\.(.+)$"),
     lambda m: _res_block_path(("encoder1", "layer"), m[1])),
    # --- encoder2-4 (UnetrPrUpBlock) ---
    (re.compile(r"^(encoder[234])\.transp_conv_init\.conv$"),
     lambda m: (m[1], "transp_conv_init")),
    (re.compile(r"^(encoder[234])\.blocks\.(\d+)\.0\.conv$"),
     lambda m: (m[1], f"up{m[2]}")),
    (re.compile(r"^(encoder[234])\.blocks\.(\d+)\.1\.(.+)$"),
     lambda m: _res_block_path((m[1], f"block{m[2]}"), m[3])),
]

_TRANSEG_PATTERNS = _SEG_COMMON_PATTERNS + [
    # --- decoder5-2 (ModifiedUnetrUpBlock) ---
    (re.compile(r"^(decoder[2-5])\.transp_conv\.conv$"),
     lambda m: (m[1], "transp_conv")),
    # branch convs: seg conv_3_1 wraps branches in Sequential ('.0.'), the
    # OldModels copy and DualDilatedBlock branches are bare — both accepted
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_3(?:\.0)?\.conv\.(0|3)$"),
     lambda m: (m[1], "conv_block", "branch3",
                "conv0" if m[2] == "0" else "conv1")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_3(?:\.0)?\.conv\.(1|4)$"),
     lambda m: (m[1], "conv_block", "branch3",
                "norm0" if m[2] == "1" else "norm1")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_5\.conv\.(0|3)$"),
     lambda m: (m[1], "conv_block", "branch5",
                "conv0" if m[2] == "0" else "conv1")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_5\.conv\.(1|4)$"),
     lambda m: (m[1], "conv_block", "branch5",
                "norm0" if m[2] == "1" else "norm1")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_7(?:\.0)?\.conv\.(0|3)$"),
     lambda m: (m[1], "conv_block", "branch7",
                "conv0" if m[2] == "0" else "conv1")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv_7(?:\.0)?\.conv\.(1|4)$"),
     lambda m: (m[1], "conv_block", "branch7",
                "norm0" if m[2] == "1" else "norm1")),
    # 1×1 fuse: Sequential '.0' in Models/, bare in OldModels
    (re.compile(r"^(decoder[2-5])\.conv_block\.cov_\.conv(?:\.0)?$"),
     lambda m: (m[1], "conv_block", "fuse")),
    # --- 1×1 out head (ModifiedUnetOutBlock: monai Convolution 'conv') ---
    (re.compile(r"^out\.conv\.conv$"), lambda m: ("out", "conv")),
]


def transeg_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for OAR-TranSeg (both the Models/
    'seg' flavor and the OldModels TRANSEG 'old' flavor). Lightning-module
    '_model.' prefixes (train_light_transeg.py:126-146 surgery) are stripped."""
    key = module_key
    if key.startswith("_model."):
        key = key[len("_model."):]
    for pattern, build in _TRANSEG_PATTERNS:
        m = pattern.match(key)
        if m:
            return build(m)
    return None


_UNETR_PATTERNS = _SEG_COMMON_PATTERNS + [
    # --- decoder5-2 (plain UnetrUpBlock, res_block=True:
    #     transp conv + UnetResBlock 'conv_block') ---
    (re.compile(r"^(decoder[2-5])\.transp_conv\.conv$"),
     lambda m: (m[1], "transp_conv")),
    (re.compile(r"^(decoder[2-5])\.conv_block\.(.+)$"),
     lambda m: _res_block_path((m[1], "conv_block"), m[2])),
    # --- 1×1 out head (monai UnetOutBlock: Convolution 'conv') ---
    (re.compile(r"^out\.conv\.conv$"), lambda m: ("out",)),
]


def unetr_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for the plain MONAI UNETR
    (train_light_transeg.py:93-107, mode_model=0). Lightning '_model.'
    prefixes are stripped."""
    key = module_key
    if key.startswith("_model."):
        key = key[len("_model."):]
    for pattern, build in _UNETR_PATTERNS:
        m = pattern.match(key)
        if m:
            return build(m)
    return None


def import_unetr(sd_or_path, target_variables: Any, *,
                 verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import a torch MONAI-UNETR checkpoint (bare or Lightning-wrapped) into
    this framework's models.unetr.UNETR variables."""
    return _import_with_stats(sd_or_path, unetr_key_map, target_variables,
                              transposed=pyfer_transposed_key, verbose=verbose)


def import_transeg(sd_or_path, target_variables: Any, *,
                   verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import a torch OAR-TranSeg checkpoint (reference Model / OldModels
    TRANSEG state dict, bare or Lightning-wrapped) into this framework's
    TranSeg variables. Returns ({'params', 'batch_stats'}, merge stats).
    BatchNorm running stats (k7 branches in the 'seg' family; every conv
    block in the 'old' family) land in batch_stats."""
    return _import_with_stats(sd_or_path, transeg_key_map, target_variables,
                              transposed=pyfer_transposed_key, verbose=verbose)


# ---------------------------------------------------------------------------
# MedicalNet / MONAI ResNet key map (the GAN discriminator backbone:
# create_pretrained_medical_resnet, models_experiments.py:1555-1588, loads a
# MedicalNet resnet_10 pth into a MONAI ResNet by shared key names — conv1 /
# bn1 / layer{1-4}.{i}.{conv,bn}{1,2} / downsample.{0,1} / fc). Maps onto
# models/experiments.py ResNet3D (stem/stage{S}_block{i}/fc). MedicalNet
# pickles carry no fc (segmentation pretrain) — those leaves stay at init,
# matching the reference's strict=False load.
# ---------------------------------------------------------------------------

_RESNET_PATTERNS = [
    (re.compile(r"^conv1$"), lambda m: ("stem",)),
    (re.compile(r"^bn1$"), lambda m: ("stem_bn",)),
    (re.compile(r"^layer(\d)\.(\d+)\.(conv1|conv2|bn1|bn2)$"),
     lambda m: (f"stage{int(m[1]) - 1}_block{m[2]}", m[3])),
    (re.compile(r"^layer(\d)\.(\d+)\.downsample\.0$"),
     lambda m: (f"stage{int(m[1]) - 1}_block{m[2]}", "downsample")),
    (re.compile(r"^layer(\d)\.(\d+)\.downsample\.1$"),
     lambda m: (f"stage{int(m[1]) - 1}_block{m[2]}", "bn_down")),
    (re.compile(r"^fc$"), lambda m: ("fc",)),
]


def resnet10_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for MedicalNet/MONAI 3D ResNets
    ('module.' DataParallel prefixes are stripped by load_torch_checkpoint)."""
    for pattern, build in _RESNET_PATTERNS:
        m = pattern.match(module_key)
        if m:
            return build(m)
    return None


def import_resnet10(sd_or_path, target_variables: Any, *,
                    verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import MedicalNet/MONAI ResNet weights into models.experiments.ResNet3D
    variables (the VitGAN critic's pretrained-discriminator path,
    train_light_gan.py:124-138). BatchNorm running stats land in batch_stats."""
    return _import_with_stats(sd_or_path, resnet10_key_map, target_variables,
                              verbose=verbose)


# ---------------------------------------------------------------------------
# HD-UNet key map (hdunet.py module names → models/hdunet.py flax names).
# Accepts bare HD_UNet state dicts, Model wrappers ('model.'), and Lightning
# checkpoints ('model_.model.', train_light_hdunet.py:68).
# ---------------------------------------------------------------------------

_HDUNET_PATTERNS = [
    # encoder_1 has two DenseConvolves; encoder_L (L≥2) leads with a
    # DenseDownsample then DenseConvolves (hdunet.py:66-94); every one wraps
    # one conv+IN pair named single_conv.{0,1}
    (re.compile(r"^encoder\.encoder_1\.(\d)\.single_conv\.([01])$"),
     lambda m: (f"enc1_c{int(m[1]) + 1}", "conv",
                "conv" if m[2] == "0" else "norm")),
    (re.compile(r"^encoder\.encoder_([2-5])\.(\d)\.single_conv\.([01])$"),
     lambda m: ((f"enc{m[1]}_down" if m[2] == "0" else f"enc{m[1]}_c{m[2]}"),
                "conv", "conv" if m[3] == "0" else "norm")),
    (re.compile(r"^decoder\.upconv_(\d)\.conv\.([01])$"),
     lambda m: (f"upconv_{m[1]}", "conv", "conv" if m[2] == "0" else "norm")),
    (re.compile(r"^decoder\.decoder_conv_(\d)\.(\d)\.single_conv\.([01])$"),
     lambda m: (f"dec{m[1]}_c{int(m[2]) + 1}",
                "conv" if m[3] == "0" else "norm")),
    (re.compile(r"^decoder\.final_conv$"), lambda m: ("final_conv",)),
]


def hdunet_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for HD-UNet (hdunet.py:66-152)."""
    key = module_key
    if key.startswith("model_."):
        key = key[len("model_."):]
    if key.startswith("model."):
        key = key[len("model."):]
    for pattern, build in _HDUNET_PATTERNS:
        m = pattern.match(key)
        if m:
            return build(m)
    return None


def import_hdunet(sd_or_path, target_variables: Any, *,
                  verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import a torch HD-UNet checkpoint into models.hdunet.HDUNet variables.
    Pure InstanceNorm model → params only, no batch_stats."""
    sd = load_torch_checkpoint(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    tree = state_dict_to_tree(sd, hdunet_key_map)
    params, stats = merge_partial(target_variables["params"], tree, verbose=verbose)
    return {"params": params}, stats


# ---------------------------------------------------------------------------
# DoseGAN key maps (dosegan.py → models/dosegan.py). The torch generator is a
# recursively-nested anonymous Sequential: each UnetSkipConnectionBlock3d's
# params live at model(.model.3)^depth.model.{idx} with idx 1=downconv,
# 2=downnorm, 5=upconv, 6=upnorm (innermost levels have no downnorm/submodule,
# so their sequential is shorter: 3=upconv, 4=upnorm — dosegan.py:135-149);
# idx 3 only terminates a parameter key at the innermost level, so the index
# alone is unambiguous. att_gate.{initial_conv,intermediate.{1,2}} hangs off
# each level (:150). netG./netD./generator./discriminator. prefixes from a
# combined Lightning GAN checkpoint are honored for routing.
# ---------------------------------------------------------------------------

_G_SKIP_LEAF = {1: "downconv", 2: "downnorm", 3: "upconv", 4: "upnorm",
                5: "upconv", 6: "upnorm"}
_G_KEY_RE = re.compile(
    r"^model((?:\.model\.3)*)"
    r"(\.att_gate\.(?:initial_conv|intermediate\.[12])|\.model\.[1-6])$")
_ATT_LEAF = {"initial_conv": "initial_conv", "1": "inter_conv", "2": "inter_norm"}


def dosegan_g_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for the DoseGAN generator
    (UnetGenerator3d, dosegan.py:50-85)."""
    key = module_key
    for pre in ("netG.", "generator."):
        if key.startswith(pre):
            key = key[len(pre):]
    if key == "initial_block.0":
        return ("initial_conv",)
    if key == "initial_block.1":
        return ("initial_norm",)
    if key == "outer_block.0":
        return ("outer_conv",)
    if module_key != key or not module_key.startswith(("netD.", "discriminator.")):
        m = _G_KEY_RE.match(key)
        if m:
            base = ("unet",) + ("submodule",) * m[1].count(".model.3")
            tail = m[2]
            if tail.startswith(".att_gate"):
                return base + ("att_gate", _ATT_LEAF[tail.rsplit(".", 1)[-1]])
            return base + (_G_SKIP_LEAF[int(tail.rsplit(".", 1)[-1])],)
    return None


def dosegan_g_transposed_key(module_key: str) -> bool:
    """ConvTranspose3d marker: every generator upconv (dosegan.py:133-143)."""
    path = dosegan_g_key_map(module_key)
    return path is not None and path[-1] == "upconv"


_D_BARE = {0: ("initial_conv",), 1: ("initial_norm",),
           6: ("final_conv",), 7: ("final_norm",)}
_D_BLOCK_RE = re.compile(
    r"^model\.([3-5])\.(downsample\.[01]|pooling\.[01]"
    r"|att_gate\.(?:initial_conv|intermediate\.[12]))$")
_D_BLOCK_LEAF = {"downsample.0": ("down_conv",), "downsample.1": ("down_norm",),
                 "pooling.0": ("pool_conv",), "pooling.1": ("pool_norm",)}


def dosegan_d_key_map(module_key: str) -> Optional[Tuple[str, ...]]:
    """Torch dotted module key → flax path for NLayerDiscriminator
    (dosegan.py:177-215, reference n_layers=3: blocks at sequence slots 3-5,
    final conv/norm at 6/7)."""
    key = module_key
    for pre in ("netD.", "discriminator."):
        if key.startswith(pre):
            key = key[len(pre):]
    if module_key == key and module_key.startswith(("netG.", "generator.")):
        return None
    m = re.match(r"^model\.([0-7])$", key)
    if m and int(m[1]) in _D_BARE:
        return _D_BARE[int(m[1])]
    m = _D_BLOCK_RE.match(key)
    if m:
        block = (f"block{int(m[1]) - 3}",)
        sub = m[2]
        if sub.startswith("att_gate"):
            return block + ("att_gate", _ATT_LEAF[sub.rsplit(".", 1)[-1]])
        return block + _D_BLOCK_LEAF[sub]
    return None


def _import_with_stats(sd_or_path, key_map: KeyMap, target_variables: Any, *,
                       transposed=None, verbose: bool = True):
    """Shared import body: key-map, split params/batch_stats, merge both.
    The returned stats AGGREGATE the params and batch_stats merges, so a
    strict caller also sees uncovered/shape-skipped running stats."""
    sd = load_torch_checkpoint(sd_or_path) if isinstance(sd_or_path, str) else sd_or_path
    tree = state_dict_to_tree(sd, key_map, transposed=transposed)
    p_tree, s_tree = split_batch_stats(tree)
    params, stats = merge_partial(target_variables["params"], p_tree, verbose=verbose)
    bstats = target_variables.get("batch_stats", {})
    if bstats or s_tree:
        bstats, b_stats = merge_partial(bstats, s_tree, verbose=verbose)
        stats = {k: stats[k] + b_stats[k] for k in stats}
    return {"params": params, "batch_stats": bstats}, stats


def import_dosegan_g(sd_or_path, target_variables: Any, *,
                     verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import the DoseGAN generator (UnetGenerator3d) — from a bare generator
    state dict or a combined GAN checkpoint with netG./generator. prefixes.
    BatchNorm running stats land in batch_stats."""
    return _import_with_stats(sd_or_path, dosegan_g_key_map, target_variables,
                              transposed=dosegan_g_transposed_key, verbose=verbose)


def import_dosegan_d(sd_or_path, target_variables: Any, *,
                     verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import the DoseGAN discriminator (NLayerDiscriminator) — from a bare
    state dict or a combined GAN checkpoint with netD./discriminator.
    prefixes."""
    return _import_with_stats(sd_or_path, dosegan_d_key_map, target_variables,
                              verbose=verbose)


def import_pyfer(sd_or_path, target_variables: Any, *,
                 verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """Import a torch DOSE-PYFER checkpoint (reference Model state dict) into
    this framework's DosePyfer variables. Returns ({'params', 'batch_stats'},
    merge stats for the params tree). BatchNorm running stats (the seg-family
    conv_3_1 k7 branches) land in batch_stats."""
    return _import_with_stats(sd_or_path, pyfer_key_map, target_variables,
                              transposed=pyfer_transposed_key, verbose=verbose)
