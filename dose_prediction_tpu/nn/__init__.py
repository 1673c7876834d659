"""Building blocks: leaf layers, C3D blocks, multi-scale conv family,
UNETR block family, 3D ViT."""

from dose_prediction_tpu.nn.blocks import SingleConv, UpConv
from dose_prediction_tpu.nn.layers import (
    BatchNorm,
    Conv3D,
    ConvTranspose3D,
    Dense,
    InstanceNorm,
    LayerNorm,
    make_norm,
)
from dose_prediction_tpu.nn.mdunet import (
    AblationConv31,
    AblationDualDilatedBlock,
    Conv31,
    ConvBlockK,
    DualDilatedBlock,
    MultiScaleConv,
)
from dose_prediction_tpu.nn.unetr import (
    ModifiedUnetOutBlock,
    ModifiedUnetrUpBlock,
    UnetBasicBlock,
    UnetResBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
)
from dose_prediction_tpu.nn.vit import (
    Attention,
    MlpBlock,
    PatchEmbed3D,
    TransformerBlock,
    ViT3D,
    patchify,
    unpatchify_tokens,
)

__all__ = [
    "AblationConv31",
    "Attention",
    "BatchNorm",
    "Conv31",
    "Conv3D",
    "ConvBlockK",
    "ConvTranspose3D",
    "Dense",
    "DualDilatedBlock",
    "InstanceNorm",
    "LayerNorm",
    "MlpBlock",
    "ModifiedUnetOutBlock",
    "ModifiedUnetrUpBlock",
    "MultiScaleConv",
    "PatchEmbed3D",
    "SingleConv",
    "TransformerBlock",
    "UnetBasicBlock",
    "UnetResBlock",
    "UnetrBasicBlock",
    "UnetrPrUpBlock",
    "UnetrUpBlock",
    "UpConv",
    "ViT3D",
    "make_norm",
    "patchify",
    "unpatchify_tokens",
]
