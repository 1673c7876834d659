"""Model zoo: C3D cascade, DOSE-PYFER, OAR-TranSeg, HD-UNet, DoseGAN."""

from dose_prediction_tpu.models.c3d import BaseUNet, CascadeC3D
from dose_prediction_tpu.models.dose_pyfer import (
    DosePyfer,
    MainSubsetModel,
    PyMSCDecoder,
    ViTEncoder,
)
from dose_prediction_tpu.models.dosegan import (
    AttGate,
    BlockDiscriminator,
    NLayerDiscriminator,
    UnetGenerator3D,
    UnetSkipBlock,
)
from dose_prediction_tpu.models.hdunet import HDUNet
from dose_prediction_tpu.models.transeg import TranSeg
from dose_prediction_tpu.models.unetr import UNETR

__all__ = [
    "AttGate",
    "BaseUNet",
    "BlockDiscriminator",
    "CascadeC3D",
    "DosePyfer",
    "HDUNet",
    "MainSubsetModel",
    "NLayerDiscriminator",
    "PyMSCDecoder",
    "TranSeg",
    "UNETR",
    "UnetGenerator3D",
    "UnetSkipBlock",
    "ViTEncoder",
]
