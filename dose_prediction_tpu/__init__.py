"""dose_prediction_tpu — a TPU-native JAX/XLA/Pallas framework for automated
radiotherapy dose prediction.

Built from scratch with the capabilities of the GhTara/Dose_Prediction reference
(cascade transformer pipeline for 3D dose distribution prediction, PMB 2024):

- ``ops``        : TPU-first 3D primitives (conv3d NDHWC, transposed conv, norms,
                   torch-semantics trilinear/nearest resize as axis matmuls, pooling).
- ``kernels``    : Pallas TPU kernels for hot fused paths.
- ``nn``         : building blocks (multi-scale convs, UNETR block family, 3D ViT).
- ``models``     : C3D cascade U-Net, DOSE-PYFER, OAR-TranSeg, HD-UNet, DoseGAN.
- ``data``       : pure-numpy NIfTI IO + OpenKBP pipeline feeding HBM.
- ``train``      : jit-compiled train steps, losses, schedulers, trainers,
                   checkpoint/weight-surgery utilities.
- ``infer``      : on-device sliding-window engine + linked seg→dose cascade.
- ``evaluation`` : dose score, DVH metrics, IVS, Dice, HD95, DVH plots.
- ``parallel``   : mesh construction + sharding policies (dp/tp) over ICI.

Layout convention: volumes are channels-last ``(N, D, H, W, C)`` so the channel
axis maps to TPU lanes; weights are ``(kd, kh, kw, Cin, Cout)``.
"""

__version__ = "0.1.0"
