"""Host-side augmentation transforms with reference-parity semantics.

Parity targets (dataloader_OpenKBP_monai.py:189-241 and the legacy numpy chain
DosePrediction/DataAugmentation/augmentation_OpenKBP_C3D.py):
- RandShiftIntensityd(CT, offsets=0.10, prob=0.50): uniform offset in
  [-0.1, 0.1] added to the CT channel;
- RandFlipd per spatial axis, prob=0.10 each;
- RandRotate90d(prob=0.10, max_k=3) in the (H, W)-analog plane;
- RandCropByPosNegLabeld(spatial_size, pos=2, neg=1, num_samples): crop
  centers sampled from label>0 voxels with probability pos/(pos+neg), else
  from background.

All transforms act on channels-last (D, H, W, C) numpy arrays and use an
explicit np.random.Generator (keyed randomness discipline; the reference's
global `random` state is deliberately not reproduced).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Arrays = Dict[str, np.ndarray]


def rand_shift_intensity(x: np.ndarray, rng: np.random.Generator,
                         *, offsets: float = 0.10, prob: float = 0.50) -> np.ndarray:
    if rng.random() < prob:
        x = x + np.float32(rng.uniform(-offsets, offsets))
    return x


def rand_flip(arrays: Arrays, rng: np.random.Generator,
              *, prob: float = 0.10) -> Arrays:
    """Independent flips over the three spatial axes, applied consistently to
    every array in the dict."""
    for axis in range(3):
        if rng.random() < prob:
            arrays = {k: np.flip(v, axis=axis) for k, v in arrays.items()}
    return arrays


def rand_rotate90(arrays: Arrays, rng: np.random.Generator,
                  *, prob: float = 0.10, max_k: int = 3,
                  axes: Tuple[int, int] = (0, 1)) -> Arrays:
    if rng.random() < prob:
        k = int(rng.integers(1, max_k + 1))
        arrays = {key: np.rot90(v, k=k, axes=axes) for key, v in arrays.items()}
    return arrays


def _sample_crop_start(label: np.ndarray, rng: np.random.Generator,
                       spatial_size: Sequence[int], *, pos: float, neg: float) -> Tuple[int, int, int]:
    """Pick a crop start: sample a center from label-positive (prob
    pos/(pos+neg)) or background voxels, then clamp so the window fits."""
    shape = label.shape[:3]
    take_pos = rng.random() < pos / (pos + neg)
    fg = np.argwhere(label > 0) if take_pos else np.argwhere(label <= 0)
    if len(fg) == 0:
        fg = np.argwhere(np.ones(shape, bool))
    center = fg[rng.integers(len(fg))][:3]
    return tuple(
        int(np.clip(center[i] - spatial_size[i] // 2, 0, shape[i] - spatial_size[i]))
        for i in range(3)
    )


def rand_crop_pos_neg(arrays: Arrays, label: np.ndarray, rng: np.random.Generator,
                      *, spatial_size: Sequence[int] = (96, 96, 96),
                      pos: float = 2.0, neg: float = 1.0,
                      num_samples: int = 1) -> List[Arrays]:
    """RandCropByPosNegLabeld: num_samples crops per volume, centers biased to
    label-positive voxels (provided_dataset.py:158-167)."""
    out = []
    for _ in range(num_samples):
        z0, y0, x0 = _sample_crop_start(label, rng, spatial_size, pos=pos, neg=neg)
        sz, sy, sx = spatial_size
        crop = {
            k: v[z0:z0 + sz, y0:y0 + sy, x0:x0 + sx]
            for k, v in arrays.items()
        }
        out.append(crop)
    return out


def pad_to_shape(x: np.ndarray, target: Sequence[int], *, mode: str = "constant") -> np.ndarray:
    """SpatialPadd equivalent: symmetric zero-pad spatial dims up to target."""
    pads = []
    for i, t in enumerate(target):
        extra = max(0, t - x.shape[i])
        pads.append((extra // 2, extra - extra // 2))
    while len(pads) < x.ndim:
        pads.append((0, 0))
    if not any(p[0] or p[1] for p in pads):
        return x
    return np.pad(x, pads, mode=mode)


def augment_dose_sample(inp: np.ndarray, gt: np.ndarray,
                        rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """The train-time chain for the dose task (crop_flag=False config):
    intensity shift on the CT channel (last), 3 flips, rot90."""
    inp = inp.copy()
    inp[..., -1] = rand_shift_intensity(inp[..., -1], rng)
    d = {"inp": inp, "gt": gt}
    d = rand_flip(d, rng)
    d = rand_rotate90(d, rng)
    return np.ascontiguousarray(d["inp"]), np.ascontiguousarray(d["gt"])


def augment_seg_sample(ct: np.ndarray, labels: np.ndarray, rng: np.random.Generator,
                       *, crop: Sequence[int] = (96, 96, 96),
                       num_samples: int = 4) -> List[Tuple[np.ndarray, np.ndarray]]:
    """The seg task chain (provided_dataset.py:125-210): pos/neg 96³ crops ×
    num_samples, then flips/rot90/intensity shift per crop."""
    ct = pad_to_shape(ct, crop)
    labels = pad_to_shape(labels, crop)
    crops = rand_crop_pos_neg({"ct": ct, "labels": labels}, labels, rng,
                              spatial_size=crop, num_samples=num_samples)
    out = []
    for c in crops:
        d = rand_flip({"ct": c["ct"], "labels": c["labels"]}, rng)
        d = rand_rotate90(d, rng)
        cvol = rand_shift_intensity(d["ct"], rng)
        out.append((np.ascontiguousarray(cvol), np.ascontiguousarray(d["labels"])))
    return out
