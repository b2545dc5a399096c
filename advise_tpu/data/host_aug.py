"""Host-side PIL augmentation — the reference-exact fidelity oracle.

A faithful re-implementation of the reference's frame-mode pipeline
(reference ``datasets/augmentation.py`` AugsWarper + the per-clip
fixed-seed loop in ``datasets/sampling.py:313-336``): ToPIL -> Resize ->
RandomCrop -> RandomColorJitter -> (Grayscale) -> ToTensor -> Normalize,
with one RNG draw per clip re-used for every frame.

Used when ``TPU.DEVICE_AUG=False`` (loader emits normalized float32
clips) and by tests as the golden oracle for the on-device kernels. This
path reproduces the reference's PIL semantics bit-for-bit — including the
hue-jitter no-op (uint8 truncation, SURVEY §8).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def _color_jitter_frame(img: Image.Image, rng: random.Random, p, b, c, s, h):
    """reference RandomColorJitter (augmentation.py:24-56)."""
    b_factor = rng.uniform(max(0, 1.0 - b), 1.0 + b)
    c_factor = rng.uniform(max(0, 1.0 - c), 1.0 + c)
    s_factor = rng.uniform(max(0, 1.0 - s), 1.0 + s)
    _h_factor = rng.uniform(-h, h)  # reference hue op is a no-op; drawn to
    fn_idx = [0, 1, 2, 3]           # keep the RNG stream aligned
    rng.shuffle(fn_idx)
    if rng.random() < p:
        for fn_id in fn_idx:
            if fn_id == 0:
                img = ImageEnhance.Brightness(img).enhance(b_factor)
            elif fn_id == 1:
                img = ImageEnhance.Contrast(img).enhance(c_factor)
            elif fn_id == 2:
                img = ImageEnhance.Color(img).enhance(s_factor)
            # fn_id == 3: hue — reference's uint8-truncation no-op
    return img


class SimpleHostAug:
    """AUG.TYPE='simple' on host: fixed Resize -> RandomCrop ->
    ColorJitter -> Normalize, per-clip fixed seed across frames."""

    def __init__(self, cfg):
        self.resize_wh = (int(cfg.AUG.RESIZE[0]), int(cfg.AUG.RESIZE[1]))
        self.size = int(cfg.AUG.TARGET_SIZE)
        self.color = tuple(cfg.AUG.COLOR)
        self.mean = np.asarray(cfg.DATA.MEAN, np.float32)
        self.std = np.asarray(cfg.DATA.STD, np.float32)

    def __call__(self, clip_u8: np.ndarray, seed: int) -> np.ndarray:
        """[T, H, W, C] uint8 -> [T, S, S, C] normalized float32."""
        out = []
        k = self.size
        for frame in clip_u8:
            rng = random.Random(seed)  # re-seed per frame (reference)
            img = Image.fromarray(frame)
            if img.size != self.resize_wh:
                img = img.resize(self.resize_wh, resample=Image.BILINEAR)
            w, h = img.size
            top = 0 if h == k else rng.randint(1, h - k) - 1
            left = 0 if w == k else rng.randint(1, w - k) - 1
            img = img.crop((left, top, left + k, top + k))
            img = _color_jitter_frame(img, rng, *self.color)
            arr = np.asarray(img, np.float32) / 255.0
            out.append((arr - self.mean) / self.std)
        return np.stack(out)


def build_host_aug(cfg, mode: str = "train"):
    """Host aug dispatch; only the reference-exact 'simple' pipeline is
    implemented host-side (the oracle path). Other AUG types run on device."""
    if mode == "train" and cfg.AUG.TYPE == "simple":
        return SimpleHostAug(cfg)
    raise NotImplementedError(
        f"host aug only supports AUG.TYPE='simple' (got {cfg.AUG.TYPE}); "
        "use TPU.DEVICE_AUG=True for the on-device pipelines"
    )
