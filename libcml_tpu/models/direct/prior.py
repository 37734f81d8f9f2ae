"""Neural inverse-depth priors for initialization.

TPU-native replacement for the reference's NN prior hooks
(reference: src/cml/nn/Precomputed.h:8-21 — loads
`<image>.idepth.midas_large.png` MiDaS inverse-depth renders next to the
dataset images, used by Hybrid.cpp:469-473 to seed DSOInitializer via the
tryInitialize overload DSOInitializer.cpp:117; src/cml/nn/Midas.cpp /
MonoDepth.cpp — in-process libtorch variants, build-gated the same way the
torch path here is import-gated).

The prior is a callable `(image, frame_index, path) -> (H, W) float32
inverse depth or None`; DirectOdometry passes whatever it returns into
set_first(prior_idepth=...)."""

from __future__ import annotations

import os

import numpy as np


class PrecomputedDepthPrior:
    """Pre-rendered inverse-depth maps stored next to the dataset images
    (the reference's deliberate 'fake backend' for the neural prior —
    SURVEY.md §4). Looks for `<image>.idepth.<model>.png` (uint16, scaled)
    or `<image>.idepth.npy`."""

    def __init__(self, model: str = "midas_large", scale: float = 1.0 / 6553.5):
        self.model = model
        self.scale = scale   # uint16 -> inverse depth units

    def __call__(self, image, frame_index: int, path: str | None = None):
        if not path:
            return None
        base = os.path.splitext(path)[0]
        npy = base + ".idepth.npy"
        if os.path.isfile(npy):
            return np.load(npy).astype(np.float32)
        png = f"{base}.idepth.{self.model}.png"
        if os.path.isfile(png):
            from PIL import Image

            arr = np.asarray(Image.open(png), np.float32)
            return arr * self.scale
        return None


class TorchDepthPrior:
    """In-process monocular depth module (the reference's Midas.cpp
    analogue): wraps any torch model mapping (1, 1, H, W) in [0,1] to a
    relative inverse-depth map. Import-gated on torch availability."""

    def __init__(self, model, device: str = "cpu"):
        import torch  # noqa: F401 — gate

        self.model = model.eval()
        self.device = device

    def __call__(self, image, frame_index: int, path: str | None = None):
        import torch

        with torch.no_grad():
            x = torch.as_tensor(
                np.asarray(image, np.float32) / 255.0
            )[None, None].to(self.device)
            out = self.model(x)
        d = np.asarray(out.squeeze().cpu().numpy(), np.float32)
        # normalize to a usable inverse-depth range (relative depth models
        # are scale-free; the initializer renormalizes scale anyway)
        lo, hi = np.percentile(d, [5, 95])
        return np.clip((d - lo) / max(hi - lo, 1e-6), 0.05, 1.0) * 2.0
