"""Image output — the fileIO surface (source/util/fileIO.cpp:53-495):
jpg/png via PIL, exr via the built-in minimal writer."""

from __future__ import annotations

import os

import numpy as np


def save_image(path: str, display_rgb_u8: np.ndarray,
               accum: np.ndarray | None = None, save_exr: bool = False):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".png", ".jpg", ".jpeg", ".tga", ".bmp"):
        from PIL import Image
        Image.fromarray(display_rgb_u8).save(path)
    elif ext == ".exr":
        if accum is None:
            raise ValueError("EXR output needs the radiance accumulation")
        _write_exr_rgb(path, accum)
        return
    else:
        raise ValueError(f"unsupported image format {ext}")
    if save_exr and accum is not None:
        _write_exr_rgb(os.path.splitext(path)[0] + ".exr", accum)


def _write_exr_rgb(path: str, rgb: np.ndarray):
    from vpt_tpu.utils.exr import write_exr
    write_exr(path, {"R": rgb[..., 0].astype(np.float32),
                     "G": rgb[..., 1].astype(np.float32),
                     "B": rgb[..., 2].astype(np.float32)})


def save_aov(base_path: str, name: str, aov: np.ndarray):
    """Save a scalar AOV as a normalized PNG + raw EXR (the reference
    dumps cost/depth EXRs behind SAVE_OPENEXR, main.cpp:1797-1812)."""
    stem = os.path.splitext(base_path)[0]
    from vpt_tpu.utils.exr import write_exr
    write_exr(f"{stem}_{name}.exr", {"Y": aov.astype(np.float32)})
    from PIL import Image
    lo, hi = float(aov.min()), float(aov.max())
    norm = (aov - lo) / (hi - lo) if hi > lo else aov * 0
    Image.fromarray((norm * 255).astype(np.uint8)).save(f"{stem}_{name}.png")
