"""Built-in asset loading: blackbody emission LUT, density color LUT,
blue noise (the reference's ASSET_PATH files, main.cpp:1378-1403)."""

from __future__ import annotations

import os

import numpy as np

DEFAULT_ASSET_DIRS = [
    os.environ.get("VPT_ASSET_PATH", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "assets"),
    "/root/reference/assets",
]


def _find(name: str) -> str | None:
    for d in DEFAULT_ASSET_DIRS:
        if d and os.path.exists(os.path.join(d, name)):
            return os.path.join(d, name)
    return None


def load_lut(name: str) -> np.ndarray | None:
    """256-entry RGB LUT from a 256x1 EXR (blackbody_texture.exr etc.)."""
    path = _find(name)
    if path is None:
        return None
    from vpt_tpu.utils.exr import read_exr_rgb
    rgb = read_exr_rgb(path)           # (1, 256, 3) or (256, 1, 3)
    lut = rgb.reshape(-1, 3)
    if lut.shape[0] != 256:
        lut = np.resize(lut, (256, 3))
    return np.ascontiguousarray(lut, np.float32)


def load_blackbody_lut() -> np.ndarray | None:
    return load_lut("blackbody_texture.exr")


def load_density_color_lut() -> np.ndarray | None:
    return load_lut("density_color_texture2.exr")
