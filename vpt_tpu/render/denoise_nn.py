"""Learned kernel-predicting denoiser for low-spp previews.

The reference's one-click denoise runs Intel OIDN (main.cpp:1508-1520),
a learned filter; the à-trous substitute (render/denoise.py) halos
thin features and eats low-spp detail.  This module is a TPU-native
learned replacement in the same family as OIDN: a small convolutional
network that PREDICTS a per-pixel 5x5 filter kernel (softmax weights)
applied to the noisy radiance — kernel prediction (Bako et al. 2017)
cannot invent colors, so it is robust far outside its training data.

Everything is pure jax (explicit parameter pytree, conv via
lax.conv_general_dilated; convs run on the MXU).  Weights ship in
``vpt_tpu/assets/denoiser.npz`` — train/regenerate with
``tools/train_denoiser.py`` (renders its own noisy/clean pairs with
the fused engine).  Inputs: log-tonemapped radiance, alpha, and a
normalized depth AOV.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

KSIZE = 5          # predicted kernel size
FEATURES = (24, 24, 24)
_IN_CH = 5         # log-rgb 3 + alpha + depth

_WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "denoiser.npz")


def init_params(key, features=FEATURES):
    """Conv stack: in -> f0 -> f1 -> ... -> KSIZE^2 logits (3x3 convs,
    second layer dilated x2 for reach)."""
    sizes = [_IN_CH, *features, KSIZE * KSIZE]
    params = []
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        fan_in = sizes[i] * 9
        w = jax.random.normal(k, (3, 3, sizes[i], sizes[i + 1]),
                              jnp.float32) * np.sqrt(2.0 / fan_in)
        params.append(dict(w=w, b=jnp.zeros(sizes[i + 1], jnp.float32)))
    return params


def _conv(x, p, dilation=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _features(rgb, alpha, depth):
    lrgb = jnp.log1p(jnp.maximum(rgb, 0.0))
    d = depth / jnp.maximum(depth.max(), 1e-6)
    return jnp.concatenate([lrgb, alpha[..., None], d[..., None]], axis=-1)


def apply_denoiser(params, rgb, alpha, depth):
    """(H,W,3) noisy radiance -> (H,W,3) filtered, via a predicted
    per-pixel softmax kernel over the KSIZE x KSIZE neighborhood."""
    x = _features(rgb, alpha, depth)[None]          # (1,H,W,C)
    h = x
    for i, p in enumerate(params[:-1]):
        h = jax.nn.relu(_conv(h, p, dilation=2 if i == 1 else 1))
    logits = _conv(h, params[-1])[0]                # (H,W,K*K)
    w = jax.nn.softmax(logits, axis=-1)
    r = KSIZE // 2
    out = jnp.zeros_like(rgb)
    for iy in range(KSIZE):
        for ix in range(KSIZE):
            nb = jnp.roll(jnp.roll(rgb, iy - r, axis=0), ix - r, axis=1)
            out = out + nb * w[..., iy * KSIZE + ix, None]
    return out


def load_params(path: str | None = None):
    """Load the shipped weights; None if the file is absent."""
    path = path or _WEIGHTS_PATH
    if not os.path.exists(path):
        return None
    z = np.load(path)
    n = int(z["n_layers"])
    return [dict(w=jnp.asarray(z[f"w{i}"]), b=jnp.asarray(z[f"b{i}"]))
            for i in range(n)]


def save_params(path: str, params):
    out = {"n_layers": np.int32(len(params))}
    for i, p in enumerate(params):
        out[f"w{i}"] = np.asarray(p["w"])
        out[f"b{i}"] = np.asarray(p["b"])
    np.savez_compressed(path, **out)


def denoise_film(film, params=None):
    """Denoise a Film's accumulated radiance (the reference applies
    OIDN to the accum buffer in place).  Falls back to the à-trous
    filter when no trained weights are available."""
    p = params if params is not None else load_params()
    if p is None:
        from vpt_tpu.render.denoise import denoise_image
        return denoise_image(film.accum, film.alpha)
    return apply_denoiser(p, film.accum, film.alpha, film.depth)
