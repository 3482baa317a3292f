"""Learned kernel-predicting denoiser (render/denoise_nn.py) — the
TPU-native stand-in for the reference's OIDN button
(main.cpp:1508-1520).  Covers the filter's structural guarantees
(convexity: it cannot invent colors), the weight I/O, the untrained
fallback, and — when the shipped weights are present — a quality bar
vs the à-trous substitute on a low-spp render."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.render import denoise_nn
from vpt_tpu.render.denoise import denoise_image
from vpt_tpu.render.denoise_nn import (apply_denoiser, denoise_film,
                                       init_params, load_params,
                                       save_params)
from vpt_tpu.render.film import Film


def _film(rgb, alpha=None, depth=None):
    h, w = rgb.shape[:2]
    f = Film.zeros(h, w)
    return dataclasses.replace(
        f, accum=jnp.asarray(rgb),
        alpha=jnp.asarray(alpha if alpha is not None
                          else np.ones((h, w), np.float32)),
        depth=jnp.asarray(depth if depth is not None
                          else np.ones((h, w), np.float32)))


def test_kernel_prediction_is_convex():
    """Softmax kernel weights -> every output pixel lies inside the
    range of its 5x5 neighborhood; a constant image is a fixed point
    regardless of the (random) weights."""
    params = init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(24, 40, 3).astype(np.float32))
    alpha = jnp.asarray(rng.rand(24, 40).astype(np.float32))
    depth = jnp.asarray(rng.rand(24, 40).astype(np.float32))
    out = apply_denoiser(params, rgb, alpha, depth)
    assert float(out.min()) >= float(rgb.min()) - 1e-5
    assert float(out.max()) <= float(rgb.max()) + 1e-5

    flat = jnp.full((24, 40, 3), 0.37, jnp.float32)
    out = apply_denoiser(params, flat, alpha, depth)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-5)


def test_weight_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(2))
    path = str(tmp_path / "w.npz")
    save_params(path, params)
    loaded = load_params(path)
    assert len(loaded) == len(params)
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    a = jnp.ones((16, 16), jnp.float32)
    d = jnp.ones((16, 16), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(apply_denoiser(params, rgb, a, d)),
        np.asarray(apply_denoiser(loaded, rgb, a, d)))


def test_untrained_falls_back_to_atrous(monkeypatch):
    monkeypatch.setattr(denoise_nn, "_WEIGHTS_PATH", "/nonexistent.npz")
    rng = np.random.RandomState(2)
    rgb = rng.rand(20, 20, 3).astype(np.float32)
    film = _film(rgb)
    out = denoise_film(film)
    expect = denoise_image(film.accum, film.alpha)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_cli_denoise_flag(tmp_path):
    from vpt_tpu.app.cli import main
    out = tmp_path / "dn.png"
    main(["render", "procedural", "-o", str(out), "--spp", "2",
          "--width", "32", "--height", "32", "--ray-depth", "3",
          "--env-type", "constant", "--cpu", "--denoise", "atrous",
          "--light", "2", "5", "6", "1", "1", "1", "40"])
    assert out.exists()


_HAVE_WEIGHTS = os.path.exists(denoise_nn._WEIGHTS_PATH)


@pytest.mark.skipif(not _HAVE_WEIGHTS,
                    reason="shipped denoiser weights absent")
def test_trained_beats_atrous_at_low_spp():
    """Quality bar (VERDICT r2 weak #9): on an 8-spp render the
    learned filter must land closer to the 512-spp target than the
    à-trous substitute, measured by relative L1 on log radiance."""
    from tests.golden_scenes import _blob
    from vpt_tpu.render.params import Environment, RenderParams
    from vpt_tpu.render.renderer import ProgressiveRenderer
    from vpt_tpu.scene.scene import build_scene

    scene = build_scene([_blob(n=24, emission=True)])
    kw = dict(width=64, height=64, ray_depth=6, max_track_steps=128,
              max_fused_steps=256,
              environment_type=int(Environment.BLACK))
    lo = ProgressiveRenderer(
        scene, RenderParams(seed=7, **kw).replace(
            emission_scale=2.0)).render(8)
    hi = ProgressiveRenderer(
        scene, RenderParams(seed=99, **kw).replace(
            emission_scale=2.0)).render(512)

    def err(img):
        a = np.log1p(np.maximum(np.asarray(img), 0.0))
        b = np.log1p(np.maximum(np.asarray(hi.accum), 0.0))
        return float(np.abs(a - b).mean())

    e_in = err(lo.accum)
    e_nn = err(denoise_film(lo))
    e_at = err(denoise_image(lo.accum, lo.alpha))
    assert e_nn < e_in, (e_nn, e_in)
    assert e_nn < e_at, (e_nn, e_at)
