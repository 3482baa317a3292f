"""Auxiliary subsystems: LBVH build, denoiser, film checkpoint/resume,
HDR io."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from vpt_tpu.accel.lbvh import build_lbvh, bvh_hit_count, morton30
from vpt_tpu.render.denoise import denoise_image
from vpt_tpu.render.film import Film, accumulate, load_film, save_film


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-10, 10, (n, 3))
    half = rng.uniform(0.1, 1.0, (n, 3))
    return (centers - half).astype(np.float32), (centers + half).astype(
        np.float32)


def test_morton_orders_by_locality():
    pts = np.array([[0.0, 0.0, 0.0], [0.99, 0.99, 0.99], [0.01, 0.0, 0.0]])
    codes = morton30(pts)
    assert codes[0] < codes[1]
    assert abs(int(codes[0]) - int(codes[2])) < abs(
        int(codes[0]) - int(codes[1]))


def test_lbvh_root_bounds_cover_scene():
    pmin, pmax = _random_boxes(50)
    bvh = build_lbvh(pmin, pmax)
    np.testing.assert_allclose(bvh.pmin[0], pmin.min(0), atol=1e-5)
    np.testing.assert_allclose(bvh.pmax[0], pmax.max(0), atol=1e-5)
    # every leaf's parent chain reaches the root
    for leaf in range(49, 99):
        node = leaf
        hops = 0
        while bvh.parent[node] != -1:
            node = bvh.parent[node]
            hops += 1
            assert hops < 100
        assert node == 0


def test_lbvh_traversal_counts_hits():
    pmin, pmax = _random_boxes(20, seed=1)
    bvh = build_lbvh(pmin, pmax)
    # a ray straight through the scene center hits at least one leaf
    o = np.array([[0.0, 0.0, -50.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    hits = bvh_hit_count(bvh, o, d)
    # brute-force reference
    inv = 1.0 / d[0]
    t1 = (pmin - o[0]) * inv
    t2 = (pmax - o[0]) * inv
    tmin = np.minimum(t1, t2).max(axis=1)
    tmax = np.maximum(t1, t2).min(axis=1)
    brute = int(((tmax > 0) & (tmin <= tmax)).sum())
    assert hits[0] == brute


def test_denoise_reduces_noise_preserves_edges():
    rng = np.random.RandomState(0)
    H = W = 64
    clean = np.zeros((H, W, 3), np.float32)
    clean[:, W // 2:] = 1.0
    alpha = clean[..., 0]
    noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    out = np.asarray(denoise_image(jnp.asarray(noisy), jnp.asarray(alpha),
                                   strength=0.8))
    noise_before = np.abs(noisy - clean).mean()
    noise_after = np.abs(out - clean).mean()
    assert noise_after < noise_before * 0.6
    # the edge survives: mean difference across the boundary stays large
    assert (out[:, W // 2 + 4].mean() - out[:, W // 2 - 4].mean()) > 0.7


def test_film_checkpoint_roundtrip():
    film = Film.zeros(8, 8)
    film = accumulate(film, jnp.ones((8, 8, 3)) * 0.3,
                      jnp.ones((8, 8)) * 0.5, jnp.uint32(0))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        save_film(path, film, 7)
        film2, it = load_film(path)
    assert it == 7
    np.testing.assert_array_equal(np.asarray(film.accum),
                                  np.asarray(film2.accum))


def test_hdr_roundtrip_flat():
    """RGBE loader on a synthetic flat-scanline .hdr file."""
    from vpt_tpu.utils.hdr import load_hdr
    H, W = 4, 6
    rgb = np.array([1.0, 0.5, 0.25], np.float32) * np.ones((H, W, 3),
                                                           np.float32)
    # encode RGBE manually (e such that max*2^(e-128-8) ... )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t.hdr")
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {H} +X {W}\n".encode())
            e = 129  # scale = 2^(129-136) = 1/128
            px = bytes([128, 64, 32, e]) * W
            for _ in range(H):
                f.write(px)
        img = load_hdr(path)
    np.testing.assert_allclose(img, rgb, rtol=1e-2)


def test_exr_zip_roundtrip():
    """ZIP/ZIPS predictor + interleave round-trip (ImfZip semantics):
    values must reconstruct exactly, including byte 0 (the advisor-found
    +128 offset bug regression guard)."""
    from vpt_tpu.utils.exr import read_exr, write_exr
    rng = np.random.default_rng(3)
    H, W = 33, 17  # non-multiple of the 16-line ZIP block
    chans = {"R": rng.standard_normal((H, W)).astype(np.float32),
             "G": np.linspace(-1e6, 1e6, H * W,
                              dtype=np.float32).reshape(H, W),
             "B": np.zeros((H, W), np.float32)}
    for comp in ("zip", "zips", "none"):
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, f"t_{comp}.exr")
            write_exr(path, chans, compression=comp)
            out = read_exr(path)
        for c in chans:
            np.testing.assert_array_equal(out[c], chans[c], err_msg=comp)


def test_no_module_level_tracer_leak():
    """Module-level jnp constants become leaked tracers when their
    module is first imported INSIDE a jit trace (lazy imports in
    environment_radiance do exactly that).  Constants must be numpy.
    Runs in a subprocess so the import genuinely happens mid-trace."""
    import subprocess
    import sys
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import jax.numpy as jnp\n"
        "@jax.jit\n"
        "def f(x):\n"
        "    from vpt_tpu.sky.procedural import sample_sky\n"
        "    return sample_sky(x, 150.0, 30.0, jnp.ones(3)).sum()\n"
        "d = jnp.array([[0.0, 1.0, 0.0]])\n"
        "float(f(d))\n"
        "@jax.jit\n"
        "def g(x):\n"
        "    from vpt_tpu.sky.procedural import sample_sky\n"
        "    return sample_sky(x, 150.0, 30.0, jnp.ones(3)).sum()\n"
        "float(g(d))\n"
        "print('LEAK_FREE')\n")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "LEAK_FREE" in out.stdout, out.stderr[-2000:]
