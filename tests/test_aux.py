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


def test_dof_overlay_bands():
    """DOF visualization overlay (render_kernel.cu:2266-2275): blue
    before / green inside / red beyond the focus band."""
    import jax.numpy as jnp
    from vpt_tpu.core.camera import Camera
    from vpt_tpu.render.film import Film, dof_overlay
    cam = Camera.make([0, 0, 0], [0, 0, 10], aperture=0.4)  # aof = 5
    film = Film(accum=jnp.zeros((1, 3, 3)), alpha=jnp.zeros((1, 3)),
                depth=jnp.asarray([[2.0, 10.0, 40.0]]),
                cost=jnp.zeros((1, 3)), trunc=jnp.zeros((1, 3)))
    v = np.asarray(dof_overlay(film, cam))
    assert v[0, 0, 2] > v[0, 0, 0]  # near -> blue
    assert v[0, 1, 1] > v[0, 1, 0]  # in band -> green
    assert v[0, 2, 0] > v[0, 2, 2]  # far -> red


def test_phase_timer():
    import time as _t
    from vpt_tpu.utils.profiling import PhaseTimer
    import jax.numpy as jnp
    pt = PhaseTimer()
    with pt.phase("a", jnp.arange(4.0)):
        _t.sleep(0.01)
    with pt.phase("b"):
        pass
    times = pt.report()
    assert times["a"] >= 0.01 and "b" in times


def test_piz_exr_decode():
    """PIZ (wavelet+Huffman) EXR decode on the reference's shipped
    asset (density_color_texture.exr — 256x1 ABGR HALF, compression 4):
    exact half-precision values, smooth LUT content."""
    path = "/root/reference/assets/density_color_texture.exr"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference asset not present")
    from vpt_tpu.utils.exr import read_exr
    ch = read_exr(path)
    assert set(ch) == {"A", "B", "G", "R"}
    for k, v in ch.items():
        assert v.shape == (1, 256)
        assert np.isfinite(v).all()
        # values are exact half floats (decode is bit-level)
        assert np.array_equal(v, v.astype(np.float16).astype(np.float32))
    assert float(ch["A"].min()) == 1.0 == float(ch["A"].max())
    r = ch["R"][0]
    assert 0.85 < r.min() <= r.max() <= 1.0
    # smooth LUT: neighboring entries differ by < 1%
    assert np.abs(np.diff(r)).max() < 0.01


def test_structure_visualization_aovs():
    """visualize_BVH / visualize_OCTree analogs (render_kernel.cu:
    2108-2136): the vectorized leaf-hit count matches the host BVH
    traversal, and occupancy is nonzero only where rays cross the
    volume."""
    import dataclasses

    from tests.test_scenarios import _blob_grid, _cam_for
    from vpt_tpu.render.debugviz import (bvh_hits, occupancy_fraction,
                                         render_structure_aov)
    from vpt_tpu.render.params import RenderParams
    from vpt_tpu.scene.scene import build_scene

    rng = np.random.RandomState(0)
    ids, xforms = [], []
    for i in range(5):
        xf = np.diag([0.2, 0.2, 0.2, 1.0])
        xf[3, :3] = rng.uniform(0, 6, 3)
        ids.append(0)
        xforms.append(xf)
    scene = build_scene([_blob_grid()], instance_grid_ids=ids,
                        instance_xforms=xforms)
    scene = dataclasses.replace(scene, camera=_cam_for(scene))

    c = (np.asarray(scene.root_pmin) + np.asarray(scene.root_pmax)) / 2
    span = np.asarray(scene.root_pmax) - np.asarray(scene.root_pmin)
    o = np.array([c + [0.0, 0.0, span[2] * 2.0],
                  c + [span[0] * 9.0, 0.0, span[2] * 2.0]], np.float32)
    d = np.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], np.float32)

    hits = np.asarray(bvh_hits(scene, o, d))
    host = bvh_hit_count(build_lbvh(np.asarray(scene.instances.pmin),
                                    np.asarray(scene.instances.pmax)),
                         o, d)
    np.testing.assert_array_equal(hits, host.astype(np.float32))
    assert hits[0] >= 1 and hits[1] == 0

    occ = np.asarray(occupancy_fraction(scene, o, d))
    assert occ[0] > 0.0 and occ[1] == 0.0

    p = RenderParams(width=16, height=16)
    img = np.asarray(render_structure_aov(scene, p, "occupancy"))
    assert img.shape == (16, 16) and img.max() > 0
    img = np.asarray(render_structure_aov(scene, p, "bvh"))
    assert img.shape == (16, 16) and img.max() >= 1


def test_procedural_chunked_generation_matches():
    """chunk_z slab evaluation (the beyond-HBM 512^3 bench path) is
    bit-identical to the monolithic noise eval."""
    from vpt_tpu.volume.procedural import create_procedural_grid
    a = create_procedural_grid(vmin=(-8, -8, -8), vmax=(8, 8, 8), res=1.0)
    b = create_procedural_grid(vmin=(-8, -8, -8), vmax=(8, 8, 8), res=1.0,
                               chunk_z=5)
    np.testing.assert_array_equal(a.density_zyx, b.density_zyx)


def test_hdr_old_style_rle():
    """Old-style RGBE RLE: (1,1,1,n) repeats the previous pixel n<<shift
    times, consecutive markers escalate the shift (hdr_loader.h legacy
    path; Radiance oldreadcolrs semantics)."""
    from vpt_tpu.utils.hdr import load_hdr
    H, W = 2, 300
    e = 129  # scale 1/128
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "old.hdr")
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {H} +X {W}\n".encode())
            # row 0: one literal pixel then a 299-repeat via two markers
            # (43 + (1 << 8)) = 299
            f.write(bytes([128, 64, 32, e]))
            f.write(bytes([1, 1, 1, 43]))
            f.write(bytes([1, 1, 1, 1]))
            # row 1: flat row, no markers (fast path)
            f.write(bytes([64, 128, 32, e]) * W)
        img = load_hdr(path)
    assert img.shape == (H, W, 3)
    np.testing.assert_allclose(img[0], np.tile([1.0, 0.5, 0.25], (W, 1)),
                               rtol=1e-2)
    np.testing.assert_allclose(img[1], np.tile([0.5, 1.0, 0.25], (W, 1)),
                               rtol=1e-2)
