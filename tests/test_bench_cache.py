"""bench.cached_scene: the host-side scene-build disk cache.

The bench box has one CPU and the driver kills bench.py at ~900 s, so
expensive builds (union resample + octant sweep, 1024-instance cell
lists, 512^3 procedural grids) are pickled to disk keyed by a hash of
the scene-build sources (bench.py _CACHE_SRC).  These tests pin the
contract: a cache hit returns a leaf-identical scene without calling
the builder, and a source-hash change forces a rebuild.
"""

import numpy as np
import pytest

import bench
from vpt_tpu.lights.lights import PointLights
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import HostGrid


@pytest.fixture()
def tiny_grid():
    z, y, x = np.mgrid[:12, :12, :12].astype(np.float32)
    d = np.clip(1.0 - np.sqrt((x - 6) ** 2 + (y - 6) ** 2
                              + (z - 6) ** 2) / 5.0, 0.0, 1.0)
    return HostGrid(
        density_zyx=d.astype(np.float32), emission_zyx=None,
        color_zyx=None, bbox_min=np.zeros(3, np.int32),
        dim=np.array([12, 12, 12], np.int32),
        transform=np.diag([0.1, 0.1, 0.1, 1.0]), voxel_size=0.1,
        max_density=float(d.max()), min_density=1e-6)


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_CACHE_DIR", str(tmp_path / "scenes"))
    monkeypatch.setattr(bench, "_CACHE_TAG", None)
    return tmp_path / "scenes"


def test_round_trip_and_hit(tiny_grid, cache_dir):
    import jax

    lights = PointLights.make([[2.0, 3.0, 4.0]], [[1.0, 1.0, 1.0]], [50.0])
    calls = []

    def builder():
        calls.append(1)
        return build_scene([tiny_grid], lights=lights)

    s1 = bench.cached_scene("t-tiny", builder)
    s2 = bench.cached_scene("t-tiny", builder)
    assert len(calls) == 1  # second call served from disk
    l1, t1 = jax.tree.flatten(s1)
    l2, t2 = jax.tree.flatten(s2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(a, b)


def test_source_hash_invalidation(tiny_grid, cache_dir):
    lights = PointLights.make([[2.0, 3.0, 4.0]], [[1.0, 1.0, 1.0]], [50.0])
    calls = []

    def builder():
        calls.append(1)
        return build_scene([tiny_grid], lights=lights)

    bench.cached_scene("t-inval", builder)
    bench._CACHE_TAG = "0" * 12  # a source edit changes the tag
    bench.cached_scene("t-inval", builder)
    assert len(calls) == 2


def test_corrupt_cache_falls_back(tiny_grid, cache_dir):
    lights = PointLights.make([[2.0, 3.0, 4.0]], [[1.0, 1.0, 1.0]], [50.0])
    calls = []

    def builder():
        calls.append(1)
        return build_scene([tiny_grid], lights=lights)

    bench.cached_scene("t-corrupt", builder)
    fn, = list(cache_dir.glob("t-corrupt-*.pkl"))
    fn.write_bytes(b"not a pickle")
    bench.cached_scene("t-corrupt", builder)
    assert len(calls) == 2
