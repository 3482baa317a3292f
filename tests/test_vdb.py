"""VDB parser tests against the reference assets' own metadata."""

import numpy as np
import pytest

from vpt_tpu.volume.vdb import read_vdb

DRAGON = "/root/reference/assets/dragon.vdb"
DRAGON_XFORM = "/root/reference/assets/dragon_with_xform.vdb"


@pytest.fixture(scope="module")
def dragon():
    return read_vdb(DRAGON)["density"]


def test_active_voxel_count_matches_metadata(dragon):
    d = dragon.dense_zyx
    assert (d > 0).sum() == dragon.metadata["file_voxel_count"]


def test_bbox_matches_metadata(dragon):
    np.testing.assert_array_equal(dragon.bbox_min,
                                  dragon.metadata["file_bbox_min"])
    np.testing.assert_array_equal(dragon.bbox_max,
                                  dragon.metadata["file_bbox_max"])


def test_density_range(dragon):
    d = dragon.dense_zyx
    assert d.min() >= 0.0
    assert d.max() == pytest.approx(1.0, abs=1e-5)


def test_uniform_scale_transform(dragon):
    np.testing.assert_allclose(np.diag(dragon.transform), [0.1, 0.1, 0.1, 1.0])
    assert dragon.voxel_size == pytest.approx(0.1, rel=1e-6)


def test_affine_transform_variant():
    g = read_vdb(DRAGON_XFORM)["density"]
    d = g.dense_zyx
    assert (d > 0).sum() == g.metadata["file_voxel_count"]
    # affine map with rotation: off-diagonals nonzero
    r = g.transform[:3, :3]
    assert np.abs(r - np.diag(np.diag(r))).max() > 0.0


def test_dense_layout_xyz(dragon):
    """dense_zyx shape must be (nz, ny, nx) with dim = (nx, ny, nz)."""
    nx, ny, nz = dragon.dim
    assert dragon.dense_zyx.shape == (nz, ny, nx)


def test_native_leaf_decode_matches_python():
    """The C++ whole-stream leaf decoder (vdb_decode_leaves) is
    bit-exact vs the Python reference decoder on a real archive; the
    loader silently falls back when the library declines."""
    import numpy as np

    import vpt_tpu.volume.vdb as V
    from vpt_tpu.utils.compression import _load_native
    if not _load_native():
        import pytest
        pytest.skip("native codec not built")
    orig = V._TreeReader._read_buffers_native
    try:
        V._TreeReader._read_buffers_native = lambda self: None
        ref = V.read_vdb("/root/reference/assets/dragon.vdb")
    finally:
        V._TreeReader._read_buffers_native = orig
    nat = V.read_vdb("/root/reference/assets/dragon.vdb")
    for k in ref:
        assert np.array_equal(ref[k].dense_zyx, nat[k].dense_zyx)
        assert np.array_equal(ref[k].bbox_min, nat[k].bbox_min)
