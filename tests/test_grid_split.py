"""split_host_grid (volume/grid.py): exact spatial decomposition of
one grid into parts whose trilinear fields sum to the original's.

The identity under test: trilinear interpolation is linear in the
voxel values and the parts' voxel arrays sum voxel-wise to the
original (interior boundaries are shared one-voxel halos zeroed on
one side), so the interpolated fields sum exactly in every cell —
including the edge-clamped half-voxel bands, where the clamp reads
the zero halo.  This is the beyond-HBM decomposition for a single
monolithic grid (parallel.instance_shard.build_grid_sharded_scene).
"""

import numpy as np
import pytest

from tests.golden_scenes import _blob
from vpt_tpu.scene.scene import build_scene
from vpt_tpu.volume.grid import split_host_grid


def _parts_scene(parts, **kw):
    return build_scene(parts, instance_grid_ids=list(range(len(parts))),
                       instance_xforms=[p.transform for p in parts], **kw)


def test_voxelwise_reconstruction():
    """Scattering every part back into index space reproduces the
    original voxel array exactly (the linearity premise)."""
    g = _blob(n=24, emission=True)
    for axis in (0, 1, 2):
        parts = split_host_grid(g, 3, axis=axis)
        np_ax = 2 - axis
        recon = np.zeros_like(g.density_zyx)
        recon_em = np.zeros_like(g.emission_zyx)
        for p in parts:
            lo = int(p.bbox_min[axis] - g.bbox_min[axis])
            sl = [slice(None)] * 3
            sl[np_ax] = slice(lo, lo + int(p.dim[axis]))
            recon[tuple(sl)] += p.density_zyx
            recon_em[tuple(sl)] += p.emission_zyx
        np.testing.assert_array_equal(recon, g.density_zyx)
        np.testing.assert_array_equal(recon_em, g.emission_zyx)
        # per-part majorants tighten: never above the original's
        assert all(p.max_density <= g.max_density + 1e-6 for p in parts)


@pytest.mark.parametrize("axis,n_parts", [(0, 2), (1, 3), (2, 4)])
def test_field_sum_matches_original(axis, n_parts):
    """The SAMPLED field (through the real corner-table fetch, with
    its texel-center offset and edge clamping) of the parts-as-
    instances scene equals the single-grid scene's everywhere."""
    import jax.numpy as jnp

    from vpt_tpu.render.tracking import scene_density

    g = _blob(n=24)
    combined = build_scene([g], majorant_resolution=0)
    parts = split_host_grid(g, n_parts, axis=axis)
    split = _parts_scene(parts, majorant_resolution=0)

    lo = np.asarray(combined.root_pmin)
    hi = np.asarray(combined.root_pmax)
    rng = np.random.RandomState(3)
    # interior points + points in the clamp bands just outside the box
    pts = rng.uniform(lo - 0.2, hi + 0.2, size=(4096, 3)).astype(np.float32)
    d1 = np.asarray(scene_density(combined, jnp.asarray(pts)))
    d2 = np.asarray(scene_density(split, jnp.asarray(pts)))
    np.testing.assert_allclose(d2, d1, rtol=1e-5, atol=1e-6)
    assert d1.max() > 0.5  # non-trivial field


def test_split_validation():
    g = _blob(n=24)
    with pytest.raises(ValueError, match="n_parts"):
        split_host_grid(g, 1)
    with pytest.raises(ValueError, match="rows along axis"):
        split_host_grid(g, 13)  # 24 < 2*13
    with pytest.raises(NotImplementedError, match="color"):
        split_host_grid(_blob(n=24, color=True), 2)
    # default axis: the longest dimension
    wide = _blob(n=24)
    wide.dim[0] = 24  # already cubic; just exercise the default path
    assert len(split_host_grid(wide, 2)) == 2
