"""vpt_tpu — a TPU-native volumetric path tracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sergeneren/Volumetric-Path-Tracer (an interactive CUDA OpenVDB
volumetric path tracer): progressive delta-tracking volume rendering,
residual-ratio transmittance, Henyey-Greenstein phase functions,
sun/sky/point-light next-event estimation with MIS, a Bruneton
precomputed atmosphere, HDRI environment importance sampling,
instanced VDB rendering, and a flat majorant-grid acceleration
structure in place of the reference's pointer-chasing octree.

Design: wavefront/SoA ray batches over XLA, functional RNG
(threefry keyed per (pixel, sample, bounce)), dense bricked voxel
grids with manual trilinear gathers instead of hardware 3-D textures,
and `shard_map` sample/tile sharding over a `jax.sharding.Mesh` for
multi-chip scaling.
"""

__version__ = "0.1.0"

from vpt_tpu.render.params import RenderParams  # noqa: F401,E402
from vpt_tpu.scene.scene import Scene  # noqa: F401,E402
