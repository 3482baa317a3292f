"""`.ins` instance file support.

Text format written by the Houdini HDK plugin (file_IO.cpp:56-226) and
parsed by the reference at main.cpp:980-1102:

    line 1: <num unique vdbs>      |  "light"
    per vdb: <path>                |  <num lights>
             <num instances>       |  "px py pz r g b power" x N
             "px py pz qx qy qz qw scale" x M

Volume instance transform (main.cpp:1059-1100): grid transform with
translation removed, then instance scale, then quaternion rotation,
then instance translation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from vpt_tpu.core.vecmath import np_quaternion_to_mat4


@dataclass
class InsVolumeFile:
    vdb_file: str
    instances: np.ndarray  # (M, 8): px py pz qx qy qz qw scale


@dataclass
class InsFile:
    lights: np.ndarray | None = None       # (L, 7): pos rgb power
    volumes: list[InsVolumeFile] = field(default_factory=list)


def read_ins(path: str) -> InsFile:
    lines = [ln.rstrip("\n") for ln in open(path)]
    it = iter(lines)
    first = next(it).strip()
    out = InsFile()
    if first == "light":
        n = int(next(it).split()[0])
        rows = [np.fromstring(next(it), sep=" ") for _ in range(n)]
        out.lights = np.stack(rows) if rows else np.zeros((0, 7))
        return out
    n_vdbs = int(first.split()[0])
    for _ in range(n_vdbs):
        vdb_file = next(it).strip()
        m = int(next(it).split()[0])
        rows = [np.fromstring(next(it), sep=" ") for _ in range(m)]
        out.volumes.append(InsVolumeFile(
            vdb_file=vdb_file,
            instances=np.stack(rows) if rows else np.zeros((0, 8))))
    return out


def write_ins(path: str, ins: InsFile):
    """Writer matching file_IO.cpp:56-226 (the Houdini-side format)."""
    with open(path, "w") as f:
        if ins.lights is not None:
            f.write("light\n")
            f.write(f"{len(ins.lights)}\n")
            for row in ins.lights:
                f.write(" ".join(f"{v:g}" for v in row) + "\n")
            return
        f.write(f"{len(ins.volumes)}\n")
        for vf in ins.volumes:
            f.write(vf.vdb_file + "\n")
            f.write(f"{len(vf.instances)}\n")
            for row in vf.instances:
                f.write(" ".join(f"{v:g}" for v in row) + "\n")


def instance_transform(grid_xform: np.ndarray, pos, quat, scale) -> np.ndarray:
    """Index->world transform for one instance (main.cpp:1063-1099):
    grid linear part (translation zeroed), scaled, rotated by the
    quaternion, translated to the instance position.  Row-vector mat4.
    """
    g0 = np.array(grid_xform, np.float64)
    g0[3, :3] = 0.0
    s = np.diag([scale, scale, scale, 1.0])
    r = np_quaternion_to_mat4(np.asarray(quat, np.float32)).astype(np.float64)
    m = g0 @ s @ r
    m[3, :3] = np.asarray(pos, np.float64)
    return m


def read_ins_host(path: str, base_dir: str | None = None):
    """Host-side .ins contents: (host_grids, grid_ids, xforms, lights).

    ``lights`` is a PointLights for the lights variant (with
    host_grids/ids/xforms describing the default procedural volume,
    main.cpp:989-1018 empty_volume) and None for the volumes variant.
    This is the pre-device form build_scene AND the beyond-HBM
    builders (parallel.instance_shard) consume."""
    from vpt_tpu.lights.lights import PointLights
    from vpt_tpu.volume.grid import load_vdb_grid
    from vpt_tpu.volume.procedural import default_procedural_grid

    base_dir = base_dir or os.path.dirname(os.path.abspath(path))
    ins = read_ins(path)

    if ins.lights is not None:
        lights = PointLights.make(ins.lights[:, 0:3], ins.lights[:, 3:6],
                                  ins.lights[:, 6])
        g = default_procedural_grid()
        return [g], [0], [g.transform], lights

    host_grids = []
    grid_ids, xforms = [], []
    for gi, vf in enumerate(ins.volumes):
        p = vf.vdb_file
        if not os.path.isabs(p):
            p = os.path.join(base_dir, p)
        host_grids.append(load_vdb_grid(p))
        for row in vf.instances:
            grid_ids.append(gi)
            xforms.append(instance_transform(
                host_grids[gi].transform, row[0:3], row[3:7], row[7]))
    return host_grids, grid_ids, xforms, None


def load_ins_scene(path: str, base_dir: str | None = None, **scene_kw):
    """Build a Scene from a .ins file (volumes or lights variant)."""
    from vpt_tpu.scene.scene import build_scene

    host_grids, grid_ids, xforms, lights = read_ins_host(path, base_dir)
    if lights is not None:
        # light variant: point lights + the default procedural volume
        grids = [scene_kw.pop("host_grid", None) or host_grids[0]]
        return build_scene(grids, lights=lights, **scene_kw)
    return build_scene(host_grids, instance_grid_ids=np.array(grid_ids),
                       instance_xforms=xforms, **scene_kw)
