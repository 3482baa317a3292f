"""Houdini-side `.ins` emitter — the Python equivalent of the HDK
`VPT_Instance` ROP (instancer_hda/ROP_VPT_Instance.cpp:160-238 +
file_IO.cpp:56-226), usable as a Python SOP/ROP snippet inside Houdini
or standalone from numpy arrays.

Attribute priority matches file_IO.cpp (and instancer_hda/README.md):
  * `instancefile` (string, REQUIRED) — the VDB each point instances
  * scale: `pscale` (default 1)
  * rotation: `orient` quaternion, else `rot` quaternion, else a frame
    built from `N` (default +z) and `up` (default +y)
  * lights variant: `P`, `Cd`, `power` points

Inside Houdini:
    from vpt_tpu.dcc.houdini_rop import save_sop_to_ins
    save_sop_to_ins(hou.node('/obj/geo1/OUT'), '$HIP/render/inst.ins')
"""

from __future__ import annotations

import numpy as np


def _quat_from_zup(normal, up):
    """Quaternion rotating +z to `normal` with `up` as the up hint —
    UT_Matrix3F::orient + updateFromRotationMatrix (file_IO.cpp:137-143).
    Returns (x, y, z, w)."""
    z = np.asarray(normal, np.float64)
    z = z / max(np.linalg.norm(z), 1e-12)
    u = np.asarray(up, np.float64)
    x = np.cross(u, z)
    n = np.linalg.norm(x)
    if n < 1e-9:  # up parallel to normal: pick any perpendicular
        x = np.cross([1.0, 0.0, 0.0] if abs(z[0]) < 0.9 else [0.0, 1.0, 0.0],
                     z)
        n = np.linalg.norm(x)
    x = x / n
    y = np.cross(z, x)
    m = np.stack([x, y, z])  # rows = rotated basis
    # Shepperd's method
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        qx = (m[1, 2] - m[2, 1]) / s
        qy = (m[2, 0] - m[0, 2]) / s
        qz = (m[0, 1] - m[1, 0]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[1, 2] - m[2, 1]) / s
        qx = 0.25 * s
        qy = (m[1, 0] + m[0, 1]) / s
        qz = (m[2, 0] + m[0, 2]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[2, 0] - m[0, 2]) / s
        qx = (m[1, 0] + m[0, 1]) / s
        qy = 0.25 * s
        qz = (m[2, 1] + m[1, 2]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[0, 1] - m[1, 0]) / s
        qx = (m[2, 0] + m[0, 2]) / s
        qy = (m[2, 1] + m[1, 2]) / s
        qz = 0.25 * s
    return np.array([qx, qy, qz, w])


def points_to_ins(instancefile, P, pscale=None, orient=None, rot=None,
                  N=None, up=None):
    """Build an InsFile from per-point arrays (file_IO.cpp:56-187).

    instancefile: list[str] per point; P: (n, 3); the rest optional
    per-point arrays following the reference's priority rules.
    """
    from vpt_tpu.scene.ins import InsFile, InsVolumeFile
    P = np.asarray(P, np.float64).reshape(-1, 3)
    n = P.shape[0]
    if len(instancefile) != n:
        raise ValueError("instancefile must be per-point")

    def row(i):
        s = 1.0 if pscale is None else float(pscale[i])
        if orient is not None:
            q = np.asarray(orient[i], np.float64)
        elif rot is not None:
            q = np.asarray(rot[i], np.float64)
        else:
            nrm = [0.0, 0.0, 1.0] if N is None else N[i]
            u = [0.0, 1.0, 0.0] if up is None else up[i]
            q = _quat_from_zup(nrm, u)
        return np.concatenate([P[i], q, [s]])

    # unique files, sorted (file_IO.cpp:90-92)
    uniq = sorted(set(instancefile))
    volumes = []
    for vdb in uniq:
        rows = np.stack([row(i) for i in range(n)
                         if instancefile[i] == vdb])
        volumes.append(InsVolumeFile(vdb_file=vdb, instances=rows))
    return InsFile(volumes=volumes)


def lights_to_ins(P, Cd=None, power=None):
    """Lights variant (light_save, file_IO.cpp:189-226)."""
    from vpt_tpu.scene.ins import InsFile
    P = np.asarray(P, np.float64).reshape(-1, 3)
    n = P.shape[0]
    Cd = np.ones((n, 3)) if Cd is None else np.asarray(Cd, np.float64)
    power = np.ones(n) if power is None else np.asarray(power, np.float64)
    rows = np.concatenate([P, Cd.reshape(n, 3),
                           power.reshape(n, 1)], axis=1)
    return InsFile(lights=rows)


def save_sop_to_ins(node, path: str, lights: bool = False):
    """Cook a Houdini SOP and write its points as a `.ins` file — the
    ROP_VPT_Instance::renderFrame equivalent.  Requires `hou` (run
    inside Houdini)."""
    import hou  # noqa: F401  (only available inside Houdini)
    from vpt_tpu.scene.ins import write_ins

    geo = node.geometry()

    def attr(name, size):
        a = geo.findPointAttrib(name)
        if a is None:
            return None
        vals = geo.pointFloatAttribValues(name)
        return np.asarray(vals, np.float64).reshape(-1, size)

    P = attr("P", 3)
    if lights:
        ins = lights_to_ins(P, attr("Cd", 3),
                            attr("power", 1))
    else:
        sa = geo.findPointAttrib("instancefile")
        if sa is None:
            raise ValueError("points need an 'instancefile' attribute "
                             "(instancer_hda/README.md)")
        files = list(geo.pointStringAttribValues("instancefile"))
        ps = attr("pscale", 1)
        ins = points_to_ins(
            files, P,
            pscale=None if ps is None else ps[:, 0],
            orient=attr("orient", 4), rot=attr("rot", 4),
            N=attr("N", 3), up=attr("up", 3))
    write_ins(path, ins)
    return path
