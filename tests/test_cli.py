"""CLI end-to-end: `vpt render` writes an image (the batch analog of
the reference app's scene dispatch + save, main.cpp:1252-1297,
1782-1795)."""

import os

import numpy as np
import pytest


def test_cli_render_procedural(tmp_path):
    from vpt_tpu.app.cli import main
    out = tmp_path / "out.png"
    main(["render", "procedural", "-o", str(out), "--spp", "2",
          "--width", "48", "--height", "48", "--ray-depth", "3",
          "--env-type", "constant", "--cpu",
          "--light", "2", "5", "6", "1", "1", "1", "40"])
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (48, 48)
    assert img.max() > 0


def test_cli_render_cached_shadow_mode(tmp_path):
    from vpt_tpu.app.cli import main
    out = tmp_path / "cached.png"
    main(["render", "procedural", "-o", str(out), "--spp", "2",
          "--width", "48", "--height", "48", "--ray-depth", "3",
          "--env-type", "black", "--cpu", "--shadow-mode", "cached",
          "--light", "2", "5", "6", "1", "1", "1", "40"])
    assert out.exists()


def test_cli_render_inst_sharded(tmp_path):
    """--inst-shards N: the beyond-HBM scene-sharding path from the
    CLI — a procedural grid splits into exact-sum slabs over a
    4-device ('inst',) mesh and renders to a PNG."""
    import jax
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from vpt_tpu.app.cli import main
    out = tmp_path / "shard.png"
    main(["render", "procedural", "-o", str(out), "--spp", "2",
          "--width", "32", "--height", "32", "--ray-depth", "3",
          "--env-type", "constant", "--cpu", "--inst-shards", "4",
          "--light", "2", "5", "6", "1", "1", "1", "40"])
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (32, 32)
    assert img.max() > 0

    # v1 scope is fenced with clear errors
    with pytest.raises(SystemExit, match="tracked shadows"):
        main(["render", "procedural", "-o", str(out), "--cpu",
              "--inst-shards", "4", "--shadow-mode", "cached"])


def test_cli_parser_covers_new_flags():
    from vpt_tpu.app.cli import build_parser
    ap = build_parser()
    a = ap.parse_args(["render", "x.vdb", "--bake-sky",
                       "--shadow-mode", "cached", "--aov", "cost"])
    assert a.bake_sky and a.shadow_mode == "cached"
    v = ap.parse_args(["view", "x.vdb", "--shadow-mode", "cached"])
    assert v.shadow_mode == "cached"


def test_cli_checkpoint_resume_bit_identical(tmp_path):
    """--checkpoint-every / --resume: a render killed at 2 spp and
    resumed to 4 is BIT-identical to an uninterrupted 4-spp run
    (deterministic per-iteration seeding; VERDICT r4 #9 /
    main.cpp:1699 auto-save analog)."""
    from vpt_tpu.app.cli import main
    common = ["--spp", "4", "--width", "32", "--height", "32",
              "--ray-depth", "3", "--env-type", "constant", "--cpu",
              "--light", "2", "5", "6", "1", "1", "1", "40",
              "--save-exr"]
    ref = tmp_path / "ref.png"
    main(["render", "procedural", "-o", str(ref)] + common)

    # interrupted run: checkpoint every 2 spp, stop at 2
    part = tmp_path / "part.png"
    ckpt = tmp_path / "part.ckpt.npz"
    main(["render", "procedural", "-o", str(part),
          "--checkpoint-every", "2"]
         + [a if a != "4" else "2" for a in common])
    assert ckpt.exists()

    # resume to 4 spp total
    out = tmp_path / "resumed.png"
    main(["render", "procedural", "-o", str(out), "--resume", str(ckpt)]
         + common)

    from vpt_tpu.utils.exr import read_exr_rgb
    a = read_exr_rgb(str(tmp_path / "ref.exr"))
    b = read_exr_rgb(str(tmp_path / "resumed.exr"))
    np.testing.assert_array_equal(a, b)


def test_cli_union_mode(tmp_path):
    """`vpt render scene.ins --union RES`: the instanced scene collapses
    onto the world union grid (volume/union.py) with the measured field
    error logged (QUIRKS #30 promotion surface)."""
    import numpy as np

    from vpt_tpu.app.cli import main
    from vpt_tpu.scene.ins import InsFile, InsVolumeFile, write_ins
    rows = []
    rng = np.random.RandomState(5)
    for i in range(4):
        pos = rng.uniform(-2, 2, 3)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        rows.append([*pos, *q, rng.uniform(0.6, 1.2)])
    ins = tmp_path / "cloud.ins"
    write_ins(str(ins), InsFile(volumes=[InsVolumeFile(
        vdb_file="/root/reference/assets/dragon.vdb",
        instances=np.array(rows))]))
    out = tmp_path / "union.png"
    main(["render", str(ins), "-o", str(out), "--spp", "2",
          "--width", "32", "--height", "32", "--ray-depth", "3",
          "--env-type", "constant", "--cpu", "--union", "96"])
    assert out.exists()
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.max() > 0
