"""Measure block tiling + local_majorant + tile size on the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PROFILE_BASELINE"] = "0"
from tools.profile_fused import P, bench  # noqa: E402

F = P
bench(F.replace(block_tiles=0, fused_tile=16384), "scan/16384", iters=16)
for blk, tile in ((128, 16384), (64, 16384), (128, 32768), (64, 4096),
                  (32, 4096)):
    bench(F.replace(block_tiles=blk, fused_tile=tile),
          f"blk={blk}/tile={tile}", iters=16)
bench(F.replace(block_tiles=128, fused_tile=16384, local_majorant=True),
      "blk=128/16384/localmaj", iters=16)
bench(F.replace(block_tiles=64, fused_tile=4096, local_majorant=True),
      "blk=64/4096/localmaj", iters=16)
