"""Measure cost-ordered block scheduling on the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PROFILE_BASELINE"] = "0"
from tools.profile_fused import P, bench  # noqa: E402

F = P
bench(F.replace(block_tiles=0, fused_tile=16384), "plain/16384", iters=16)
for blk, tile in ((64, 16384), (32, 16384), (64, 8192), (32, 8192),
                  (64, 32768), (128, 16384)):
    bench(F.replace(block_tiles=blk, fused_tile=tile),
          f"sched b={blk}/tile={tile}", iters=16)
