"""Measure ray sorting + tile size + local_majorant on the TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PROFILE_BASELINE"] = "0"
from tools.profile_fused import P, bench  # noqa: E402

F = P  # while mode, budget 128
for sort in (False, True):
    for tile in (16384, 32768, 65536):
        bench(F.replace(sort_rays=sort, fused_tile=tile),
              f"sort={int(sort)}/tile={tile}", iters=16)
bench(F.replace(sort_rays=True, fused_tile=16384, local_majorant=True),
      "sort/16384/localmaj", iters=16)
bench(F.replace(sort_rays=True, fused_tile=8192), "sort/8192", iters=16)
bench(F.replace(sort_rays=True, fused_tile=4096), "sort/4096", iters=16)
