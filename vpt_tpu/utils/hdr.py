"""Radiance .hdr (RGBE) loader — equivalent of source/hdr_loader.h.

Parses the header (hdr_loader.h:52-107), new-style RLE scanlines
(:109-191), old-style RLE scanlines ((1,1,1,n) repeat markers with
8-bit count shift escalation — canonical Radiance ``oldreadcolrs``
semantics), flat scanlines, and converts RGBE to float RGB
(:193-211).  Returns (H, W, 3) float32.
"""

from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    data = open(path, "rb").read()
    # ---- header ----------------------------------------------------------
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = data.index(b"\n") + 1
    while True:
        end = data.index(b"\n", pos)
        line = data[pos:end]
        pos = end + 1
        if line == b"":
            break
    # resolution line, e.g. "-Y 1024 +X 2048"
    end = data.index(b"\n", pos)
    res = data[pos:end].split()
    pos = end + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise NotImplementedError(f"unsupported orientation {res}")
    height = int(res[1])
    width = int(res[3])

    img = np.zeros((height, width, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bp = 0
    for y in range(height):
        # new-style RLE scanline marker: 0x02 0x02 hi lo
        if (width >= 8 and width < 0x8000 and buf[bp] == 2 and buf[bp + 1] == 2
                and ((int(buf[bp + 2]) << 8) | int(buf[bp + 3])) == width):
            bp += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(buf[bp])
                    bp += 1
                    if count > 128:  # run
                        img[y, x:x + count - 128, c] = buf[bp]
                        bp += 1
                        x += count - 128
                    else:           # literal
                        img[y, x:x + count, c] = buf[bp:bp + count]
                        bp += count
                        x += count
        else:
            # old format: flat RGBE pixels, with (1,1,1,n) OLD-STYLE RLE
            # repeat markers (repeat the previous pixel n << shift
            # times; consecutive markers escalate the shift by 8 bits —
            # Radiance oldreadcolrs).  Rows without a marker take the
            # vectorized flat path.
            cand = buf[bp:bp + width * 4]
            if (cand.size == width * 4
                    and not np.any((cand[0::4] == 1) & (cand[1::4] == 1)
                                   & (cand[2::4] == 1))):
                img[y] = cand.reshape(width, 4)
                bp += width * 4
            else:
                x = 0
                rshift = 0
                while x < width:
                    px = buf[bp:bp + 4]
                    bp += 4
                    if px[0] == 1 and px[1] == 1 and px[2] == 1:
                        if x == 0 and y == 0:
                            raise ValueError(
                                "old-style RLE repeat with no previous "
                                "pixel")
                        count = int(px[3]) << rshift
                        prev = img[y, x - 1] if x else img[y - 1, -1]
                        img[y, x:x + count] = prev
                        x += count
                        rshift += 8
                    else:
                        img[y, x] = px
                        x += 1
                        rshift = 0

    return rgbe_to_float(img)


def rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """hdr_loader.h:193-211: rgb = (mantissa+?)/256 * 2^(e-128).

    Uses the canonical ldexp(rgb, e-136) conversion (f = v * 2^(e-128-8)).
    """
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]
