"""PIZ decompression (OpenEXR's wavelet + Huffman codec) in pure
numpy/Python — decodes the reference's density_color_texture.exr (and
any PIZ scanline EXR, the default compression of many DCCs).

Implements the decode side of ImfPizCompressor/ImfHuf/ImfWav from the
OpenEXR file-format specification:

  block := u16 minNonZero | u16 maxNonZero
         | bitmap[min..max] (1 bit per used 16-bit value)
         | i32 length | huf data
  huf   := u32 im | u32 iM | u32 tableLength | u32 nBits | u32 pad
         | packed code-length table (6-bit lengths, zero-run codes)
         | bitstream (MSB-first), symbol iM acts as the RLE escape
  per channel: 2-D Haar-style wavelet (wdec14 / wdec16) inverse
  finally: reverse-LUT from the bitmap maps dense indices back to
  16-bit values (half bits for HALF channels).
"""

from __future__ import annotations

import struct

import numpy as np

USHORT_RANGE = 1 << 16
BITMAP_SIZE = USHORT_RANGE >> 3
HUF_ENCBITS = 16
HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1
SHORT_ZEROCODE_RUN = 59
LONG_ZEROCODE_RUN = 63
SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN
A_OFFSET = 1 << (16 - 1)
MOD_MASK = (1 << 16) - 1
NBITS = 16
A_OFFSET14 = 1 << (14 - 1)
MOD_MASK14 = (1 << 14) - 1


class _BitReader:
    """MSB-first bit reader (ImfHuf getChar/getCode accumulator)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.c = 0
        self.lc = 0

    def read_bits(self, n: int) -> int:
        while self.lc < n:
            if self.pos >= len(self.data):
                raise ValueError("PIZ: bitstream exhausted")
            self.c = (self.c << 8) | self.data[self.pos]
            self.pos += 1
            self.lc += 8
        self.lc -= n
        return (self.c >> self.lc) & ((1 << n) - 1)


def _unpack_enc_table(br: _BitReader, im: int, iM: int) -> np.ndarray:
    """hufUnpackEncTable: 6-bit code lengths with zero-run escapes."""
    lengths = np.zeros(HUF_ENCSIZE, np.int64)
    i = im
    while i <= iM:
        l = br.read_bits(6)
        if l == LONG_ZEROCODE_RUN:
            zerun = br.read_bits(8) + SHORTEST_LONG_RUN
            i += zerun
        elif l >= SHORT_ZEROCODE_RUN:
            i += l - SHORT_ZEROCODE_RUN + 2
        else:
            lengths[i] = l
            i += 1
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """hufCanonicalCodeTable: canonical codes from code lengths."""
    n = np.zeros(59, np.int64)
    for l in lengths[lengths > 0]:
        n[l] += 1
    c = 0
    start = np.zeros(59, np.int64)
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        start[i] = c
        c = nc
    codes = np.zeros(HUF_ENCSIZE, np.int64)
    counter = start.copy()
    for i in range(HUF_ENCSIZE):
        l = int(lengths[i])
        if l > 0:
            codes[i] = counter[l]
            counter[l] += 1
    return codes


def _huf_decode(data: bytes, n_out: int) -> np.ndarray:
    """hufUncompress: header + table + canonical-code bit decode."""
    im, iM, _table_len, n_bits = struct.unpack_from("<IIII", data, 0)
    br = _BitReader(data[20:])
    lengths = _unpack_enc_table(br, im, iM)
    codes = _canonical_codes(lengths)
    # the bitstream starts at the next whole byte after the packed
    # table (hufUnpackEncTable leaves *pcode at the byte after the
    # last consumed one; leftover accumulator bits are discarded)
    br = _BitReader(data[20 + br.pos:])

    # decode map {(length, code) -> symbol}
    table: dict[tuple[int, int], int] = {}
    for sym in np.nonzero(lengths)[0]:
        table[(int(lengths[sym]), int(codes[sym]))] = int(sym)

    out = np.zeros(n_out, np.uint16)
    k = 0
    rlc = iM
    c = 0
    lc = 0
    bits_left = n_bits
    while k < n_out and bits_left > 0:
        c = (c << 1) | br.read_bits(1)
        lc += 1
        bits_left -= 1
        sym = table.get((lc, c))
        if sym is None:
            if lc > 58:
                raise ValueError("PIZ: invalid Huffman code")
            continue
        c = 0
        lc = 0
        if sym == rlc:  # run-length escape: repeat previous value
            if bits_left < 8:
                raise ValueError("PIZ: truncated RLE count")
            run = br.read_bits(8)
            bits_left -= 8
            if k == 0:
                raise ValueError("PIZ: RLE with no previous value")
            out[k:k + run] = out[k - 1]
            k += run
        else:
            out[k] = sym
            k += 1
    if k < n_out:
        raise ValueError(f"PIZ: Huffman underrun ({k}/{n_out})")
    return out


def _wdec14(l, h):
    ls = l.astype(np.int16).astype(np.int32)
    hs = h.astype(np.int16).astype(np.int32)
    hi = hs
    ai = ls + (hi & 1) + (hi >> 1)
    a = ai
    b = ai - hi
    return a.astype(np.uint16), b.astype(np.uint16)


def _wdec16(l, h):
    m = l.astype(np.int64)
    d = h.astype(np.int64)
    bb = (m - (d >> 1)) & MOD_MASK
    aa = (d + bb - A_OFFSET) & MOD_MASK
    return aa.astype(np.uint16), bb.astype(np.uint16)


def _wav2_decode(buf: np.ndarray, nx: int, ny: int, maxval: int):
    """wav2Decode (ImfWav.cpp): inverse 2-D wavelet, in place on a
    (ny, nx) u16 plane.  Faithful level/quad structure: levels run on
    p = largest power of two <= MIN(nx, ny) down to 1, each level
    combining 2x2 quads plus odd-row/column remainders.  Vectorized
    per level (quad index grids)."""
    dec = _wdec16 if maxval >= (1 << 14) else _wdec14
    a = buf.reshape(ny, nx)
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1

    while p >= 1:
        ys = np.arange(0, ny - p2 + 1, p2)      # rows with a p-pair below
        xs = np.arange(0, nx - p2 + 1, p2)      # cols with a p-pair right
        if len(ys) and len(xs):
            yy, xx = np.meshgrid(ys, xs, indexing="ij")
            i00, i10 = dec(a[yy, xx], a[yy + p, xx])
            i01, i11 = dec(a[yy, xx + p], a[yy + p, xx + p])
            a00, a01 = dec(i00, i01)
            a10, a11 = dec(i10, i11)
            a[yy, xx], a[yy, xx + p] = a00, a01
            a[yy + p, xx], a[yy + p, xx + p] = a10, a11
        if (nx & p) and len(ys):
            # odd remainder column at x = nx - (nx & p)? the reference
            # continues past ex: px ended at the first x with no pair
            x = len(xs) * p2
            if x < nx:
                aa, bb = dec(a[ys, x], a[ys + p, x])
                a[ys, x], a[ys + p, x] = aa, bb
        if ny & p:
            y = len(ys) * p2
            if y < ny:
                xs2 = np.arange(0, nx - p2 + 1, p2)
                if len(xs2):
                    aa, bb = dec(a[y, xs2], a[y, xs2 + p])
                    a[y, xs2], a[y, xs2 + p] = aa, bb
        p2 = p
        p >>= 1
    return a


def piz_decompress(raw: bytes, nx: int, ny: int, n_channels: int
                   ) -> np.ndarray:
    """Decode one PIZ block -> (n_channels, ny, nx) uint16 (HALF bits;
    all channels assumed 16-bit as in HALF images)."""
    min_nz, max_nz = struct.unpack_from("<HH", raw, 0)
    pos = 4
    bitmap = np.zeros(BITMAP_SIZE, np.uint8)
    if min_nz <= max_nz:
        nbytes = max_nz - min_nz + 1
        bitmap[min_nz:max_nz + 1] = np.frombuffer(raw[pos:pos + nbytes],
                                                  np.uint8)
        pos += nbytes
    (length,) = struct.unpack_from("<i", raw, pos)
    pos += 4

    # reverse LUT from bitmap (reverseLutFromBitmap)
    bits = np.unpackbits(bitmap, bitorder="little")
    used = np.nonzero(bits)[0]
    if len(used) == 0 or used[0] != 0:
        used = np.concatenate([[0], used])  # zero is always present
    rev_lut = used.astype(np.uint16)
    maxval = len(used) - 1

    n_out = nx * ny * n_channels
    data = _huf_decode(raw[pos:pos + length], n_out)

    chans = data.reshape(n_channels, ny, nx).copy()
    for c in range(n_channels):
        _wav2_decode(chans[c], nx, ny, maxval)
    # apply reverse LUT
    return rev_lut[np.minimum(chans, maxval)]
