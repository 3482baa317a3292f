"""Decompression codecs for OpenVDB streams: zlib, blosc(+lz4), zstd.

OpenVDB (>= file version 223) compresses leaf buffers with c-blosc
using the LZ4 codec and byte-shuffle.  This environment has no
``blosc``/``lz4`` Python modules, so we implement the decode path
ourselves: a blosc1 chunk parser, an LZ4-block decompressor, and the
byte-unshuffle filter (numpy transpose).

Pure-Python LZ4 is the fallback; when the native helper library
(native/vdb_codec) has been built it is used instead for large files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

# blosc1 header flag bits
_BLOSC_BYTE_SHUFFLE = 0x1
_BLOSC_MEMCPYED = 0x2
_BLOSC_BIT_SHUFFLE = 0x4
# codec id lives in bits 5-7
_BLOSC_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}

_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    import ctypes
    import os

    lib = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                       "build", "libvdb_codec.so")
    lib = os.path.abspath(lib)
    if (not os.path.exists(lib)
            and os.environ.get("VPT_NO_NATIVE_BUILD", "0") != "1"):
        # auto-build on first use: native/build is gitignored, so fresh
        # checkouts (the bench driver) would otherwise silently fall
        # back to the numpy sweeps (~8x slower scene builds)
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.dirname(
                os.path.dirname(lib))], capture_output=True, timeout=120,
                check=False)
        except (OSError, subprocess.TimeoutExpired):
            pass
    if os.path.exists(lib):
        try:
            dll = ctypes.CDLL(lib)
            dll.lz4_decompress_block.restype = ctypes.c_int
            dll.lz4_decompress_block.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
            ]
            dll.blosc_decompress.restype = ctypes.c_int
            dll.blosc_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
            ]
            dll.vdb_decode_leaves.restype = ctypes.c_int
            dll.vdb_decode_leaves.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
            ]
            dll.grow_empty_boxes.restype = ctypes.c_int
            dll.grow_empty_boxes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p,
            ]
            if hasattr(dll, "grow_octant_boxes"):  # newer .so builds
                dll.grow_octant_boxes.restype = ctypes.c_int
                dll.grow_octant_boxes.argtypes = (
                    dll.grow_empty_boxes.argtypes)
            _native = dll
            return dll
        except (OSError, AttributeError):
            pass
    _native = False
    return False


def lz4_decompress_block(src: bytes, dst_size: int) -> bytes:
    """Decompress one raw LZ4 block (no frame header)."""
    native = _load_native()
    if native:
        import ctypes

        out = ctypes.create_string_buffer(dst_size)
        n = native.lz4_decompress_block(src, len(src), out, dst_size)
        if n != dst_size:
            raise ValueError(f"native lz4: got {n}, expected {dst_size}")
        return out.raw
    return _lz4_decompress_py(src, dst_size)


def _lz4_decompress_py(src: bytes, dst_size: int) -> bytes:
    """Pure-Python LZ4 block decode (spec: lz4_Block_format.md)."""
    dst = bytearray(dst_size)
    si, di, n = 0, 0, len(src)
    while si < n:
        token = src[si]
        si += 1
        # literals
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[si]
                si += 1
                lit_len += b
                if b != 255:
                    break
        dst[di:di + lit_len] = src[si:si + lit_len]
        si += lit_len
        di += lit_len
        if si >= n:
            break  # last block ends with literals only
        # match
        offset = src[si] | (src[si + 1] << 8)
        si += 2
        match_len = token & 0xF
        if match_len == 15:
            while True:
                b = src[si]
                si += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        mi = di - offset
        if offset >= match_len:  # non-overlapping fast path
            dst[di:di + match_len] = dst[mi:mi + match_len]
            di += match_len
        else:
            for _ in range(match_len):
                dst[di] = dst[mi]
                di += 1
                mi += 1
    if di != dst_size:
        raise ValueError(f"lz4: decoded {di} bytes, expected {dst_size}")
    return bytes(dst)


def _byte_unshuffle(data: bytes, typesize: int) -> bytes:
    """Inverse of blosc's byte shuffle filter."""
    arr = np.frombuffer(data, dtype=np.uint8)
    nelem = len(data) // typesize
    tail = arr[nelem * typesize:]
    body = arr[: nelem * typesize].reshape(typesize, nelem).T.reshape(-1)
    return body.tobytes() + tail.tobytes()


def blosc_decompress(chunk: bytes) -> bytes:
    """Decompress a blosc1 chunk (as written by OpenVDB).

    Uses the native C++ decoder (native/vdb_codec) when built; falls
    back to the pure-Python implementation."""
    if len(chunk) < 16:
        raise ValueError("blosc chunk too small")
    version, versionlz, flags, typesize = chunk[0], chunk[1], chunk[2], chunk[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", chunk, 4)

    native = _load_native()
    if native and nbytes:
        import ctypes

        out = ctypes.create_string_buffer(nbytes)
        n = native.blosc_decompress(chunk, len(chunk), out, nbytes)
        if n == nbytes:
            return out.raw
        # native decoder declined (unsupported codec) -> python path
    if nbytes == 0:
        return b""
    if flags & _BLOSC_MEMCPYED:
        return chunk[16:16 + nbytes]
    codec = _BLOSC_CODECS.get((flags >> 5) & 0x7, "?")
    shuffle = bool(flags & _BLOSC_BYTE_SHUFFLE)
    if flags & _BLOSC_BIT_SHUFFLE:
        raise NotImplementedError("blosc bit-shuffle not supported")

    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", chunk, 16)
    out = bytearray(nbytes)

    def _decode_stream(raw: bytes, size: int, csize: int) -> bytes:
        if csize == size:
            return raw[:size]  # stored verbatim (compression didn't help)
        if codec == "lz4":
            return lz4_decompress_block(raw, size)
        if codec == "zlib":
            return zlib.decompress(raw)
        if codec == "zstd":
            if _zstd is None:
                raise NotImplementedError("zstd codec unavailable")
            return _zstd.ZstdDecompressor().decompress(raw, max_output_size=size)
        raise NotImplementedError(f"blosc codec {codec}")

    for j in range(nblocks):
        block_nbytes = min(blocksize, nbytes - j * blocksize)
        block_end = (bstarts[j + 1] if j + 1 < nblocks else cbytes)
        # c-blosc's split_block() decides whether a block was written as
        # one stream or `typesize` sub-streams; the rule changed across
        # blosc versions, so detect by stream-layout consistency.
        candidates = [1]
        if (typesize > 1 and codec in ("blosclz", "lz4")
                and block_nbytes % typesize == 0):
            candidates.insert(0, typesize)
        decoded = None
        err = None
        for nsplits in candidates:
            split_size = block_nbytes // nsplits
            pos = bstarts[j]
            parts = []
            ok = True
            for _ in range(nsplits):
                if pos + 4 > len(chunk):
                    ok = False
                    break
                csize = struct.unpack_from("<i", chunk, pos)[0]
                pos += 4
                if csize <= 0 or pos + csize > len(chunk):
                    ok = False
                    break
                parts.append((chunk[pos:pos + csize], csize))
                pos += csize
            if not ok or pos != block_end:
                continue
            try:
                decoded = b"".join(
                    _decode_stream(raw, split_size, csize)
                    for raw, csize in parts)
                break
            except Exception as e:  # try the other split layout
                err = e
                decoded = None
        if decoded is None:
            raise ValueError(f"blosc block {j}: undecodable ({err})")
        if shuffle:
            decoded = _byte_unshuffle(decoded, typesize)
        start = j * blocksize
        out[start:start + block_nbytes] = decoded
    return bytes(out)


def zip_decompress(data: bytes) -> bytes:
    return zlib.decompress(data)
