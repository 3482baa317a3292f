// Native codec for the OpenVDB loader — the C++ data-loader component
// (the reference's loader is C++ via OpenVDB/blosc, gpu_vdb.cpp:105-472).
//
// Exposes a C ABI consumed through ctypes (vpt_tpu/utils/compression.py):
//   lz4_decompress_block : raw LZ4 block decode (c-blosc's codec)
//   blosc_decompress     : full blosc1 chunk decode (header, block
//                          splits, byte-unshuffle)
//
// Build: make -C native   (produces native/build/libvdb_codec.so)

#include <cstdint>
#include <cstring>

extern "C" {

// Decompress one raw LZ4 block (no frame). Returns bytes written, or
// -1 on malformed input / overflow.
int lz4_decompress_block(const char* src, int src_len, char* dst,
                         int dst_cap) {
    const uint8_t* s = reinterpret_cast<const uint8_t*>(src);
    uint8_t* d = reinterpret_cast<uint8_t*>(dst);
    int si = 0, di = 0;
    while (si < src_len) {
        uint8_t token = s[si++];
        // literals
        int lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (si >= src_len) return -1;
                b = s[si++];
                lit += b;
            } while (b == 255);
        }
        if (si + lit > src_len || di + lit > dst_cap) return -1;
        std::memcpy(d + di, s + si, lit);
        si += lit;
        di += lit;
        if (si >= src_len) break;  // block may end on literals
        // match
        if (si + 2 > src_len) return -1;
        int offset = s[si] | (s[si + 1] << 8);
        si += 2;
        if (offset == 0 || offset > di) return -1;
        int mlen = token & 0xF;
        if (mlen == 15) {
            uint8_t b;
            do {
                if (si >= src_len) return -1;
                b = s[si++];
                mlen += b;
            } while (b == 255);
        }
        mlen += 4;
        if (di + mlen > dst_cap) return -1;
        int mi = di - offset;
        if (offset >= mlen) {
            std::memcpy(d + di, d + mi, mlen);
            di += mlen;
        } else {
            for (int k = 0; k < mlen; ++k) d[di++] = d[mi++];
        }
    }
    return di;
}

// blosc1 chunk decode (LZ4 codec + optional byte shuffle + block
// splitting). Returns bytes written or -1.
int blosc_decompress(const char* chunk, int chunk_len, char* dst,
                     int dst_cap) {
    if (chunk_len < 16) return -1;
    const uint8_t* c = reinterpret_cast<const uint8_t*>(chunk);
    uint8_t flags = c[2];
    int typesize = c[3];
    uint32_t nbytes, blocksize, cbytes;
    std::memcpy(&nbytes, c + 4, 4);
    std::memcpy(&blocksize, c + 8, 4);
    std::memcpy(&cbytes, c + 12, 4);
    if ((int)nbytes > dst_cap) return -1;
    if (nbytes == 0) return 0;
    if (flags & 0x2) {  // memcpyed
        if (16 + nbytes > (uint32_t)chunk_len) return -1;
        std::memcpy(dst, c + 16, nbytes);
        return (int)nbytes;
    }
    int codec = (flags >> 5) & 0x7;
    bool shuffle = flags & 0x1;
    if (flags & 0x4) return -1;  // bit-shuffle unsupported
    if (codec != 0 && codec != 1) return -1;  // blosclz(0 not impl)/lz4
    if (codec == 0) return -1;

    int nblocks = (nbytes + blocksize - 1) / blocksize;
    const uint32_t* bstarts = reinterpret_cast<const uint32_t*>(c + 16);

    // scratch for one shuffled block
    static thread_local uint8_t* scratch = nullptr;
    static thread_local uint32_t scratch_cap = 0;
    if (shuffle && blocksize > scratch_cap) {
        delete[] scratch;
        scratch = new uint8_t[blocksize];
        scratch_cap = blocksize;
    }

    for (int j = 0; j < nblocks; ++j) {
        uint32_t bnb = blocksize;
        if ((uint32_t)(j + 1) * blocksize > nbytes)
            bnb = nbytes - j * blocksize;
        uint32_t block_end = (j + 1 < nblocks) ? bstarts[j + 1] : cbytes;
        uint8_t* outp = shuffle ? scratch
                                : reinterpret_cast<uint8_t*>(dst)
                                      + (size_t)j * blocksize;
        // detect split layout by walking candidates
        int done = -1;
        int cand[2] = {typesize > 1 && bnb % typesize == 0 ? typesize : 1, 1};
        for (int ci = 0; ci < 2 && done < 0; ++ci) {
            int nsplits = cand[ci];
            uint32_t split = bnb / nsplits;
            uint32_t pos = bstarts[j];
            bool ok = true;
            uint32_t written = 0;
            for (int sx = 0; sx < nsplits && ok; ++sx) {
                if (pos + 4 > (uint32_t)chunk_len) { ok = false; break; }
                int32_t csz;
                std::memcpy(&csz, c + pos, 4);
                pos += 4;
                if (csz <= 0 || pos + csz > (uint32_t)chunk_len) {
                    ok = false;
                    break;
                }
                if ((uint32_t)csz == split) {
                    std::memcpy(outp + written, c + pos, split);
                } else {
                    int n = lz4_decompress_block(
                        reinterpret_cast<const char*>(c + pos), csz,
                        reinterpret_cast<char*>(outp + written), split);
                    if (n != (int)split) { ok = false; break; }
                }
                pos += csz;
                written += split;
            }
            if (ok && pos == block_end) done = nsplits;
        }
        if (done < 0) return -1;
        if (shuffle) {
            // byte unshuffle: out[i] = scratch[(i % ts)*nel + i/ts]
            uint32_t nel = bnb / typesize;
            uint8_t* dest = reinterpret_cast<uint8_t*>(dst)
                            + (size_t)j * blocksize;
            for (int tsx = 0; tsx < typesize; ++tsx) {
                const uint8_t* srcp = scratch + (size_t)tsx * nel;
                for (uint32_t e = 0; e < nel; ++e)
                    dest[(size_t)e * typesize + tsx] = srcp[e];
            }
            uint32_t tail = bnb - nel * typesize;
            if (tail)
                std::memcpy(dest + (size_t)nel * typesize,
                            scratch + bnb - tail, tail);
        }
    }
    return (int)nbytes;
}

}  // extern "C"
