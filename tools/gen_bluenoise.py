"""Generate the blue-noise jitter texture asset (void-and-cluster,
Ulichney 1993) — the replacement for the reference's BN0.bmp asset
(main.cpp:1378-1384).  Writes vpt_tpu/assets/bluenoise_128.npy with
shape (128, 128, 2) float32 in [0, 1): two independent rank textures
for the x/y pixel-jitter channels.

Run once: python tools/gen_bluenoise.py
"""

import os
import sys

import numpy as np

N_SIDE = 128
SIGMA = 1.9


def _wrapped_gaussian(n, sigma):
    ax = np.arange(n)
    d = np.minimum(ax, n - ax).astype(np.float64)
    dd = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-dd / (2.0 * sigma * sigma))


def void_and_cluster(n=N_SIDE, seed=0, frac=0.1, sigma=SIGMA):
    rng = np.random.default_rng(seed)
    N = n * n
    kern = _wrapped_gaussian(n, sigma)

    def energy_of(b):
        return np.real(np.fft.ifft2(np.fft.fft2(b) * np.fft.fft2(kern)))

    def toggle(e, p, sign):
        py, px = divmod(p, n)
        e += sign * np.roll(np.roll(kern, py, 0), px, 1)

    ones = int(N * frac)
    b = np.zeros((n, n))
    b.ravel()[rng.choice(N, ones, replace=False)] = 1
    e = energy_of(b)

    # phase 0: relax initial pattern (tightest cluster -> largest void)
    for _ in range(4 * ones):
        cl = int(np.argmax(np.where(b.ravel() == 1, e.ravel(), -np.inf)))
        b.ravel()[cl] = 0
        toggle(e, cl, -1)
        vd = int(np.argmin(np.where(b.ravel() == 0, e.ravel(), np.inf)))
        b.ravel()[vd] = 1
        toggle(e, vd, +1)
        if vd == cl:
            break

    rank = np.zeros(N, np.int64)
    # phase 1: peel ones off (ranks ones-1 .. 0)
    bb = b.copy()
    e1 = energy_of(bb)
    for r in range(ones - 1, -1, -1):
        cl = int(np.argmax(np.where(bb.ravel() == 1, e1.ravel(), -np.inf)))
        bb.ravel()[cl] = 0
        toggle(e1, cl, -1)
        rank[cl] = r
    # phase 2: fill voids (ranks ones .. N-1)
    bb = b.copy()
    e2 = energy_of(bb)
    for r in range(ones, N):
        vd = int(np.argmin(np.where(bb.ravel() == 0, e2.ravel(), np.inf)))
        bb.ravel()[vd] = 1
        toggle(e2, vd, +1)
        rank[vd] = r
    return ((rank.reshape(n, n) + 0.5) / N).astype(np.float32)


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vpt_tpu", "assets",
        "bluenoise_128.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tex = np.stack([void_and_cluster(seed=0),
                    void_and_cluster(seed=1)], axis=-1)
    np.save(out, tex)
    print("wrote", out, tex.shape, tex.dtype)


if __name__ == "__main__":
    sys.exit(main())
