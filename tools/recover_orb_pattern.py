"""Recover the standard ORB rBRIEF pattern empirically from OpenCV.

Each ORB descriptor bit b is a binary test tau(p1, p2) = [I_blur(p1) <
I_blur(p2)] with (p1, p2) drawn from a fixed 256-pair learned table
(``bit_pattern_31_``; reference src/ORBextractor.cc:75-113 carries a
truncated/corrupted copy — see ops/brief_pattern.py). Running cv2.ORB over
K random images at angle=0 gives K observations of each bit; the test pair
is identified as the argmax-agreement candidate over all ordered pixel
pairs in a window around the keypoint. OpenCV's fixed-point Gaussian blur
rounds +-1 differently from cv2.GaussianBlur on near-ties, so exact
consistency fails on a few images per bit; the argmax with a 2x+20 margin
over the runner-up is unambiguous at K=768.

Regenerates ops/brief_pattern.py's table; run offline, needs cv2.
"""

import numpy as np
import cv2

K = 768
R = 20
W = 2 * R + 1
NP_ = W * W
N_WORDS = (K + 63) // 64


def recover() -> np.ndarray:
    rng = np.random.default_rng(123)
    cx = cy = 60
    Gp = np.zeros((N_WORDS, NP_, NP_), np.uint64)   # packed [I(i)<I(j)] per image
    Tb = np.zeros((N_WORDS, 256), np.uint64)        # packed descriptor bits
    orb = cv2.ORB_create(nfeatures=10)
    for k in range(K):
        img = rng.integers(0, 256, size=(121, 121), dtype=np.uint8)
        kp = cv2.KeyPoint(float(cx), float(cy), 31.0, 0.0, 0.0, 0)
        _, desc = orb.compute(img, [kp])
        bits = np.unpackbits(desc[0], bitorder="little")
        blur = cv2.GaussianBlur(img, (7, 7), 2, sigmaY=2,
                                borderType=cv2.BORDER_REFLECT_101)
        v = blur[cy - R:cy + R + 1, cx - R:cx + R + 1].astype(np.int16).ravel()
        less = v[:, None] < v[None, :]
        w, s = k // 64, np.uint64(k % 64)
        Gp[w] |= less.astype(np.uint64) << s
        Tb[w] |= bits.astype(np.uint64) << s

    pairs = []
    for b in range(256):
        dis = np.zeros((NP_, NP_), np.int32)
        for w in range(N_WORDS):
            dis += np.bitwise_count(Gp[w] ^ Tb[w, b]).astype(np.int32)
        flat = dis.ravel()
        order = np.argpartition(flat, 2)[:2]
        order = order[np.argsort(flat[order])]
        best, second = int(flat[order[0]]), int(flat[order[1]])
        assert best <= 30 and second >= 2 * best + 20, (b, best, second)
        i, j = divmod(int(order[0]), NP_)
        y1, x1 = divmod(i, W)
        y2, x2 = divmod(j, W)
        pairs.append((x1 - R, y1 - R, x2 - R, y2 - R))
    return np.asarray(pairs, np.int32)


if __name__ == "__main__":
    pat = recover()
    print(repr(pat))
