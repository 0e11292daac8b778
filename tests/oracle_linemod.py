"""TEST-ONLY ORACLE: independent numpy implementation of cv::linemod
semantics.

The environment's OpenCV 5.0 does not expose the linemod contrib module, so
behavioral parity of the rebuilt matching engine (SURVEY §7 hard part (b):
threshold-80 semantics, magnitude thresholds, candidate spacing) is checked
against this from-scratch numpy port of the algorithm the reference relies
on at /root/reference/src/HighLevelLinemod.cpp:93,152 — Hinterstoisser et
al., "Gradient Response Maps for Real-Time Detection of Textureless
Objects" (PAMI 2012), as implemented by OpenCV's ColorGradient modality:

- 7x7 Gaussian presmooth (OpenCV default sigma for ksize=7), 3x3 Sobel,
  both with BORDER_REFLECT_101 (OpenCV's default border);
- per-pixel strongest color channel by squared magnitude (first max wins);
- fastAtan2 polynomial angle (OpenCV's approximation, ~0.3 deg max error),
  quantized to 16 bins (round-half-even like cvRound) and folded to 8;
- hysteresis filter: 3x3 neighborhood vote over the folded bins, keep if
  >= 5 of 9 agree AND the pixel passes the weak magnitude threshold;
  OpenCV zeroes the 1-px image border of the unfiltered bins before voting
  and never assigns border pixels — reproduced here;
- feature extraction: candidates = masked pixels with an orientation and
  squared magnitude > strong^2, sorted by magnitude descending (stable),
  then greedy scattered selection with initial min distance
  (n_candidates / num_features + 1), re-scanning with distance-1 until
  num_features are found;
- orientation spreading over the forward [0,T)x[0,T) window, response maps
  via the max-over-set-bits circular-distance table
  (4,3,2,1,0,1,2,3 — OpenCV's SIMILARITY_LUT), dense grid similarity =
  sum of responses at (grid*T + feature), score = 100*raw/(4*n_features).

This file must stay independent of linemod_tpu's implementation modules —
it may import nothing from linemod_tpu so that agreement between the two is
evidence, not tautology.
"""

from __future__ import annotations

import numpy as np

WEAK_THRESHOLD = 10.0
STRONG_THRESHOLD = 55.0
NUM_FEATURES = 63
NEIGHBOR_THRESHOLD = 5


# ---------------------------------------------------------------------------
# filtering primitives (BORDER_REFLECT_101, OpenCV's default)
# ---------------------------------------------------------------------------

def _reflect101_pad(img: np.ndarray, ry: int, rx: int) -> np.ndarray:
    return np.pad(img, [(ry, ry), (rx, rx)] + [(0, 0)] * (img.ndim - 2),
                  mode="reflect")


def _sep_filter(img: np.ndarray, kx: np.ndarray, ky: np.ndarray) -> np.ndarray:
    """Separable correlation with reflect-101 borders on [H, W, C] float64."""
    h, w = img.shape[:2]
    rx, ry = len(kx) // 2, len(ky) // 2
    p = _reflect101_pad(img.astype(np.float64), ry, rx)
    row = np.zeros((h + 2 * ry,) + img.shape[1:], np.float64)
    for i, k in enumerate(kx):
        if k:
            row += p[:, i : i + w] * k
    out = np.zeros_like(img, dtype=np.float64)
    for j, k in enumerate(ky):
        if k:
            out += row[j : j + h] * k
    return out


def gaussian_kernel7() -> np.ndarray:
    # OpenCV getGaussianKernel(7, -1): sigma = 0.3*((7-1)*0.5 - 1) + 0.8
    sigma = 0.3 * ((7 - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(7) - 3.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def fast_atan2_deg(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    """OpenCV cv::fastAtan2: degrees in [0, 360), polynomial approximation."""
    p1 = 0.9997878412794807 * (180.0 / np.pi)
    p3 = -0.3258083974640975 * (180.0 / np.pi)
    p5 = 0.1555786518463281 * (180.0 / np.pi)
    p7 = -0.04432655554792128 * (180.0 / np.pi)
    ax, ay = np.abs(x), np.abs(y)
    eps = np.finfo(np.float32).eps
    lo = ay / (ax + eps)  # |y| <= |x|
    hi = ax / (ay + eps)
    c = np.where(ax >= ay, lo, hi)
    c2 = c * c
    a = (((p7 * c2 + p5) * c2 + p3) * c2 + p1) * c
    a = np.where(ax >= ay, a, 90.0 - a)
    a = np.where(x < 0, 180.0 - a, a)
    a = np.where(y < 0, 360.0 - a, a)
    return a


# ---------------------------------------------------------------------------
# quantizedOrientations (ColorGradientPyramid)
# ---------------------------------------------------------------------------

def quantized_orientations(img: np.ndarray, weak: float = WEAK_THRESHOLD):
    """img: [H, W, 3] uint8/float (BGR). Returns (quantized one-hot uint8
    [H, W], magnitude^2 of the strongest channel [H, W])."""
    g = gaussian_kernel7()
    sm = _sep_filter(img.astype(np.float64), g, g)
    sob_d = np.array([-1.0, 0.0, 1.0])
    sob_s = np.array([1.0, 2.0, 1.0])
    dx = _sep_filter(sm, sob_d, sob_s)
    dy = _sep_filter(sm, sob_s, sob_d)
    mag2 = dx * dx + dy * dy  # [H, W, 3]

    # strongest channel, first max wins (OpenCV iterates channels with >)
    best = np.zeros(mag2.shape[:2], np.int64)
    best_mag = mag2[..., 0].copy()
    for c in (1, 2):
        m = mag2[..., c] > best_mag
        best[m] = c
        best_mag[m] = mag2[..., c][m]
    hh, ww = best.shape
    ii, jj = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    bdx = dx[ii, jj, best]
    bdy = dy[ii, jj, best]

    ang = fast_atan2_deg(bdy.astype(np.float32), bdx.astype(np.float32))
    # convertTo(CV_8U, 16/360): saturate_cast(cvRound(x)) — round half to even
    q16 = np.rint(ang * (16.0 / 360.0)).astype(np.int64)
    q8 = (q16 & 15) & 7

    # OpenCV zeroes the 1-px border of the unfiltered bins before voting
    q8z = q8.copy()
    q8z[0, :] = 0
    q8z[-1, :] = 0
    q8z[:, 0] = 0
    q8z[:, -1] = 0

    # 3x3 neighborhood histogram vote (vectorized; identical to OpenCV's
    # per-pixel bincount loop — the zeroed border values DO count as bin-0
    # votes for their inner neighbors, and argmax picks the first max like
    # OpenCV's strict < scan)
    quantized = np.zeros(best.shape, np.uint8)
    strong_px = best_mag > weak * weak
    onehot = (q8z[..., None] == np.arange(8)).astype(np.int32)  # [H, W, 8]
    votes = np.zeros((hh - 2, ww - 2, 8), np.int32)
    for dr in range(3):
        for dc in range(3):
            votes += onehot[dr : dr + hh - 2, dc : dc + ww - 2]
    winner = np.argmax(votes, axis=-1)
    count = np.max(votes, axis=-1)
    inner = (count >= NEIGHBOR_THRESHOLD) & strong_px[1:-1, 1:-1]
    quantized[1:-1, 1:-1] = np.where(
        inner, (1 << winner).astype(np.uint8), 0
    )
    return quantized, best_mag


# ---------------------------------------------------------------------------
# extractTemplate: candidates + scattered selection
# ---------------------------------------------------------------------------

def extract_features(
    quantized: np.ndarray,
    mag2: np.ndarray,
    mask: np.ndarray,
    num_features: int = NUM_FEATURES,
    strong: float = STRONG_THRESHOLD,
):
    """Returns a list of (x, y, ori) selected like OpenCV extractTemplate +
    selectScatteredFeatures."""
    ys, xs = np.nonzero((quantized != 0) & mask & (mag2 > strong * strong))
    scores = mag2[ys, xs]
    # stable sort by score descending (OpenCV stable_sort with score >)
    order = np.argsort(-scores, kind="stable")
    cand = [(int(xs[i]), int(ys[i]), int(np.log2(quantized[ys[i], xs[i]])))
            for i in order]
    if not cand:
        return []
    distance = float(len(cand) // num_features + 1)
    features: list = []
    i = 0
    while len(features) < num_features:
        c = cand[i]
        if all((c[0] - f[0]) ** 2 + (c[1] - f[1]) ** 2 >= distance * distance
               for f in features):
            features.append(c)
        i += 1
        if i == len(cand):
            i = 0
            distance -= 1.0
            if distance < 1.0:
                break
    return features


# ---------------------------------------------------------------------------
# spreading, response maps, dense similarity
# ---------------------------------------------------------------------------

SIMILARITY = np.array(
    [[max(4 - min((i - j) % 8, (j - i) % 8), 0) for j in range(8)]
     for i in range(8)], np.uint8)


def spread(quantized: np.ndarray, t: int) -> np.ndarray:
    h, w = quantized.shape
    p = np.zeros((h + t, w + t), np.uint8)
    p[:h, :w] = quantized
    out = np.zeros_like(quantized)
    for dy in range(t):
        for dx in range(t):
            out |= p[dy : dy + h, dx : dx + w]
    return out


def response_maps(spread_img: np.ndarray) -> np.ndarray:
    """[8, H, W] uint8: best similarity of each template orientation against
    any orientation present in the spread byte."""
    resp = np.zeros((8,) + spread_img.shape, np.uint8)
    for ori in range(8):
        best = np.zeros(spread_img.shape, np.uint8)
        for bit in range(8):
            present = (spread_img >> bit) & 1
            best = np.maximum(best, present * SIMILARITY[ori, bit])
        resp[ori] = best
    return resp


def dense_similarity(features, resp: np.ndarray, t: int):
    """Dense percent similarity of one template over the T-grid.

    features: [(x, y, ori)] bbox-relative; resp: [8, H, W] responses of the
    scene at this pyramid level. Returns [ch, cw] float scores."""
    h, w = resp.shape[1:]
    ch, cw = h // t, w // t
    acc = np.zeros((ch, cw), np.int64)
    for x, y, ori in features:
        r = resp[ori]
        sl = r[y : y + ch * t : t, x : x + cw * t : t]
        acc[: sl.shape[0], : sl.shape[1]] += sl
    return acc * (100.0 / (4.0 * max(len(features), 1)))
