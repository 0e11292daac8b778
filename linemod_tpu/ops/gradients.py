"""Quantized color-gradient orientation modality.

Re-implements the semantics of cv::linemod::ColorGradient (the matching
engine's first modality, used at src/HighLevelLinemod.cpp:29,39): Sobel
gradients on a Gaussian-smoothed image, per-pixel strongest color channel,
orientation folded to 180 degrees and quantized to 8 bins, then a 3x3
neighborhood vote keeps only pixels whose neighborhood agrees on one
orientation. Output is a uint8 one-hot bitmask per pixel (0 = no orientation).

Everything is expressed as depthwise convolutions + elementwise ops so XLA
fuses the whole stage into a few VPU passes.

Defaults mirror OpenCV: weak_threshold=10, strong_threshold=55 (magnitude
thresholds, compared squared), num_features=63, 7x7 Gaussian presmooth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

WEAK_THRESHOLD = 10.0
STRONG_THRESHOLD = 55.0
NUM_FEATURES = 63
NEIGHBOR_VOTES = 5  # of the 9 in a 3x3 patch


def _gaussian_kernel_1d(ksize: int = 7) -> np.ndarray:
    # OpenCV's getGaussianKernel default sigma for ksize=7: 0.3*((7-1)*0.5-1)+0.8
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _sep_conv2d(img: jax.Array, kx: np.ndarray, ky: np.ndarray) -> jax.Array:
    """Separable 2-D convolution with replicate padding on [H, W, C] images.

    Expressed as shift-and-add (static slices of a padded array) rather than
    lax.conv: TPU convolutions on 1..8-channel images spend their time on
    channel padding + layout transforms, while shifted adds fuse into a few
    VPU passes."""
    h, w, _ = img.shape
    rx = len(kx) // 2
    ry = len(ky) // 2
    x = jnp.pad(img, ((ry, ry), (rx, rx), (0, 0)), mode="edge")
    row = None
    for i, k in enumerate(kx):
        if k == 0.0:
            continue
        term = x[:, i : i + w] * jnp.float32(k)
        row = term if row is None else row + term
    out = None
    for j, k in enumerate(ky):
        if k == 0.0:
            continue
        term = row[j : j + h] * jnp.float32(k)
        out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("weak", "strong"))
def quantize_color_gradients(
    img: jax.Array, weak: float = WEAK_THRESHOLD, strong: float = STRONG_THRESHOLD
):
    """Quantize image gradients to 8-bin orientation bitmasks.

    img: [H, W, 3] float32 (0..255 scale, BGR or RGB — symmetric).
    Returns (quantized [H, W] uint8 one-hot-or-zero, magnitude2 [H, W] f32 of
    the strongest channel).
    """
    img = img.astype(jnp.float32)
    g = _gaussian_kernel_1d(7)
    sm = _sep_conv2d(img, g, g)

    # Sobel 3x3 = [-1,0,1] x [1,2,1]
    dx = _sep_conv2d(sm, np.array([-1, 0, 1], np.float32), np.array([1, 2, 1], np.float32))
    dy = _sep_conv2d(sm, np.array([1, 2, 1], np.float32), np.array([-1, 0, 1], np.float32))
    mag2 = dx * dx + dy * dy  # [H, W, 3]
    # strongest channel via selects (axis-3 gathers lower poorly on TPU)
    m0, m1, m2 = mag2[..., 0], mag2[..., 1], mag2[..., 2]
    pick1 = m1 > m0  # argmax tie-breaking: first max wins, so strict compares
    m01 = jnp.where(pick1, m1, m0)
    pick2 = m2 > m01

    def sel(a):
        return jnp.where(pick2, a[..., 2], jnp.where(pick1, a[..., 1], a[..., 0]))

    best_dx = sel(dx)
    best_dy = sel(dy)
    best_mag2 = jnp.where(pick2, m2, m01)

    # Orientation folded to 180 deg, 8 bins: round(angle * 16 / 2pi) & 7.
    angle = jnp.arctan2(best_dy, best_dx)  # [-pi, pi]
    bin16 = jnp.round(angle * (16.0 / (2.0 * np.pi))).astype(jnp.int32) & 15
    bin8 = bin16 & 7

    # 3x3 neighborhood vote: every neighbor's raw orientation counts (no
    # magnitude gate on the neighbors), and the pixel keeps an orientation only
    # if it passes the weak threshold itself and >= NEIGHBOR_VOTES of its 3x3
    # patch agree on one bin.
    onehot = jax.nn.one_hot(bin8, 8, dtype=jnp.float32)
    ones3 = np.ones(3, np.float32)
    votes = _sep_conv2d(onehot, ones3, ones3)  # [H, W, 8]
    winner = jnp.argmax(votes, axis=-1)
    count = jnp.max(votes, axis=-1)
    keep = (count >= NEIGHBOR_VOTES) & (best_mag2 > (weak * weak))
    quantized = jnp.where(keep, (1 << winner).astype(jnp.uint8), jnp.uint8(0))
    return quantized, best_mag2
