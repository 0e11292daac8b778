"""Quantized surface-normal modality from depth images.

Capability-parity re-design of cv::linemod::DepthNormal (the second modality
of the dual-modality detector, src/HighLevelLinemod.cpp:30): surface normals
estimated from depth-image gradients with bilateral rejection of depth
discontinuities (difference_threshold = 50 mm), quantized to 8 orientation
bins, with a 3x3 agreement vote. Output is a uint8 one-hot bitmask like the
gradient modality, so spreading / response maps / scan are shared.

Design note (documented deviation): OpenCV quantizes the normal direction on
a hemisphere via a precomputed disc LUT; here the *azimuth* of the projected
surface slope is quantized into 8 bins of 45 degrees, with near-frontal
surfaces (slope below `min_slope`) carrying no orientation. Discriminative
power concentrates in the same slanted/curved regions; the shipped reference
config runs color-only (linemod_settings.yml:20), so this modality is held to
our own dual-modality end-to-end tests rather than bit-parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DIFFERENCE_THRESHOLD = 50.0  # mm, depth-discontinuity rejection
MIN_SLOPE = 1.0  # mm depth change per pixel before a direction is meaningful
NUM_FEATURES = 63
EXTRACT_RADIUS = 2  # features must sit >= this many erosions inside the mask


def _shift(x, dy, dx):
    h, w = x.shape
    pad = jnp.pad(x, ((1, 1), (1, 1)))
    return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))


@functools.partial(jax.jit, static_argnames=("difference_threshold", "min_slope"))
def quantize_normals(
    depth: jax.Array,
    difference_threshold: float = DIFFERENCE_THRESHOLD,
    min_slope: float = MIN_SLOPE,
):
    """Quantize depth-slope azimuth into 8-bin one-hot bitmasks.

    depth: [H, W] f32 mm (0 = invalid). Returns (quantized [H, W] uint8,
    slope_mag2 [H, W] f32).
    """
    d = depth.astype(jnp.float32)
    valid = d > 0

    def grad(a, b):
        # central difference with bilateral rejection: a, b are +/- neighbors
        ga = a - d
        gb = d - b
        ok_a = (jnp.abs(ga) < difference_threshold) & (a > 0)
        ok_b = (jnp.abs(gb) < difference_threshold) & (b > 0)
        both = ok_a & ok_b
        g = jnp.where(
            both, 0.5 * (ga + gb), jnp.where(ok_a, ga, jnp.where(ok_b, gb, 0.0))
        )
        return g, ok_a | ok_b

    gx, okx = grad(_shift(d, 0, 1), _shift(d, 0, -1))
    gy, oky = grad(_shift(d, 1, 0), _shift(d, -1, 0))
    ok = valid & okx & oky
    mag2 = gx * gx + gy * gy

    # 8 azimuth bins over the full 360 degrees (normals are directed).
    angle = jnp.arctan2(gy, gx)
    bin8 = jnp.round(angle * (8.0 / (2.0 * np.pi))).astype(jnp.int32) & 7

    # 3x3 box vote as shift-and-add (lax.conv on 8-channel images wastes its
    # time on channel padding / layout transforms on TPU)
    h, w = bin8.shape
    onehot = jax.nn.one_hot(bin8, 8, dtype=jnp.float32)
    pad = jnp.pad(onehot, ((1, 1), (1, 1), (0, 0)), mode="edge")
    votes = None
    for dy in range(3):
        for dx in range(3):
            term = pad[dy : dy + h, dx : dx + w]
            votes = term if votes is None else votes + term
    winner = jnp.argmax(votes, axis=-1)
    count = jnp.max(votes, axis=-1)
    keep = (count >= 5) & ok & (mag2 > min_slope * min_slope)
    quantized = jnp.where(keep, (1 << winner).astype(jnp.uint8), jnp.uint8(0))
    return quantized, mag2
