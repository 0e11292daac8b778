"""Template feature extraction and scattered selection.

The offline half of the matching engine (cv::linemod's addTemplate internals,
driven from src/HighLevelLinemod.cpp:93): quantize the rendered template
image per pyramid level, keep strong candidates inside the (eroded) object
mask, and select `num_features` spatially scattered features ordered by
gradient magnitude. Selection is expressed as a `lax.scan` over the
score-sorted candidate list with a shrinking min-distance schedule, vmapped
over the in-plane-rotation batch, so the whole extraction runs on-device.

Deviation note: OpenCV re-iterates the candidate list decrementing the
min-distance by 1 until enough features are found; we use a fixed 4-step
schedule (d, d/2, d/4, 0) which selects the same kind of spread and is
static-shape friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .gradients import STRONG_THRESHOLD, quantize_color_gradients
from .normals import quantize_normals

MAX_CANDIDATES = 512
NUM_FEATURES = 63


def erode_mask(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """3x3 binary erosion (cv::erode with default kernel, src/HighLevelLinemod.cpp:91).

    Min-reduce with +inf padding: image borders do not erode inward, matching
    OpenCV's default border handling for erode."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME"
        )
    return m > 0.5


def downsample2(img: jax.Array) -> jax.Array:
    """2x2 average-pool downsample (pyramid level step)."""
    if img.ndim == 2:
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
        ) * 0.25
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
    ) * 0.25


@functools.partial(jax.jit, static_argnames=("num_features",))
def select_scattered_features(
    score: jax.Array,
    quantized: jax.Array,
    candidate_mask: jax.Array,
    num_features: int = NUM_FEATURES,
):
    """Greedy scattered feature selection.

    score: [H, W] f32 (larger = better), quantized: [H, W] uint8 one-hot,
    candidate_mask: [H, W] bool. Returns (x, y, ori, valid): each [num_features]
    int32 / bool. Initial min-distance = num_candidates / num_features + 1
    (OpenCV's heuristic), relaxed over 4 passes.
    """
    h, w = score.shape
    flat_score = jnp.where(candidate_mask, score, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_score, MAX_CANDIDATES)
    cx = (top_idx % w).astype(jnp.float32)
    cy = (top_idx // w).astype(jnp.float32)
    cvalid = jnp.isfinite(top_scores)
    n_cand = jnp.sum(candidate_mask)
    d0 = n_cand.astype(jnp.float32) / num_features + 1.0

    n_pass = 4
    d_mult = jnp.repeat(jnp.asarray([1.0, 0.5, 0.25, 0.0], jnp.float32), MAX_CANDIDATES)
    cand_seq = jnp.tile(jnp.arange(MAX_CANDIDATES, dtype=jnp.int32), n_pass)

    def step(carry, inp):
        selx, sely, count, taken = carry
        ci, dm = inp
        x, y = cx[ci], cy[ci]
        d2 = (d0 * dm) ** 2
        dist2 = jnp.min((selx - x) ** 2 + (sely - y) ** 2)
        ok = cvalid[ci] & (~taken[ci]) & (count < num_features) & (dist2 >= d2)
        slot = jax.nn.one_hot(count, num_features, dtype=jnp.bool_) & ok
        selx = jnp.where(slot, x, selx)
        sely = jnp.where(slot, y, sely)
        taken = taken.at[ci].set(taken[ci] | ok)
        return (selx, sely, count + ok.astype(jnp.int32), taken), ok

    init = (
        jnp.full((num_features,), 1e9, jnp.float32),
        jnp.full((num_features,), 1e9, jnp.float32),
        jnp.int32(0),
        jnp.zeros((MAX_CANDIDATES,), jnp.bool_),
    )
    (selx, sely, count, _), _ = jax.lax.scan(step, init, (cand_seq, d_mult))

    valid = jnp.arange(num_features) < count
    x = jnp.where(valid, selx, 0.0).astype(jnp.int32)
    y = jnp.where(valid, sely, 0.0).astype(jnp.int32)
    # orientation bin = index of the single set bit
    q = quantized[y, x].astype(jnp.int32)
    ori = jnp.int32(31) - jax.lax.clz(jnp.maximum(q, 1))
    return x, y, ori, valid


@functools.partial(jax.jit, static_argnames=("dual_modality", "num_features"))
def extract_template(
    color: jax.Array,
    depth: jax.Array,
    dual_modality: bool = False,
    num_features: int = NUM_FEATURES,
):
    """Extract per-level features for one rendered template view.

    color: [H, W, 3] f32 0..255, depth: [H, W] f32 mm (0 = background).
    Returns a dict of per-level feature arrays; level 0 is full resolution,
    level 1 is 2x downsampled. Feature coordinates are absolute pixel
    positions at each level's resolution (bbox cropping happens bank-side).
    """
    mask0 = erode_mask(depth > 0, 1)
    mask1 = mask0[::2, ::2]
    color1 = downsample2(color)
    depth1 = depth[::2, ::2]

    out = {}
    for lvl, (c, d, m) in enumerate([(color, depth, mask0), (color1, depth1, mask1)]):
        quant, mag2 = quantize_color_gradients(c)
        cand = (quant != 0) & (mag2 > STRONG_THRESHOLD**2) & m
        x, y, ori, valid = select_scattered_features(mag2, quant, cand, num_features)
        out[f"grad{lvl}"] = (x, y, ori, valid)
        if dual_modality:
            nquant, nmag2 = quantize_normals(d)
            ncand = (nquant != 0) & m
            nx, ny, nori, nvalid = select_scattered_features(
                nmag2, nquant, ncand, num_features
            )
            out[f"norm{lvl}"] = (nx, ny, nori, nvalid)
    return out
