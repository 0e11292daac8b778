"""Orientation spreading, binarized response maps, linearized planes.

The match-time precomputation of the LINE-MOD engine (cv::linemod internals
relied on at src/HighLevelLinemod.cpp:152):

1. `spread`: OR the quantized-orientation bitmask over a T x T window of
   *forward* offsets (dy, dx in [0, T)), making the similarity invariant to
   feature positions within a grid cell.
2. `response_maps`: for each of the 8 template orientations, the best cosine
   similarity against any orientation present in the spread byte, on the
   scale 0..4 (bin distance 0 -> 4, 1 -> 3, 2 -> 2, 3 -> 1, 4 -> 0).
3. `linearize`: re-layout each response plane so that all grid positions with
   stride T form one contiguous row-major plane per within-cell offset.
   A template feature at offset (y, x) then contributes the contiguous slice
   planes_flat[base(y % T, x % T, ori) + shift(y // T, x // T) + g] to the
   score of every grid position g — the TPU generalization of the reference
   engine's "linear memories", and the layout the Pallas scan kernel consumes.

All shapes are static; the planes for one pyramid level fit in VMEM
(8*T*T*ceil(H/T)*ceil(W/T) bytes: ~1.5 MB for T=8 at 320x240, ~3.1 MB for
T=2 at 640x480).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# sim[i, j]: similarity of template orientation i vs image orientation j
_BIN_DIST = np.minimum(
    (np.arange(8)[:, None] - np.arange(8)[None, :]) % 8,
    (np.arange(8)[None, :] - np.arange(8)[:, None]) % 8,
)
SIMILARITY = np.maximum(4 - _BIN_DIST, 0).astype(np.uint8)  # [8, 8], max 4
MAX_RESPONSE = 4


@functools.partial(jax.jit, static_argnames=("t",))
def spread_orientations(quantized: jax.Array, t: int) -> jax.Array:
    """OR-spread the one-hot orientation bytes over a T x T forward window.

    quantized: [H, W] uint8. Returns [H, W] uint8.

    OR over a rectangular window is separable and associative, so the T x T
    window is built per axis by doubling: after step k the accumulator
    covers a forward run of 2^k, and a final residual shift tops the run up
    to exactly T — ceil(log2 T)+1 ORs per axis instead of T, 2*O(log T)
    total instead of T^2 (64 -> 6 shifted ORs at the coarse T=8).
    """
    h, w = quantized.shape

    def axis_spread(x, axis):
        # pad the axis by t, double on the padded array with wrapping rolls:
        # the total shift is t-1, so wrapped values stay in the padding
        # (indices >= real extent + 1) and never reach the cropped output
        pad = [(0, 0), (0, 0)]
        pad[axis] = (0, t)
        acc = jnp.pad(x, pad)
        run = 1
        while run * 2 <= t:
            acc = acc | jnp.roll(acc, -run, axis=axis)
            run *= 2
        if run < t:
            acc = acc | jnp.roll(acc, -(t - run), axis=axis)
        return acc

    acc = axis_spread(quantized, 0)
    acc = axis_spread(acc, 1)
    return acc[:h, :w]


@jax.jit
def response_maps(spread: jax.Array) -> jax.Array:
    """Per-orientation best-similarity maps from spread bytes.

    spread: [...] uint8 -> [8, ...] uint8 with values 0..4 (pointwise in the
    spatial dims, so any layout works — including the pre-linearized
    [T, T, ch, cw] layout of `linearized_response_planes`).
    """
    shifts = jnp.arange(8, dtype=jnp.uint8).reshape((8,) + (1,) * spread.ndim)
    bits = ((spread[None] >> shifts) & 1).astype(jnp.bool_)  # [8(bit), ...]
    sim = jnp.asarray(SIMILARITY)  # [8(ori), 8(bit)]
    sim = sim.reshape((8, 8) + (1,) * spread.ndim)
    # response[o] = max over set bits b of sim[o, b]
    resp = jnp.max(jnp.where(bits[None], sim, jnp.uint8(0)), axis=1)
    return resp


def linear_plane_shape(h: int, w: int, t: int, max_cells: int):
    """Padded grid-plane shape for `linearize`: (cells_h + max_cells, row_stride).

    Padding guarantees the Pallas scan kernels' aligned loads + dynamic
    rotations stay exact: rows cover at least one 32-row output tile plus the
    max within-bank shift and are 8-aligned (Mosaic's dynamic_rotate needs a
    sublane-tile-aligned extent — multiples of 8); the row stride covers the
    grid width plus the max shift, rounded to full 128-lane tiles. Lane
    rotation may wrap, but the wrapped values land in lanes >=
    stride - max_cells >= cw, outside the real grid, so they never reach a
    score. Rows were 32-aligned until round 3; 8-alignment cut the coarse
    planes from 4.2 to 2.6 MB (less response compute, less VMEM, smaller
    tp all_gather) with Mosaic still compiling the rolls.
    """
    ch, cw = h // t, w // t
    rows = int(np.ceil((max(ch, 32) + max_cells) / 8.0)) * 8
    stride = int(np.ceil((cw + max_cells) / 128.0)) * 128
    return ch, cw, rows, stride


@functools.partial(jax.jit, static_argnames=("t", "max_cells"))
def linearized_response_planes(quant: jax.Array, t: int, max_cells: int) -> jax.Array:
    """Spread + response + linearize in the transpose-cheap order.

    quant: [H, W] uint8 one-hot orientations (H, W multiples of T) ->
    planes [8, T, T, rows, stride] uint8, identical to
    `linearize(response_maps(spread_orientations(quant, t)), t, max_cells)`.

    The grid re-layout (an 8-bit transpose — slow on TPU, it's all sublane
    shuffles) is applied to the ONE spread byte-plane instead of the 8
    response planes; the pointwise response expansion then runs in the
    already-linearized layout. 8x fewer transposed bytes for bit-identical
    output.
    """
    h, w = quant.shape
    ch, cw, rows, stride = linear_plane_shape(h, w, t, max_cells)
    spread = spread_orientations(quant, t)
    s = spread.reshape(ch, t, cw, t).transpose(1, 3, 0, 2)  # [T, T, ch, cw]
    resp = response_maps(s)  # [8, T, T, ch, cw]
    return jnp.pad(
        resp, ((0, 0), (0, 0), (0, 0), (0, rows - ch), (0, stride - cw))
    )


@functools.partial(jax.jit, static_argnames=("t", "max_cells", "n_bands"))
def linearized_response_planes_band(
    quant: jax.Array, t: int, max_cells: int, band: jax.Array, n_bands: int
) -> jax.Array:
    """One horizontal band of `linearized_response_planes`, for tp-sharded
    per-frame precompute: device i computes grid rows
    [i*rows/n_bands, (i+1)*rows/n_bands) and an all_gather along the rows
    axis (tiled) reassembles the exact full planes.

    band may be traced (jax.lax.axis_index inside shard_map). Rows beyond the
    real grid see zero spread bytes -> zero response, identical to the full
    path's padding. Returns [8, T, T, rows/n_bands, stride] uint8.
    """
    h, w = quant.shape
    h -= h % t
    w -= w % t
    quant = quant[:h, :w]
    ch, cw, rows, stride = linear_plane_shape(h, w, t, max_cells)
    if rows % n_bands:
        raise ValueError(f"rows {rows} not divisible by n_bands {n_bands}")
    bh = rows // n_bands
    spread = spread_orientations(quant, t)
    spread = jnp.pad(spread, ((0, rows * t - h), (0, 0)))
    sl = jax.lax.dynamic_slice(
        spread, (band * (bh * t), 0), (bh * t, w)
    )
    s = sl.reshape(bh, t, cw, t).transpose(1, 3, 0, 2)  # [T, T, bh, cw]
    resp = response_maps(s)  # [8, T, T, bh, cw]
    return jnp.pad(resp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, stride - cw)))


@functools.partial(
    jax.jit, static_argnames=("t", "max_cells", "n_bands", "quantize_fn")
)
def band_planes_from_image(
    img: jax.Array,
    t: int,
    max_cells: int,
    band: jax.Array,
    n_bands: int,
    quantize_fn,
) -> jax.Array:
    """One band of the linearized planes computed from the RAW image — the
    quantize itself is band-sharded too (it was the largest replicated cost
    left in the tp-sharded per-frame path: ~0.17 ms/frame on a v5e).

    The device quantizes only the image rows its band's spread needs, plus an
    8-row halo covering the quantizer's receptive field (7x7 blur -> 3, Sobel
    -> 1, vote -> 1 for color; shift 1 + vote 1 for normals). Boundary
    semantics are subtle: the quantizers pad stage-wise (pad->smooth->
    pad->sobel), so conv(conv(pad_wide(img))) != the full path at the true
    image edges. The band slice is therefore CLAMPED to [0, H] — the first
    and last bands' slices start/end exactly at the real image boundary, so
    the quantizer's own internal padding applies to the true edge rows and
    every row is bit-identical to quantizing the full image. Rows past the
    t-cropped extent are forced to zero orientation, matching the full
    path's zero padding. Returns [8, T, T, rows/n_bands, stride] uint8.

    quantize_fn: img-slice -> (one-hot orientations, _) — e.g.
    ops.gradients.quantize_color_gradients or ops.normals.quantize_normals.
    """
    HALO = 8
    h_img, w_img = img.shape[:2]
    h = h_img - h_img % t
    w = w_img - w_img % t
    ch, cw, rows, stride = linear_plane_shape(h, w, t, max_cells)
    if rows % n_bands:
        raise ValueError(f"rows {rows} not divisible by n_bands {n_bands}")
    bh = rows // n_bands
    bh_px = bh * t
    need = bh_px + t  # spread of the band's rows reads t-1 rows below it
    sh = min(need + 2 * HALO, h_img)  # static slice height, full width
    start = jnp.clip(band * bh_px - HALO, 0, h_img - sh)
    sl = jax.lax.dynamic_slice(
        img, (start,) + (0,) * (img.ndim - 1), (sh,) + img.shape[1:]
    )
    quant_sl = quantize_fn(sl)[0][:, :w]
    # place the wanted rows [band*bh_px, band*bh_px + need) of the quantized
    # full image; zero-pad below so bands past the image never clamp the
    # dynamic slice onto wrong rows. Only the worst-case overhang is needed:
    # the slice start is at most rows*t - bh_px - (h_img - sh) (last band,
    # start clamped at h_img - sh), so start+need <= rows*t + t - h_img + sh
    # <= rows*t + t - sh + sh when sh == h_img — pad max(0, rows*t + t - sh)
    # instead of a full plane-height copy per band per modality.
    quant_pad = jnp.pad(quant_sl, ((0, max(0, rows * t + t - sh)), (0, 0)))
    quant = jax.lax.dynamic_slice(quant_pad, (band * bh_px - start, 0), (need, w))
    # zero orientations past the t-cropped image (the full path quantizes the
    # full image, crops to [h, w], and pads the spread with zeros below)
    gidx = band * bh_px + jnp.arange(need)
    quant = jnp.where((gidx < h)[:, None], quant, 0)
    spread = spread_orientations(quant, t)[:bh_px]
    s = spread.reshape(bh, t, cw, t).transpose(1, 3, 0, 2)  # [T, T, bh, cw]
    resp = response_maps(s)
    return jnp.pad(resp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, stride - cw)))


@functools.partial(jax.jit, static_argnames=("t", "max_cells"))
def linearize(resp: jax.Array, t: int, max_cells: int) -> jax.Array:
    """Grid-stride re-layout of response maps.

    resp: [8, H, W] uint8 (H, W multiples of T) ->
    planes [8, T, T, rows, stride] uint8 where
    planes[o, ry, rx, gy, gx] = resp[o, gy*T + ry, gx*T + rx], zero-padded by
    `max_cells` grid cells bottom/right so that shifted slices of templates up
    to max_cells x max_cells grid cells stay in bounds.
    """
    o, h, w = resp.shape
    ch, cw, rows, stride = linear_plane_shape(h, w, t, max_cells)
    x = resp.reshape(o, ch, t, cw, t)
    x = x.transpose(0, 2, 4, 1, 3)  # [8, T, T, ch, cw]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, rows - ch), (0, stride - cw)))
    return x


def feature_flat_offsets(
    xs: np.ndarray, ys: np.ndarray, oris: np.ndarray, t: int, rows: int, stride: int
) -> np.ndarray:
    """Flat base offsets into linearized planes for features at (x, y, ori).

    With planes viewed as flat [8*T*T*rows*stride], the response for a feature
    at template offset (x, y) with orientation `ori`, evaluated at grid
    position (gy, gx), lives at offset[f] + gy*stride + gx.
    """
    ry = ys % t
    rx = xs % t
    sy = ys // t
    sx = xs // t
    plane = (oris * t + ry) * t + rx
    return (plane * rows + sy) * stride + sx
