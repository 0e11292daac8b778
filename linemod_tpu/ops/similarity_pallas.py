"""Pallas TPU kernels for the similarity scans (coarse + fine).

Coarse: scores every template of the bank at every coarse grid cell in one
kernel — the linearized response planes (a few MB, see ops/spread.py) stay
resident in VMEM for the whole scan, and each program accumulates one
template's features as dynamically-rotated plane tiles. This is the TPU
reshaping of the reference engine's "linearized memories" trick
(cv::linemod's SIMD sliding window, used at src/HighLevelLinemod.cpp:152):
the whole working set sits in on-chip memory, so the scan is VPU-bound, not
HBM-bound.

Fine: refines the top-K coarse candidates over the 8x8 sub-cell window each
coarse cell covers. One program per candidate; the candidate's template id
arrives via scalar prefetch and selects that template's feature table
directly in the BlockSpec index map.

Mosaic constraint that shapes both kernels: dynamically-offset vector loads
must be tile-aligned (sublane multiple of 8, lane multiple of 128), so
feature shifts are realized as aligned loads + dynamic rotations
(tpu.dynamic_rotate, 32-bit only) with the residual shift.

Covers grids up to 32 x 128 cells (640x480 at the T=8 coarse level is
30 x 40); ops/matching.py falls back to the XLA gather path for larger grids
or non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128
MAX_F = 64


def _make_coarse_kernel(rows_used: int, lanes_used: int):
    rp = rows_used // 4  # packed rows: 4 uint8 plane rows per int32 word

    def _coarse_kernel(off_ref, planes_ref, out_ref):
        """off_ref: [1, F, 3] SMEM (plane, sy, sx); planes_ref: [P, rows,
        stride] VMEM uint8; out_ref: [1, TILE_H, TILE_W] VMEM int32.

        Packed accumulation: response bytes stay 4-to-an-int32-word
        (pltpu.bitcast sublane packing, row 4k = low byte) through the rolls
        and the add, so every per-feature op touches 1/4 the vector state of
        the unpacked form. The row shift sy splits into a whole-word roll
        (sy//4) plus a byte funnel-shift between adjacent words (sy%4);
        Mosaic's dynamic_rotate is 32-bit-only, which packing satisfies by
        construction. Byte lanes cannot overflow: <= 63 real features per
        64-slot group (extract.NUM_FEATURES) x max response 4 = 252 < 256;
        dual-modality (F=128) accumulates each 64-group in its own packed
        register. Lane rotation may wrap when lanes_used < sx + TILE_W; the
        wrapped values land in output lanes >= lanes_used - max_shift >=
        grid width (linear_plane_shape invariant), which the caller crops
        away."""
        n_feat = off_ref.shape[1]

        def body(f, acc):
            p = off_ref[0, f, 0]
            sy = off_ref[0, f, 1]
            sx = off_ref[0, f, 2]
            q = sy // 4
            s = sy % 4
            w = pltpu.bitcast(
                planes_ref[p, 0:rows_used, 0:lanes_used], jnp.int32
            )  # [rp, lanes]
            # Mosaic's dynamic_rotate needs a multiple-of-8 sublane count;
            # zero-pad to 16 packed words (rows beyond the real plane are
            # never consumed: needed word indices stay < rp by the
            # linear_plane_shape row invariant, and padded rows land beyond
            # the grid rows the caller crops)
            w = jnp.concatenate(
                [w, jnp.zeros((16 - rp, lanes_used), jnp.int32)], axis=0
            )
            rolled = pltpu.roll(w, 16 - q, axis=0)  # rolled[k] = w[(k+q) % 16]
            w1 = rolled[0 : TILE_H // 4]
            w2 = rolled[1 : TILE_H // 4 + 1]
            # byte funnel shift: out word k, byte j = plane row 4k + sy + j.
            # Plane bytes are responses 0..4, so the int32 arithmetic >> is
            # a logical shift (sign bit never set). s == 0 must not shift w2
            # by 32 (undefined); the where() masks it out entirely then.
            comb = (w1 >> (8 * s)) | jnp.where(s == 0, 0, w2 << ((32 - 8 * s) & 31))
            comb = pltpu.roll(comb, lanes_used - sx, axis=1)
            return acc + comb[:, 0:TILE_W]

        groups = []
        for g in range(n_feat // MAX_F):
            acc = jax.lax.fori_loop(
                g * MAX_F, (g + 1) * MAX_F, body,
                jnp.zeros((TILE_H // 4, TILE_W), jnp.int32),
                unroll=MAX_F,  # Pallas lowering supports only full unroll or 1
            )
            groups.append(pltpu.bitcast(acc, jnp.uint8).astype(jnp.int32))
        out_ref[0] = sum(groups)

    return _coarse_kernel


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def coarse_scores_pallas(
    planes: jax.Array, off3: jax.Array, max_shift: int, interpret: bool = False
):
    """planes: [P(+1 zero), rows, stride] uint8 linearized response planes;
    off3: [N, F, 3] int32 per-feature (plane, sy, sx) with invalid
    features pointing at the zero plane (F = 64, or 128 dual-modality);
    max_shift: static bound on sy/sx (= the state's max_cells at this level).
    Returns scores [N, TILE_H, TILE_W] int32 (crop to the real grid outside)."""
    n, mf, _ = off3.shape
    rows, stride = planes.shape[1], planes.shape[2]
    rows_used = min(rows, ((TILE_H + max_shift + 7) // 8) * 8)
    lanes_used = min(stride, ((TILE_W + max_shift + 127) // 128) * 128)
    if (
        rows_used % 8
        or rows_used < TILE_H + 4  # packed funnel shift reads one extra word
        or rows_used > 64  # packed words must pad to 16 sublanes
        or mf % MAX_F
        or (lanes_used < stride and max_shift > lanes_used - TILE_W)
    ):
        raise ValueError(f"unsupported plane geometry {planes.shape}, {max_shift}")
    return pl.pallas_call(
        _make_coarse_kernel(rows_used, lanes_used),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, mf, 3), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, TILE_H, TILE_W), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n * mf * 3 * rows_used * 256,
            bytes_accessed=planes.size + n * (mf * 12 + TILE_H * TILE_W * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(off3, planes)


SCALE = 8  # fine sub-cells per coarse cell (2 * t_coarse / t_fine, color-only)


def _fine_kernel(cand_t_ref, base_ref, off_ref, planes_ref, out_ref):
    """One program per candidate: accumulate the candidate template's features
    over the SCALE x SCALE sub-cell window at its coarse-cell origin.

    cand_t_ref/base_ref: scalar-prefetched [K] template ids (used by the
    off_ref index map) and [K, 2] fine-grid (base_y, base_x) origins;
    off_ref: [1, F, 3] SMEM — the *candidate's template's* (plane, sy, sx);
    planes_ref: [P, rows, stride] VMEM; out_ref: [1, 8, 128] int32 (lanes >=
    SCALE are garbage; caller crops)."""
    del cand_t_ref  # only used by the index maps
    i = pl.program_id(0)
    n_feat = off_ref.shape[1]
    rows = planes_ref.shape[1]
    stride = planes_ref.shape[2]
    lanes = min(stride, 256)
    by = base_ref[i, 0]
    bx = base_ref[i, 1]

    def body(f, acc):
        p = off_ref[0, f, 0]
        y = by + off_ref[0, f, 1]
        x = bx + off_ref[0, f, 2]
        # aligned 16-row x `lanes`-lane block, clamped in-bounds; residual via
        # packed roll + byte funnel shift (see the coarse kernel — same
        # packed-accumulation scheme, 4 plane rows per int32 word). Lane
        # wrap, when stride == lanes, stays >= stride - x > SCALE output
        # lanes — see linear_plane_shape invariant.
        # 32 uint8 rows -> 8 packed words: a multiple-of-8 sublane count, as
        # Mosaic's dynamic_rotate requires (rows_f >= 32 always: >= 32-row
        # tile + max_cells in linear_plane_shape)
        yb = pl.multiple_of(jnp.minimum((y // 8) * 8, rows - 32), 8)
        xb = pl.multiple_of(jnp.minimum((x // 128) * 128, stride - lanes), 128)
        d = y - yb  # <= 24; s > 0 implies q <= 5 so the funnel never wraps
        q = d // 4
        s = d % 4
        w = pltpu.bitcast(planes_ref[p, pl.ds(yb, 32), pl.ds(xb, lanes)], jnp.int32)
        rolled = pltpu.roll(w, 8 - q, axis=0)  # rolled[k] = w[(k+q) % 8]
        comb = (rolled[0:2] >> (8 * s)) | jnp.where(
            s == 0, 0, rolled[1:3] << ((32 - 8 * s) & 31)
        )
        comb = pltpu.roll(comb, lanes - (x - xb), axis=1)
        return acc + comb[:, 0:TILE_W]

    acc = jax.lax.fori_loop(
        0, n_feat, body, jnp.zeros((2, TILE_W), jnp.int32),
        unroll=n_feat,  # Pallas lowering supports only full unroll or 1
    )
    out_ref[0] = pltpu.bitcast(acc, jnp.uint8).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fine_scores_pallas(
    planes: jax.Array,
    off3: jax.Array,
    cand_t: jax.Array,
    base_yx: jax.Array,
    interpret: bool = False,
):
    """planes: [P(+1), rows, stride] uint8 fine-level linearized planes;
    off3: [N, F, 3] int32 per-template fine-level (plane, sy, sx);
    cand_t: [K] int32 candidate template ids; base_yx: [K, 2] int32 fine-grid
    (y, x) origin of each candidate's coarse cell.
    Returns [K, 8, 128] int32; scores live in [:, :SCALE, :SCALE]."""
    k = cand_t.shape[0]
    n, mf, _ = off3.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cand_t, base_yx
        grid=(k,),
        in_specs=[
            pl.BlockSpec(
                (1, mf, 3),
                lambda i, ct, base: (ct[i], 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TILE_W), lambda i, ct, base: (i, 0, 0)),
    )
    return pl.pallas_call(
        _fine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 8, TILE_W), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=k * mf * 3 * 16 * 256,
            bytes_accessed=planes.size + k * (mf * 12 + 8 * TILE_W * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cand_t.astype(jnp.int32), base_yx.astype(jnp.int32), off3, planes)


def feature_plane_triplets(feats, valids, t, zero_plane_idx):
    """Per-feature (plane, sy, sx) triplets for the Pallas kernels.

    feats: [N, 64, 3] (x, y, ori) bbox-relative at this level; invalid
    features map to the all-zero plane at index `zero_plane_idx`."""
    xs = feats[:, :, 0].astype(np.int64)
    ys = feats[:, :, 1].astype(np.int64)
    oris = feats[:, :, 2].astype(np.int64)
    plane = (oris * t + ys % t) * t + xs % t
    sy = ys // t
    sx = xs // t
    trip = np.stack([plane, sy, sx], axis=-1)
    trip = np.where(valids[:, :, None], trip, np.array([zero_plane_idx, 0, 0]))
    return trip.astype(np.int32)
