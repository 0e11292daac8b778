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


def _make_coarse_kernel(rows_used: int, lanes_used: int, tpb: int):
    def _coarse_kernel(off_ref, planes_ref, out_ref):
        """off_ref: [tpb, F, 3] SMEM (plane, sy, sx); planes_ref: [P, rows,
        stride] VMEM; out_ref: [tpb, TILE_H, TILE_W] VMEM int32.

        tpb templates per program amortize the per-program launch +
        prologue overhead (measured 1.70 -> 1.50 ms over 2048 templates on
        v5e at tpb=4, bit-identical output).

        Lane rotation may wrap when lanes_used < sx + TILE_W; the wrapped
        values land in output lanes >= lanes_used - max_shift >= grid width
        (linear_plane_shape invariant), which the caller crops away."""
        n_feat = off_ref.shape[1]

        for tt in range(tpb):
            def body(f, acc, _tt=tt):
                p = off_ref[_tt, f, 0]
                sy = off_ref[_tt, f, 1]
                sx = off_ref[_tt, f, 2]
                # static row/lane crop (sy <= rows_used - TILE_H)
                blk = planes_ref[p, 0:rows_used, 0:lanes_used].astype(jnp.int32)
                blk = pltpu.roll(blk, rows_used - sy, axis=0)
                blk = pltpu.roll(blk[0:TILE_H], lanes_used - sx, axis=1)
                return acc + blk[:, 0:TILE_W]

            acc = jax.lax.fori_loop(
                0, n_feat, body, jnp.zeros((TILE_H, TILE_W), jnp.int32),
                unroll=n_feat,  # Pallas lowering supports only full unroll or 1
            )
            out_ref[tt] = acc

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
    if rows_used % 8 or (lanes_used < stride and max_shift > lanes_used - TILE_W):
        raise ValueError(f"unsupported plane geometry {planes.shape}, {max_shift}")
    tpb = next(d for d in (4, 2, 1) if n % d == 0)
    return pl.pallas_call(
        _make_coarse_kernel(rows_used, lanes_used, tpb),
        grid=(n // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, mf, 3), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpb, TILE_H, TILE_W), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, TILE_H, TILE_W), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n * mf * 3 * rows_used * 256,
            bytes_accessed=planes.size + n * (mf * 12 + TILE_H * TILE_W * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(off3, planes)


def _make_coarse_max_kernel(rows_used: int, lanes_used: int, tpb: int):
    def _coarse_max_kernel(off_ref, lim_ref, planes_ref, out_ref):
        """Per-template masked MAX over the coarse grid — the phase-1 kernel
        of the prefiltered candidate cut (ops/matching.candidate_cut_prefilter).

        Identical accumulation to _coarse_kernel, but instead of writing the
        [TILE_H, TILE_W] score tile to HBM it reduces it to ONE scalar: the
        max raw score over the cells where the template fits
        (lim_ref = per-template (gy_lim, gx_lim)). At the reference's 96k-
        template regime the dense tiles are ~1.6 GB of HBM writes per frame;
        this kernel writes 4 bytes per template. Wrapped rotation garbage
        lands in rows/lanes >= the grid extent (see _coarse_kernel) and the
        lim mask (lim <= grid extent) excludes it.

        off_ref: [tpb, F, 3] SMEM; lim_ref: [8, 2] SMEM int32;
        planes_ref: [P, rows, stride] VMEM; out_ref: [8, tpb] SMEM int32
        (-1 where no cell fits). The output block is shared by 8 consecutive
        programs and the lim block by 8/tpb consecutive programs (Mosaic
        requires block sublane dims be 8-divisible or full); each program
        addresses its own rows via program_id — consecutive revisits of one
        block are legal and flush once at the end."""
        row = pl.program_id(0) % 8
        lim_row = (pl.program_id(0) * tpb) % 8
        n_feat = off_ref.shape[1]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)

        for tt in range(tpb):
            def body(f, acc, _tt=tt):
                p = off_ref[_tt, f, 0]
                sy = off_ref[_tt, f, 1]
                sx = off_ref[_tt, f, 2]
                blk = planes_ref[p, 0:rows_used, 0:lanes_used].astype(jnp.int32)
                blk = pltpu.roll(blk, rows_used - sy, axis=0)
                blk = pltpu.roll(blk[0:TILE_H], lanes_used - sx, axis=1)
                return acc + blk[:, 0:TILE_W]

            acc = jax.lax.fori_loop(
                0, n_feat, body, jnp.zeros((TILE_H, TILE_W), jnp.int32),
                unroll=n_feat,
            )
            fits = (row_ids < lim_ref[lim_row + tt, 0]) & (
                col_ids < lim_ref[lim_row + tt, 1]
            )
            out_ref[row, tt] = jnp.max(jnp.where(fits, acc, -1))

    return _coarse_max_kernel


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def coarse_max_pallas(
    planes: jax.Array,
    off3: jax.Array,
    lim: jax.Array,
    max_shift: int,
    interpret: bool = False,
):
    """Per-template masked max raw score over the whole coarse grid.

    planes/off3/max_shift as coarse_scores_pallas; lim: [N, 2] int32
    (gy_lim, gx_lim) valid-cell bounds. Returns [N] int32 (-1 = no fit)."""
    n, mf, _ = off3.shape
    rows, stride = planes.shape[1], planes.shape[2]
    rows_used = min(rows, ((TILE_H + max_shift + 7) // 8) * 8)
    lanes_used = min(stride, ((TILE_W + max_shift + 127) // 128) * 128)
    if rows_used % 8 or (lanes_used < stride and max_shift > lanes_used - TILE_W):
        raise ValueError(f"unsupported plane geometry {planes.shape}, {max_shift}")
    # tpb capped so the SMEM feature window (tpb x F x 3 i32, double-
    # buffered) stays within budget: tpb=8 with the dual-modality F=128
    # table overflowed the 1 MB SMEM space on v5e (tpb * F <= 512 fits)
    tpb = next(d for d in (8, 4, 2, 1) if n % d == 0 and d * mf <= 512)
    # pad the template axis so the grid is a multiple of the 8 programs that
    # share one output block; pad rows point at the zero plane with lim 0,
    # so they emit -1 and are sliced away
    n_pad = -(-n // (8 * tpb)) * (8 * tpb)
    if n_pad > n:
        pad3 = jnp.full((n_pad - n, mf, 3), 0, jnp.int32).at[:, :, 0].set(
            planes.shape[0] - 1
        )
        off3 = jnp.concatenate([off3, pad3], axis=0)
        lim = jnp.concatenate(
            [lim, jnp.zeros((n_pad - n, 2), jnp.int32)], axis=0
        )
    out = pl.pallas_call(
        _make_coarse_max_kernel(rows_used, lanes_used, tpb),
        grid=(n_pad // tpb,),
        in_specs=[
            pl.BlockSpec((tpb, mf, 3), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (8, 2),
                lambda t, _tpb=tpb: (t * _tpb // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, tpb), lambda t: (t // 8, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // tpb, tpb), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n * mf * 3 * rows_used * 256,
            bytes_accessed=planes.size + n * (mf * 12 + 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(off3, lim, planes)
    return out.reshape(n_pad)[:n]


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
        # roll (lane wrap, when stride == lanes, stays >= stride - x > SCALE
        # output lanes — see linear_plane_shape invariant)
        yb = pl.multiple_of(jnp.minimum((y // 8) * 8, rows - 16), 8)
        xb = pl.multiple_of(jnp.minimum((x // 128) * 128, stride - lanes), 128)
        blk = planes_ref[p, pl.ds(yb, 16), pl.ds(xb, lanes)].astype(jnp.int32)
        blk = pltpu.roll(blk, 16 - (y - yb), axis=0)
        blk = pltpu.roll(blk[0:8], lanes - (x - xb), axis=1)
        return acc + blk[:, 0:TILE_W]

    acc = jax.lax.fori_loop(
        0, n_feat, body, jnp.zeros((8, TILE_W), jnp.int32),
        unroll=n_feat,  # Pallas lowering supports only full unroll or 1
    )
    out_ref[0] = acc


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
