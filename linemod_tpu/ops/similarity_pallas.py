"""Pallas TPU kernel for the coarse similarity scan.

Scores every template of the bank at every coarse grid cell in one kernel:
the linearized response planes (a few MB, see ops/spread.py) stay resident in
VMEM for the whole scan, each program accumulates one template's 64 features
as (32 x 128) sublane/lane-tile dynamic slices of the plane stack, and the
per-template feature table arrives through a blocked SMEM input. This is the
TPU reshaping of the reference engine's "linearized memories" trick
(cv::linemod's SIMD sliding window, used at src/HighLevelLinemod.cpp:152):
the whole working set sits in on-chip memory, so the scan is VPU-bound, not
HBM-bound.

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


def _coarse_kernel(off_ref, planes_ref, out_ref):
    """off_ref: [1, F, 3] SMEM (plane, sy, sx); planes_ref: [P, rows,
    stride] VMEM; out_ref: [1, TILE_H, TILE_W] VMEM int32.

    Mosaic requires dynamically-offset vector loads to be tile-aligned
    (sublane multiples of 8, lane multiples of 128), so the feature shift
    (sy, sx) is realized as a static full-plane load followed by dynamic
    rotations (tpu.dynamic_rotate) on both minor axes; the aligned top-left
    (TILE_H, TILE_W) corner of the rotated plane is then plane[sy:, sx:].
    """
    n_feat = off_ref.shape[1]
    rows = planes_ref.shape[1]
    stride = planes_ref.shape[2]

    def body(f, acc):
        p = off_ref[0, f, 0]
        sy = off_ref[0, f, 1]
        sx = off_ref[0, f, 2]
        plane = planes_ref[p].astype(jnp.int32)  # rotate needs 32-bit data
        plane = pltpu.roll(plane, rows - sy, axis=0)
        plane = pltpu.roll(plane, stride - sx, axis=1)
        return acc + plane[0:TILE_H, 0:TILE_W]

    acc = jax.lax.fori_loop(
        0, n_feat, body, jnp.zeros((TILE_H, TILE_W), jnp.int32)
    )
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def coarse_scores_pallas(planes: jax.Array, off3: jax.Array, interpret: bool = False):
    """planes: [P(+1 zero), rows, stride] uint8 linearized response planes;
    off3: [N, F, 3] int32 per-feature (plane, sy, sx) with invalid
    features pointing at the zero plane (F = 64, or 128 dual-modality).
    Returns scores [N, TILE_H, TILE_W] int32 (crop to the real grid outside)."""
    n, mf, _ = off3.shape
    return pl.pallas_call(
        _coarse_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, mf, 3), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, TILE_H, TILE_W), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n * mf * TILE_H * TILE_W,
            bytes_accessed=planes.size + n * (mf * 12 + TILE_H * TILE_W * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(off3, planes)


def feature_plane_triplets(feats, valids, t, zero_plane_idx):
    """Per-feature (plane, sy, sx) triplets for the Pallas kernel.

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
