"""Accuracy metrics: Hodan/BOP-style VSD, LINEMOD ADD, ADD-S.

Re-implements the reference Benchmark class (C8, src/Benchmark.cpp) with
identical thresholds:

- VSD (calculateErrorHodan :18-38 + calculateVisibilityMasks :133-154):
  render GT and estimate depth, compute visibility vs the measured scene with
  a 15 mm occlusion tolerance, error = 1 - |match ∩ inter| / |union| with a
  20 mm per-pixel depth threshold; correct if error < 0.3.
- ADD (calculateErrorLM :40-75): mean vertex distance between GT- and
  estimate-transformed model clouds; correct if <= object diameter threshold.
- ADD-S (calculateErrorLMAmbigous :84-131): symmetric min-distance variant
  over a subsampled cloud (every 40th vertex) — the O(N^2) OpenMP loop of the
  reference becomes one MXU distance matmul.

All jitted; renders go through the matmul rasterizer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rasterizer import MeshArrays, render

VISIBILITY_TOLERANCE_MM = 15.0  # include/Benchmark.h:92
ERROR_THRESHOLD_MM = 20.0  # include/Benchmark.h:98
VSD_CORRECT = 0.3  # src/Benchmark.cpp:33
OBJECT_DIAMETER = 21.0  # include/Benchmark.h:105 (reference constant)
ADDS_SUBSAMPLE = 40  # include/Benchmark.h:86


@jax.jit
def visibility_masks(gt_render, est_render, scene_depth):
    """Reference visibility logic (src/Benchmark.cpp:133-154).

    A rendered surface is visible where it exists and is not more than 15 mm
    behind the measured scene surface; the estimate additionally inherits
    visibility wherever the GT object is visible and the estimate rendered
    (so self-misalignment is not excused by 'occlusion' from the GT object).
    """
    occ_gt = (gt_render - scene_depth) > VISIBILITY_TOLERANCE_MM
    vis_gt = (gt_render > 0) & ~occ_gt
    occ_est = (est_render - scene_depth) > VISIBILITY_TOLERANCE_MM
    vis_est = (est_render > 0) & ~occ_est
    vis_est = vis_est | (vis_gt & (est_render > 0))
    return vis_gt, vis_est


@jax.jit
def vsd_error(gt_render, est_render, scene_depth):
    """error = 1 - |closer-than-20mm ∩ intersection| / |union|."""
    vis_gt, vis_est = visibility_masks(gt_render, est_render, scene_depth)
    inter = vis_gt & vis_est
    union = vis_gt | vis_est
    close = jnp.abs(gt_render - est_render) < ERROR_THRESHOLD_MM
    num = jnp.sum(close & inter)
    den = jnp.maximum(jnp.sum(union), 1)
    return 1.0 - num.astype(jnp.float32) / den.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_pose_depth(mesh: MeshArrays, rot, trans, fx, fy, *, width, height):
    """Depth render with centred principal point (renderPose, src/Benchmark.cpp:156-163)."""
    return render(
        mesh, rot, trans, fx, fy, width / 2.0, height / 2.0, width=width, height=height
    )


@jax.jit
def add_error(vertices, rot_gt, t_gt, rot_est, t_est):
    """Mean vertex distance (calculateErrorLM)."""
    a = vertices @ rot_gt.T + t_gt
    b = vertices @ rot_est.T + t_est
    return jnp.mean(jnp.linalg.norm(a - b, axis=1))


@jax.jit
def adds_error(sub_vertices, rot_gt, t_gt, rot_est, t_est):
    """Symmetric min-distance error over a subsampled cloud (calculateErrorLMAmbigous).

    The N^2 distance matrix rides the MXU: ||a_i - b_j||^2 =
    |a|^2 + |b|^2 - 2 a.b."""
    a = sub_vertices @ rot_gt.T + t_gt  # [N, 3]
    b = sub_vertices @ rot_est.T + t_est
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=1)))
