"""Match post-processing: grouping, color/depth validation, pose reconstruction.

Reproduces HighLevelLineMOD's detect-time chain (src/HighLevelLinemod.cpp):

- `group_matches`: 2-D clustering of matches within `group_radius` px of the
  group founder (groupSimilarMatches :206-229);
- `discard_small_groups`: drop groups whose integer percentage of the biggest
  group is <= discard ratio (discardSmallMatchGroups :232-253, including the
  C++ integer division);
- `color_check`: fraction of pixels inside the template's feature convex hull
  whose HSV falls in the model's range (colorCheck :424-434, templateMask
  :113-135) — evaluated as a batched half-plane rasterization in JAX;
- `depth_check`: scene-vs-template ~p20 depth gate with the shiny-object
  z-correction (depthCheck :437-457);
- `reconstruct_pose`: pixel->metric translation with the reference's
  calcTrueZ quirk (mm^2 minus px^2, :512-515) and view-ray rotation
  adjustment (calcRotation :488-495).

Grouping and the final per-group scalar math run on host (tiny); the image
checks are jitted and batched over candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ObjectPose
from ..utils.geometry import mat_to_quat, quat_to_mat, view_ray_rotation

CHECK_WINDOW = 384  # static crop around a candidate for the image checks
DEPTH_BINS = 4096  # 1 mm histogram bins for the percentile gate
BG_DEPTH = 65535.0


def group_matches(xs, ys, radius: float):
    """Greedy founder-based grouping; returns list of index lists.

    Matches must already be similarity-sorted (they are, coming from
    match_templates)."""
    groups = []  # (founder_x, founder_y, [indices])
    for i in range(len(xs)):
        placed = False
        for g in groups:
            if np.hypot(xs[i] - g[0], ys[i] - g[1]) < radius:
                g[2].append(i)
                placed = True
                break
        if not placed:
            groups.append((xs[i], ys[i], [i]))
    return [g[2] for g in groups]


def discard_small_groups(groups, ratio: float):
    if not groups:
        return groups
    biggest = max(len(g) for g in groups)
    # C++ size_t arithmetic: integer percentage, strict > (src:246-247)
    return [g for g in groups if (len(g) * 100 // biggest) > ratio]


@jax.jit
def bgr_to_hsv_inrange(img: jax.Array, lower: jax.Array, upper: jax.Array):
    """OpenCV-convention BGR->HSV (H in 0..180) + inRange mask.

    img: [H, W, 3] f32 0..255 BGR. lower/upper: [3] (H, S, V).
    """
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    s = jnp.where(v > 0, diff * 255.0 / jnp.maximum(v, 1e-6), 0.0)
    safe = jnp.maximum(diff, 1e-6)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(h < 0, h + 360.0, h) * 0.5  # OpenCV: H/2 for uint8
    hsv = jnp.stack([h, s, v], axis=-1)
    return jnp.all((hsv >= lower) & (hsv <= upper), axis=-1)


@functools.partial(jax.jit, static_argnames=("window",))
def color_check_batch(
    inrange: jax.Array,  # [H, W] bool, precomputed HSV in-range mask
    hulls: jax.Array,  # [K, HV, 2] f32 hull vertices, bbox-relative CCW
    match_xy: jax.Array,  # [K, 2] int32 match positions (bbox top-left)
    window: int = CHECK_WINDOW,
):
    """Percentage of hull-interior pixels that are HSV-in-range, per candidate.

    `window` is a static crop size; it must cover the largest template bbox
    (detect_core derives it from the bank at build time)."""
    h, w = inrange.shape
    pad = jnp.pad(inrange, ((0, window), (0, window)))

    yy = jnp.arange(window, dtype=jnp.float32)[:, None]
    xx = jnp.arange(window, dtype=jnp.float32)[None, :]

    def one(hull, xy):
        win = jax.lax.dynamic_slice(
            pad, (xy[1], xy[0]), (window, window)
        )
        # point-in-convex-polygon: all edge cross products >= 0 (CCW hull),
        # folded over edges so only one [W, W] plane is live at a time
        v0 = hull  # [HV, 2]
        v1 = jnp.roll(hull, -1, axis=0)
        e = v1 - v0  # [HV, 2]

        def edge(i, inside):
            ex = e[i, 0]
            ey = e[i, 1]
            cross = ex * (yy - v0[i, 1]) - ey * (xx - v0[i, 0])
            degenerate = (ex == 0.0) & (ey == 0.0)  # padded repeat-vertices
            return inside & (degenerate | (cross >= 0.0))

        inside = jax.lax.fori_loop(
            0, hull.shape[0], edge, jnp.ones((window, window), bool)
        )
        denom = jnp.sum(inside)
        num = jnp.sum(inside & win)
        return num.astype(jnp.float32) * 100.0 / jnp.maximum(denom, 1).astype(jnp.float32)

    return jax.vmap(one)(hulls, match_xy.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("window",))
def depth_p20_batch(
    depth: jax.Array,  # [H, W] f32 mm
    match_xy: jax.Array,  # [K, 2] int32
    bbox_wh: jax.Array,  # [K, 2] int32 template bbox size
    window: int = CHECK_WINDOW,
):
    """~p20 of scene depth over each candidate's bbox, background as 65535
    (medianMat semantics, src/HighLevelLinemod.cpp:336-349; exact 20th
    percentile via a 1 mm histogram)."""
    pad = jnp.pad(depth, ((0, window), (0, window)))

    def one(xy, wh):
        win = jax.lax.dynamic_slice(pad, (xy[1], xy[0]), (window, window))
        yy = jnp.arange(window, dtype=jnp.int32)[:, None]
        xx = jnp.arange(window, dtype=jnp.int32)[None, :]
        in_bb = (yy < wh[1]) & (xx < wh[0])
        vals = jnp.clip(jnp.where(win > 0, win, BG_DEPTH), 0, DEPTH_BINS - 1)
        vals = jnp.where(in_bb, vals, jnp.float32(DEPTH_BINS))  # excluded sorts last
        k = (wh[0] * wh[1]) // 5

        # Two-level threshold-count percentile (64 coarse + 64 fine masked
        # sums; scatter-free, exact to 1 mm). count_less(e) = #values < e.
        def count_less(e):
            return jnp.sum(vals < e)

        coarse_edges = jnp.arange(1, 65, dtype=jnp.float32) * 64.0  # 64 .. 4096
        cnt_c = jax.vmap(count_less)(coarse_edges)  # [64] cumulative
        b = jnp.argmax(cnt_c > k)  # first coarse bin whose cum exceeds k
        base = b.astype(jnp.float32) * 64.0
        fine_edges = base + jnp.arange(1, 65, dtype=jnp.float32)
        cnt_f = jax.vmap(count_less)(fine_edges)
        v = jnp.argmax(cnt_f > k).astype(jnp.float32) + base
        return v

    return jax.vmap(one)(match_xy.astype(jnp.int32), bbox_wh.astype(jnp.int32))


def reconstruct_pose(
    match_x: float,
    match_y: float,
    bbox: np.ndarray,  # template bbox (x, y, w, h) at level 0
    template_quat: np.ndarray,
    direct_depth: float,
    cam,
) -> ObjectPose:
    """Closed-form translation + view-ray rotation (src/HighLevelLinemod.cpp:459-515)."""
    w2 = cam.width / 2.0
    h2 = cam.height / 2.0
    pixel_x = match_x + w2 - bbox[0]
    pixel_y = match_y + h2 - bbox[1]
    off = np.hypot(pixel_x - w2, pixel_y - h2)
    # calcTrueZ: the reference subtracts a squared *pixel* distance from a
    # squared mm distance (:512-515) — reproduced for behavioral parity.
    z = float(np.sqrt(max(direct_depth * direct_depth - off * off, 1.0)))
    mm_per_px = z / cam.fy
    x = (pixel_x - w2) * mm_per_px
    y = (pixel_y - h2) * mm_per_px
    adjust = view_ray_rotation([x, y, z])
    rot = adjust @ quat_to_mat(template_quat)
    return ObjectPose(
        translation=np.array([x, y, z], np.float64),
        quaternion=mat_to_quat(rot),
        bounding_box=(int(match_x), int(match_y), int(bbox[2]), int(bbox[3])),
    )
