"""Single-program per-frame detection core.

One jitted function runs the full per-frame device work — pyramid match of
the whole bank plus the color/depth validation signals for the top candidates
— and returns one small packed array, so the host does exactly ONE
device->host fetch per frame (each fetch has high latency through the remote
TPU transport; the reference's equivalent loop is all host-side so it never
faced this).

The checks are evaluated in full-frame map-reduce form (no per-candidate
dynamic windows): the hull mask is a fold over half-planes, the ~p20 depth
percentile a two-level threshold count. Both are exact equivalents of
ops/postprocess.py's windowed versions.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .matching import MatchState, match_templates
from .postprocess import BG_DEPTH, DEPTH_BINS, bgr_to_hsv_inrange

CHECK_K = 64  # candidates that get check signals (sorted by similarity)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["hull", "bbox_wh", "lower", "upper"],
    meta_fields=[],
)
@dataclasses.dataclass
class CheckState:
    """Device-resident per-template data for the validation checks."""

    hull: jax.Array  # [N, HV, 2] f32 bbox-relative CCW hulls
    bbox_wh: jax.Array  # [N, 2] i32 template bbox (w, h)
    lower: jax.Array  # [3] HSV in-range bounds
    upper: jax.Array


def make_check_state(bank, props) -> CheckState:
    return CheckState(
        hull=jnp.asarray(bank.hull, jnp.float32),
        bbox_wh=jnp.asarray(bank.bbox[:, 2:4], jnp.int32),
        lower=jnp.asarray(np.asarray(props.lower_color_range, np.float32)),
        upper=jnp.asarray(np.asarray(props.upper_color_range, np.float32)),
    )


def _color_pct_full(inrange, hull, xy):
    """Hull-interior HSV pass percentage, full-frame fold over edges."""
    h, w = inrange.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    v0 = hull + xy[None, :].astype(jnp.float32)  # hull at the match position
    v1 = jnp.roll(v0, -1, axis=0)
    e = v1 - v0

    def edge(i, inside):
        ex = e[i, 0]
        ey = e[i, 1]
        cross = ex * (yy - v0[i, 1]) - ey * (xx - v0[i, 0])
        degenerate = (ex == 0.0) & (ey == 0.0)
        return inside & (degenerate | (cross >= 0.0))

    inside = jax.lax.fori_loop(0, hull.shape[0], edge, jnp.ones((h, w), bool))
    denom = jnp.maximum(jnp.sum(inside), 1)
    num = jnp.sum(inside & inrange)
    return num.astype(jnp.float32) * 100.0 / denom.astype(jnp.float32)


def _p20_full(depth, xy, wh):
    """~p20 of depth over the candidate bbox (bg = 65535), full-frame masks."""
    h, w = depth.shape
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    in_bb = (
        (yy >= xy[1]) & (yy < xy[1] + wh[1]) & (xx >= xy[0]) & (xx < xy[0] + wh[0])
    )
    vals = jnp.clip(jnp.where(depth > 0, depth, BG_DEPTH), 0, DEPTH_BINS - 1)
    vals = jnp.where(in_bb, vals, jnp.float32(DEPTH_BINS))
    k = (wh[0] * wh[1]) // 5

    def count_less(e):
        return jnp.sum(vals < e)

    coarse = jax.vmap(count_less)(jnp.arange(1, 65, dtype=jnp.float32) * 64.0)
    b = jnp.argmax(coarse > k).astype(jnp.float32) * 64.0
    fine = jax.vmap(count_less)(b + jnp.arange(1, 65, dtype=jnp.float32))
    return jnp.argmax(fine > k).astype(jnp.float32) + b


@jax.jit
def detect_frame(state: MatchState, check: CheckState, color: jax.Array, depth: jax.Array):
    """Full per-frame device program.

    color: [H, W, 3] uint8 BGR; depth: [H, W] uint16/float mm (both already
    principal-point recentred). Returns packed [top_k, 7] f32:
    (template_id, x, y, similarity, valid, color_pct, scene_p20) — check
    columns are only populated for the first CHECK_K candidates (the rest are
    -1; candidates are similarity-sorted so these are the only ones grouping
    can surface).
    """
    colorf = color.astype(jnp.float32)
    depthf = depth.astype(jnp.float32)
    m = match_templates(state, colorf, depthf)

    tid = m["template_id"][:CHECK_K]
    xy = jnp.stack([m["x"][:CHECK_K], m["y"][:CHECK_K]], axis=1)
    inrange = bgr_to_hsv_inrange(colorf, check.lower, check.upper)
    pct = jax.vmap(lambda t, p: _color_pct_full(inrange, check.hull[t], p))(tid, xy)
    p20 = jax.vmap(lambda t, p: _p20_full(depthf, p, check.bbox_wh[t]))(tid, xy)

    k = m["template_id"].shape[0]
    fill = jnp.full((k - CHECK_K,), -1.0, jnp.float32)
    packed = jnp.stack(
        [
            m["template_id"].astype(jnp.float32),
            m["x"].astype(jnp.float32),
            m["y"].astype(jnp.float32),
            m["similarity"],
            m["valid"].astype(jnp.float32),
            jnp.concatenate([pct, fill]),
            jnp.concatenate([p20, fill]),
        ],
        axis=1,
    )
    return packed
