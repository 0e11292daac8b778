"""Single-program per-frame detection core.

One jitted function runs the full per-frame device work — pyramid match of
the whole bank plus the color/depth validation signals for the top candidates
— and returns one small packed array, so the host does exactly ONE
device->host fetch per frame (each fetch has high latency through the remote
TPU transport; the reference's equivalent loop is all host-side so it never
faced this).

The checks run over a static window around each candidate (the window size is
derived from the bank's largest template bbox at build time), via the batched
forms in ops/postprocess.py — a dynamic-slice crop is ~6x less work per
candidate than the full-frame folds used previously.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .matching import MatchState, match_templates
from .postprocess import (
    bgr_to_hsv_inrange,
    color_check_batch,
    depth_p20_batch,
)

CHECK_K = 64  # candidates that get check signals (sorted by similarity)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["hull", "bbox_wh", "lower", "upper"],
    meta_fields=["window"],
)
@dataclasses.dataclass
class CheckState:
    """Device-resident per-template data for the validation checks."""

    hull: jax.Array  # [N, HV, 2] f32 bbox-relative CCW hulls
    bbox_wh: jax.Array  # [N, 2] i32 template bbox (w, h)
    lower: jax.Array  # [3] HSV in-range bounds
    upper: jax.Array
    window: int = 384  # static per-candidate crop (covers the largest bbox)


def make_check_state(bank, props) -> CheckState:
    max_wh = int(np.max(bank.bbox[:, 2:4])) if bank.bbox.shape[0] else 1
    window = max(128, int(np.ceil((max_wh + 1) / 128.0)) * 128)
    return CheckState(
        hull=jnp.asarray(bank.hull, jnp.float32),
        bbox_wh=jnp.asarray(bank.bbox[:, 2:4], jnp.int32),
        lower=jnp.asarray(np.asarray(props.lower_color_range, np.float32)),
        upper=jnp.asarray(np.asarray(props.upper_color_range, np.float32)),
        window=window,
    )


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
    xy = jnp.stack([m["x"][:CHECK_K], m["y"][:CHECK_K]], axis=1).astype(jnp.int32)
    inrange = bgr_to_hsv_inrange(colorf, check.lower, check.upper)
    pct = color_check_batch(inrange, check.hull[tid], xy, window=check.window)
    p20 = depth_p20_batch(depthf, xy, check.bbox_wh[tid], window=check.window)

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
