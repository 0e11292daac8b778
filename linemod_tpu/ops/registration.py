"""Depth-to-color registration + Kinect v2 frame transforms (C12).

Re-implements the frame math of the reference's Kinect2 wrapper
(/root/reference/src/Kinect2.cpp:41-61) as pure array ops, so the sensor
semantics are testable without libfreenect2 or USB hardware:

1. `register_depth_to_color`: project every depth-camera pixel to 3-D with
   the depth (IR) intrinsics, transform by the depth->color extrinsics, and
   z-buffer-scatter into the color camera's pixel grid (the role of
   libfreenect2's Registration::apply "big depth" output). The scatter-min
   z-buffer is the same XLA pattern the rasterizer uses.
2. `kinect_frame_transform`: float mm -> uint16, the reference's center crop
   of the 1920x1082 big-depth / 1920x1080 BGRA frame to 640x480
   (cv::Rect Point(640, 301) .. Point(1280, 781), src/Kinect2.cpp:53-56),
   BGRA->BGR, and horizontal flip (src/Kinect2.cpp:58-60).

The live-capture entry (device open, USB streaming) remains hardware-gated in
pipeline/sensors.py; these ops are the testable core it would feed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Reference crop: cv::Rect(Point(320+320, 61+240), Point(1600-320, 1021-240))
# on the 1920-wide frames (src/Kinect2.cpp:53-56) -> x 640..1280, y 301..781.
CROP_X0, CROP_Y0 = 640, 301
CROP_W, CROP_H = 640, 480
BIGDEPTH_PAD_ROWS = 1  # libfreenect2 bigdepth is 1920 x (1080 + 2)


@functools.partial(jax.jit, static_argnames=("out_width", "out_height"))
def register_depth_to_color(
    depth: jax.Array,  # [Hd, Wd] f32 mm, depth-camera frame (0 = invalid)
    k_depth: jax.Array,  # [3, 3] depth (IR) camera intrinsics
    k_color: jax.Array,  # [3, 3] color camera intrinsics
    rot: jax.Array,  # [3, 3] depth->color rotation
    trans: jax.Array,  # [3] depth->color translation (mm)
    *,
    out_width: int = 1920,
    out_height: int = 1080,
) -> jax.Array:
    """Reproject a depth image into the color camera ("big depth").

    Returns [out_height, out_width] f32 mm with 0 where no depth projects.
    Nearest-surface wins (scatter-min z-buffer).
    """
    hd, wd = depth.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(hd, dtype=jnp.float32),
        jnp.arange(wd, dtype=jnp.float32),
        indexing="ij",
    )
    z = depth
    valid = z > 0
    x3 = (xx - k_depth[0, 2]) * z / k_depth[0, 0]
    y3 = (yy - k_depth[1, 2]) * z / k_depth[1, 1]
    pts = jnp.stack([x3, y3, z], axis=-1).reshape(-1, 3)  # [Hd*Wd, 3]
    cam = pts @ rot.T + trans
    zc = cam[:, 2]
    u = cam[:, 0] / zc * k_color[0, 0] + k_color[0, 2]
    v = cam[:, 1] / zc * k_color[1, 1] + k_color[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    ok = (
        valid.reshape(-1)
        & (zc > 0)
        & (ui >= 0)
        & (ui < out_width)
        & (vi >= 0)
        & (vi < out_height)
    )
    flat = jnp.where(ok, vi * out_width + ui, out_width * out_height)
    big = jnp.full((out_width * out_height + 1,), jnp.inf, jnp.float32)
    big = big.at[flat].min(jnp.where(ok, zc, jnp.inf))
    big = big[:-1].reshape(out_height, out_width)
    return jnp.where(jnp.isfinite(big), big, 0.0)


def kinect_frame_transform(bgra: np.ndarray, bigdepth: np.ndarray):
    """Crop/convert/flip a registered Kinect v2 frame pair to the pipeline's
    640x480 (BGR uint8, depth uint16 mm) format (src/Kinect2.cpp:50-60).

    bgra: [1080, 1920, 4] uint8; bigdepth: [1080(+2), 1920] f32 mm (the
    libfreenect2 big-depth layout with one padding row top and bottom).

    Parity quirk: the reference applies the SAME crop rect to the 1082-row
    big depth and the 1080-row color image (src/Kinect2.cpp:53-56), so its
    depth crop sits one row higher on the sensor than the color crop. When a
    padded big depth is passed, we reproduce that off-by-one exactly.
    """
    bigdepth = np.asarray(bigdepth, np.float32)
    if bigdepth.shape[0] == 1080 + 2 * BIGDEPTH_PAD_ROWS:
        bigdepth = bigdepth[:-2 * BIGDEPTH_PAD_ROWS]  # rows 301..781 of the
        # padded frame == rows 300..780 unpadded (reference off-by-one kept)
    # float mm -> uint16 (convertTo CV_16UC1 saturates + rounds)
    d16 = np.clip(np.rint(np.nan_to_num(bigdepth, posinf=0.0)), 0, 65535).astype(
        np.uint16
    )
    depth = d16[CROP_Y0 : CROP_Y0 + CROP_H, CROP_X0 : CROP_X0 + CROP_W]
    color = np.asarray(bgra)[CROP_Y0 : CROP_Y0 + CROP_H, CROP_X0 : CROP_X0 + CROP_W, :3]
    # horizontal flip (cv::flip(..., 1))
    return np.ascontiguousarray(color[:, ::-1]), np.ascontiguousarray(depth[:, ::-1])
