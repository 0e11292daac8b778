"""Kinect2 frame-transform semantics (C12, /root/reference/src/Kinect2.cpp:41-61)."""

import numpy as np
import jax.numpy as jnp

from linemod_tpu.ops.registration import (
    CROP_X0,
    CROP_Y0,
    kinect_frame_transform,
    register_depth_to_color,
)


def _k(fx, fy, cx, cy):
    return jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)


class TestRegisterDepthToColor:
    def test_identity_extrinsics_same_intrinsics_is_identity(self):
        rng = np.random.default_rng(0)
        depth = np.zeros((64, 96), np.float32)
        depth[16:48, 24:72] = rng.uniform(500, 900, (32, 48)).astype(np.float32)
        k = _k(80.0, 80.0, 48.0, 32.0)
        out = np.asarray(
            register_depth_to_color(
                jnp.asarray(depth), k, k, jnp.eye(3), jnp.zeros(3),
                out_width=96, out_height=64,
            )
        )
        np.testing.assert_allclose(out, depth, atol=1e-3)

    def test_pure_x_translation_shifts_columns(self):
        # A camera displaced by tx along x sees the surface shifted by
        # u' = u + fx*tx/z exactly (constant-depth plane).
        depth = np.zeros((64, 96), np.float32)
        depth[20:40, 30:60] = 800.0
        k = _k(100.0, 100.0, 48.0, 32.0)
        tx = 40.0  # mm -> shift = 100*40/800 = 5 px
        out = np.asarray(
            register_depth_to_color(
                jnp.asarray(depth), k, k, jnp.eye(3),
                jnp.asarray([tx, 0.0, 0.0], jnp.float32),
                out_width=96, out_height=64,
            )
        )
        np.testing.assert_allclose(out[20:40, 35:65], 800.0)
        assert np.all(out[20:40, 30:35] == 0.0)

    def test_nearest_surface_wins(self):
        # Two depth pixels projecting to the same color pixel: keep the nearer.
        k_d = _k(100.0, 100.0, 1.0, 0.0)
        k_c = _k(100.0, 100.0, 0.0, 0.0)
        depth = np.array([[1000.0, 500.0]], np.float32)  # u_d=0 -> x3=-10mm...
        # with cx_d=1: pixel u=0 -> x=-z/100; pixel u=1 -> x=0.
        # In the color camera (cx=0): pixel u=1 maps to u_c=-1 (clipped),
        # pixel u=... craft simpler: both pixels at x=0 via rot? Use direct:
        depth = np.array([[800.0, 400.0]], np.float32)
        # u=0: x=(0-1)*z/100; u=1: x=0 -> u_c = 0 for pixel 1 only.
        out = np.asarray(
            register_depth_to_color(
                jnp.asarray(depth), k_d, k_c, jnp.eye(3), jnp.zeros(3),
                out_width=2, out_height=1,
            )
        )
        assert out[0, 0] == 400.0


class TestKinectFrameTransform:
    def test_crop_convert_flip(self):
        bgra = np.zeros((1080, 1920, 4), np.uint8)
        big = np.zeros((1082, 1920), np.float32)
        # marker at color pixel (y=CROP_Y0+10, x=CROP_X0+20) -> after crop it
        # is at (10, 20), after hflip at (10, 639-20)
        bgra[CROP_Y0 + 10, CROP_X0 + 20] = (10, 20, 30, 255)
        # depth marker at the SAME padded coordinates (reference crops the
        # padded big depth with the color rect)
        big[CROP_Y0 + 10, CROP_X0 + 20] = 1234.6
        color, depth = kinect_frame_transform(bgra, big)
        assert color.shape == (480, 640, 3) and color.dtype == np.uint8
        assert depth.shape == (480, 640) and depth.dtype == np.uint16
        assert tuple(color[10, 639 - 20]) == (10, 20, 30)
        assert depth[10, 639 - 20] == 1235  # rounded mm

    def test_unpadded_bigdepth_accepted(self):
        bgra = np.zeros((1080, 1920, 4), np.uint8)
        big = np.full((1080, 1920), 700.0, np.float32)
        _, depth = kinect_frame_transform(bgra, big)
        assert depth.shape == (480, 640)
        assert np.all(depth == 700)

    def test_saturation_and_nan(self):
        bgra = np.zeros((1080, 1920, 4), np.uint8)
        big = np.zeros((1082, 1920), np.float32)
        big[CROP_Y0 + 1, CROP_X0 + 1] = 1e9
        big[CROP_Y0 + 2, CROP_X0 + 2] = np.nan
        big[CROP_Y0 + 3, CROP_X0 + 3] = np.inf
        _, depth = kinect_frame_transform(bgra, big)
        assert depth[1, 639 - 1] == 65535
        assert depth[2, 639 - 2] == 0
        assert depth[3, 639 - 3] == 0
