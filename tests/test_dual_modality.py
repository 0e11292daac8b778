"""Dual-modality (gradient + surface-normal) end-to-end detection test."""

import numpy as np
import pytest

from linemod_tpu.config import CameraParameters, ModelProperties, TemplateSettings
from linemod_tpu.models.template_bank import build_template_bank
from linemod_tpu.ops.rasterizer import mesh_to_arrays, render_views
from linemod_tpu.pipeline.pose_detection import PoseDetection
from linemod_tpu.utils.geometry import quat_to_mat

from test_matching import cube_mesh


@pytest.fixture(scope="module")
def dual_setup():
    cam = CameraParameters(fx=500.0, fy=500.0, cx=320, cy=240, width=640, height=480)
    settings = TemplateSettings(
        only_color_modality=False,  # dual: ColorGradient + DepthNormal, T={5,8}
        distance_start=600,
        distance_stop=600,
        subdivisions=0,
        angle_start=-45,
        angle_stop=45,
        angle_step=45,
        depth_offset=0.0,
    )
    props = ModelProperties(planes_of_symmetry=(1.0, 1.0, 1.0))
    mesh = cube_mesh()
    bank = build_template_bank(mesh, "cube", cam, settings, props)
    return cam, settings, props, mesh, bank


class TestDualModality:
    def test_bank_has_normal_features(self, dual_setup):
        cam, settings, props, mesh, bank = dual_setup
        assert bank.dual_modality
        assert bank.nfeat0 is not None
        assert np.all(bank.nvalid0.sum(1) >= 4)

    def test_dual_detect(self, dual_setup):
        cam, settings, props, mesh, bank = dual_setup
        t = 4
        rot = quat_to_mat(bank.quat[t]).astype(np.float32)
        depth, color = render_views(
            mesh_to_arrays(mesh), rot[None], np.array([[0, 0, 600.0]], np.float32),
            cam, with_color=True,
        )
        det = PoseDetection(bank, cam, settings, props)
        poses = det.detect(
            (np.asarray(color)[0] * 255).astype(np.uint8),
            np.asarray(depth)[0].astype(np.uint16),
            1,
        )
        assert len(poses) == 1
        p = poses[0]
        assert abs(p.translation[2] - 600) < 25
        assert abs(p.translation[0]) < 15 and abs(p.translation[1]) < 15

    def test_dual_detect_off_centre(self, dual_setup):
        """Off-centre objects must match as well as centred ones.

        Regression for the coarse->fine window mapping: with t_fine=5 one
        coarse cell spans 3.2 fine cells, so the window origin must be the
        exact fine-grid cell (gx*2*t_coarse)//t_fine — the old gx*scale
        mapping drifted ~1 px per coarse-cell index (~26 px at gx=26), which
        only off-centre objects exposed."""
        cam, settings, props, mesh, bank = dual_setup
        det = PoseDetection(bank, cam, settings, props)
        t = 4
        rot = quat_to_mat(bank.quat[t]).astype(np.float32)
        marr = mesh_to_arrays(mesh)
        for ox, oy in [(0.0, 0.0), (170.0, 90.0), (-160.0, -80.0)]:
            depth, color = render_views(
                marr, rot[None], np.array([[ox, oy, 600.0]], np.float32),
                cam, with_color=True,
            )
            handle = det.detect_submit(
                (np.asarray(color)[0] * 255).astype(np.uint8),
                np.asarray(depth)[0].astype(np.uint16),
            )
            packed = np.asarray(handle[0])
            valid = packed[:, 4] > 0.5
            assert valid.any(), f"no match at offset ({ox}, {oy})"
            # well above threshold everywhere (the residual few points vs the
            # perfect centred 100 are rasterization pixel-phase noise — the
            # color-only path drops further on the same frames)
            assert float(packed[valid, 3].max()) > 85.0
            poses = det.detect_collect(handle, 1)
            assert len(poses) == 1
            p = poses[0]
            assert abs(p.translation[0] - ox) < 20
            assert abs(p.translation[1] - oy) < 20
            assert abs(p.translation[2] - 600) < 30

    def test_fine_window_mapping_exact_under_translation(self, dual_setup):
        """A pure image translation by multiples of t_fine must keep the fine
        similarity exactly at its centred value (100): the level-0 content
        under the features is bit-identical, so any drop can only come from a
        wrong coarse->fine window origin. dx=85, dy=45 are multiples of
        t_fine=5 but NOT of the 16-px coarse cell, so this catches the
        gx*scale drift the round-2 review found."""
        cam, settings, props, mesh, bank = dual_setup
        det = PoseDetection(bank, cam, settings, props)
        t = 4
        rot = quat_to_mat(bank.quat[t]).astype(np.float32)
        depth, color = render_views(
            mesh_to_arrays(mesh), rot[None], np.array([[0, 0, 600.0]], np.float32),
            cam, with_color=True,
        )
        color0 = (np.asarray(color)[0] * 255).astype(np.uint8)
        depth0 = np.asarray(depth)[0].astype(np.uint16)

        def best(colour, dep):
            packed = np.asarray(det.detect_submit(colour, dep)[0])
            valid = packed[:, 4] > 0.5
            assert valid.any()
            i = np.argmax(np.where(valid, packed[:, 3], -1))
            return packed[i, 3], packed[i, 1], packed[i, 2]

        sim0, x0, y0 = best(color0, depth0)
        for dx, dy in [(85, 45), (165, 0), (0, 125), (-90, -35)]:
            sim, x, y = best(
                np.roll(color0, (dy, dx), axis=(0, 1)),
                np.roll(depth0, (dy, dx), axis=(0, 1)),
            )
            assert sim >= sim0 - 1e-3, f"shift ({dx},{dy}): sim {sim} vs {sim0}"
            assert (x - x0, y - y0) == (dx, dy)


def test_dual_delta_transport_bit_identical(dual_setup):
    """detect_frame_dual_delta == detect_frame_dual on the same frame."""
    import jax.numpy as jnp

    from linemod_tpu.ops.detect_core import (
        delta_encode_host,
        detect_frame_dual,
        detect_frame_dual_delta,
    )

    cam, settings, props, mesh, bank = dual_setup
    det = PoseDetection(bank, cam, settings, props)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (480, 640, 3)).astype(np.uint8)
    depth = rng.uniform(400, 900, (480, 640)).astype(np.float32)
    ref = np.asarray(detect_frame_dual(det.state, jnp.asarray(img), jnp.asarray(depth)))
    got = np.asarray(
        detect_frame_dual_delta(
            det.state, jnp.asarray(delta_encode_host(img)), jnp.asarray(depth)
        )
    )
    np.testing.assert_array_equal(ref, got)
