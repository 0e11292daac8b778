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
