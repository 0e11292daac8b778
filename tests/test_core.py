"""Unit tests for the data/core layer: config, yaml, geometry, viewpoints, PLY."""

import numpy as np
import pytest

from linemod_tpu.config import (
    CameraParameters,
    load_model_properties,
    load_settings,
)
from linemod_tpu.models.viewpoints import (
    camera_view_points,
    icosphere,
    prune_by_symmetry,
    rot_sym_circle,
)
from linemod_tpu.utils.geometry import (
    GL_TO_CV,
    look_at,
    mat_to_quat,
    quat_to_mat,
    rotation_about_axis,
    template_view_pose,
    view_ray_rotation,
)
from linemod_tpu.utils.ply import Mesh, load_ply, save_ply
from linemod_tpu.utils.yamlcv import read_yamlcv, write_yamlcv


class TestConfig:
    def test_reads_reference_settings(self, fixture_paths):
        cam, ts = load_settings(fixture_paths["settings"])
        assert cam.width == 640 and cam.height == 480
        assert cam.fx == pytest.approx(1044.87)
        assert cam.fy == pytest.approx(1045.69141)
        assert ts.only_color_modality is True
        assert ts.detector_threshold == 80
        assert ts.distance_start == 500 and ts.distance_stop == 1200
        assert ts.use_icp is False
        assert list(ts.in_plane_angles) == [-45, -35, -25, -15, -5, 5, 15, 25, 35, 45]
        assert len(ts.radii) == 15

    def test_reads_model_properties(self, fixture_paths):
        props = load_model_properties(fixture_paths["model_ply"])
        assert props.rotationally_symmetrical is True
        assert props.planes_of_symmetry == (1.0, 1.0, 1.0)
        assert props.upper_color_range[1] == 150.0

    def test_fov_matches_reference_formula(self):
        cam = CameraParameters()
        # 360/pi * atan(h / (2 fy))  (src/OpenglRender.cpp:9)
        expected = 360.0 / np.pi * np.arctan(480 / (2 * 1045.69141))
        assert cam.fov_y_deg == pytest.approx(expected)

    def test_yaml_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.yml")
        write_yamlcv(
            path,
            {
                "a scalar": 3,
                "a float": 2.5,
                "a list": [1, 2, 3],
                "mat": np.arange(6, dtype=np.float64).reshape(2, 3),
            },
        )
        d = read_yamlcv(path)
        assert d["a scalar"] == 3
        assert d["a float"] == 2.5
        assert list(np.asarray(d["a list"]).ravel()) == [1, 2, 3]
        np.testing.assert_allclose(d["mat"], np.arange(6).reshape(2, 3))

    def test_reads_reference_pose_file(self, fixture_paths):
        d = read_yamlcv(fixture_paths["pose0"])
        assert d["rotMat"].shape == (3, 3)
        # rotMat must be a valid rotation
        r = d["rotMat"]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.asarray(d["position"]).ravel()[2] == pytest.approx(612.659, abs=0.01)


class TestGeometry:
    def test_look_at_axis_aligned(self):
        m = look_at([0, 0, 500.0], [0, 0, 0], [0, 1, 0])
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(m[:3, 3], [0, 0, -500.0], atol=1e-12)

    def test_quat_roundtrip(self, rng):
        for _ in range(50):
            axis = rng.normal(size=3)
            ang = rng.uniform(-np.pi, np.pi)
            r = rotation_about_axis(axis, ang)
            r2 = quat_to_mat(mat_to_quat(r))
            np.testing.assert_allclose(r, r2, atol=1e-10)

    def test_template_pose_frontal_view(self):
        # Camera straight down +z looking at the object: the CV-frame rotation
        # is a half-turn about x (GL y-up/z-back -> CV y-down/z-forward).
        q = template_view_pose([0.0, 0.0, 500.0], 0.0)
        r = quat_to_mat(q)
        np.testing.assert_allclose(r, np.diag([1.0, -1.0, -1.0]), atol=1e-6)

    def test_template_pose_inplane_rotates_about_view_axis(self):
        q0 = quat_to_mat(template_view_pose([0.0, 0.0, 500.0], 0.0))
        q30 = quat_to_mat(template_view_pose([0.0, 0.0, 500.0], 30.0))
        rel = q30 @ q0.T
        # relative rotation must be 30 degrees about the (CV) view axis z
        ang = np.degrees(np.arccos((np.trace(rel) - 1) / 2))
        assert ang == pytest.approx(30.0, abs=1e-4)
        np.testing.assert_allclose(rel[2, 2], 1.0, atol=1e-6)

    def test_gl_to_cv_is_half_turn_about_x(self):
        np.testing.assert_allclose(GL_TO_CV, rotation_about_axis([1, 0, 0], np.pi), atol=1e-12)

    def test_view_ray_rotation_identity_on_axis(self):
        r = view_ray_rotation([0.0, 0.0, 600.0])
        np.testing.assert_allclose(r, np.eye(3), atol=1e-5)


class TestViewpoints:
    def test_icosphere_counts(self):
        assert icosphere(500.0, 0).shape[0] == 12
        assert icosphere(500.0, 1).shape[0] == 42
        assert icosphere(500.0, 2).shape[0] == 162
        assert icosphere(500.0, 3).shape[0] == 642

    def test_icosphere_radius(self):
        v = icosphere(700.0, 2)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 700.0, rtol=1e-9)

    def test_rot_sym_circle(self):
        v = rot_sym_circle(500.0, 3)
        assert v.shape[0] == 48  # 7.5 degree exact step
        np.testing.assert_allclose(v[:, 0], 0.0)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 500.0, rtol=1e-9)

    def test_symmetry_pruning_shipped_config(self):
        # lagergehaeuse: rot-sym with planes (1,1,1) -> first quadrant of the
        # y/z circle = angles 0..90 deg inclusive = 13 viewpoints.
        v = camera_view_points(500.0, 3, True, (1.0, 1.0, 1.0))
        assert v.shape[0] == 13
        assert np.all(v[:, 1] >= 0) and np.all(v[:, 2] >= 0)

    def test_no_pruning_with_zero_planes(self):
        v = prune_by_symmetry(icosphere(500.0, 1), (0.0, 0.0, 0.0))
        assert v.shape[0] == 42


class TestPly:
    def test_loads_reference_fixture(self, fixture_paths):
        mesh = load_ply(fixture_paths["model_ply"])
        assert mesh.num_vertices == 14136
        assert mesh.num_faces == 4712
        assert mesh.normals is not None
        # no colors in file -> white fallback (src/ModelImporter.cpp:64-71)
        np.testing.assert_allclose(mesh.colors, 1.0)
        # object spans tens of mm
        ext = mesh.vertices.max(0) - mesh.vertices.min(0)
        assert np.all(ext > 10) and np.all(ext < 500)

    def test_ascii_roundtrip(self, tmp_path):
        mesh = Mesh(
            vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            colors=np.ones((3, 3), np.float32),
            indices=np.array([[0, 1, 2]], np.uint32),
            normals=np.tile(np.array([[0, 0, 1]], np.float32), (3, 1)),
        )
        p = str(tmp_path / "m.ply")
        save_ply(p, mesh)
        m2 = load_ply(p)
        np.testing.assert_allclose(m2.vertices, mesh.vertices, atol=1e-5)
        np.testing.assert_array_equal(m2.indices, mesh.indices)
        np.testing.assert_allclose(m2.normals, mesh.normals, atol=1e-5)

    def test_subsampling(self, fixture_paths):
        mesh = load_ply(fixture_paths["model_ply"])
        sub = mesh.subsampled_vertices(40)
        assert sub.shape[0] == int(np.ceil(14136 / 40))
