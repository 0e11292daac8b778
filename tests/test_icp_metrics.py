"""ICP refinement and benchmark-metric tests on the real fixture mesh."""

import numpy as np
import pytest
import jax.numpy as jnp

from linemod_tpu.config import CameraParameters
from linemod_tpu.ops.depth3d import scene_cloud_from_depth
from linemod_tpu.ops.icp import IcpRefiner, icp_refine_batch, verify_mean_depth_diff
from linemod_tpu.ops.metrics import (
    OBJECT_DIAMETER,
    add_error,
    adds_error,
    vsd_error,
)
from linemod_tpu.ops.rasterizer import mesh_to_arrays, render
from linemod_tpu.types import ObjectPose
from linemod_tpu.utils.geometry import mat_to_quat, rotation_about_axis
from linemod_tpu.utils.ply import load_ply
from linemod_tpu.utils.yamlcv import read_yamlcv

CAM = CameraParameters()


@pytest.fixture(scope="module")
def fixture_scene(fixture_paths):
    mesh = load_ply(fixture_paths["model_ply"])
    marr = mesh_to_arrays(mesh)
    gt = read_yamlcv(fixture_paths["pose0"])
    rot = np.asarray(gt["rotMat"], np.float32)
    trans = np.asarray(gt["position"], np.float32).ravel()
    depth = np.asarray(
        render(
            marr,
            jnp.asarray(rot),
            jnp.asarray(trans),
            CAM.fx,
            CAM.fy,
            320.0,
            240.0,
            width=640,
            height=480,
        )
    )
    return mesh, marr, rot, trans, depth


class TestSceneCloud:
    def test_backprojection(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        ys, xs = np.nonzero(depth > 0)
        bbox = np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], np.int32)
        pts, nrm, valid = scene_cloud_from_depth(
            jnp.asarray(depth), jnp.asarray(bbox), fx=CAM.fx, fy=CAM.fy, cx=320.0, cy=240.0
        )
        pts, nrm, valid = np.asarray(pts), np.asarray(nrm), np.asarray(valid)
        assert valid.sum() > 1000
        # z values of valid points in the rendered object range
        assert pts[valid][:, 2].min() > 550 and pts[valid][:, 2].max() < 650
        # normals are unit and mostly facing the camera (n.z < 0)
        np.testing.assert_allclose(np.linalg.norm(nrm[valid], axis=1), 1.0, atol=1e-3)
        assert (nrm[valid][:, 2] < 0).mean() > 0.8

    def test_verify_zero_at_exact_pose(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        m = float(verify_mean_depth_diff(jnp.asarray(depth), jnp.asarray(depth)))
        assert m < 1e-3


class TestIcp:
    def test_converges_from_perturbed_pose(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        ys, xs = np.nonzero(depth > 0)
        bbox = np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], np.int32)
        spts, snrm, svalid = scene_cloud_from_depth(
            jnp.asarray(depth), jnp.asarray(bbox), fx=CAM.fx, fy=CAM.fy, cx=320.0, cy=240.0
        )
        d_rot = rotation_about_axis([0.3, 1.0, 0.2], np.radians(4.0)).astype(np.float32)
        r0 = (d_rot @ rot).astype(np.float32)
        t0 = trans + np.array([6.0, -5.0, 8.0], np.float32)
        mpts = jnp.asarray(mesh.vertices[::8])
        mnrm = jnp.asarray(mesh.normals[::8])
        r, t, rmse = icp_refine_batch(
            mpts, spts, snrm, svalid, jnp.asarray(r0[None]), jnp.asarray(t0[None]),
            model_nrm=mnrm,
        )
        r, t = np.asarray(r)[0], np.asarray(t)[0]
        # ~3.5 mm is this geometry's observability floor (sharp-edge normal
        # blending); the pipeline gates are 35 mm (verify) / 20 mm (VSD).
        assert np.linalg.norm(t - trans) < 5.0, f"translation off by {np.linalg.norm(t - trans)}"
        # the object is rotationally symmetric about model y: compare axis
        # alignment, not full rotation
        a_gt = rot @ np.array([0.0, 1.0, 0.0])
        a_est = r @ np.array([0.0, 1.0, 0.0])
        ang = np.degrees(np.arccos(np.clip(abs(a_gt @ a_est), -1, 1)))
        assert ang < 2.0, f"symmetry axis off by {ang} deg"
        assert float(rmse[0]) < 5.0

    def test_refiner_pipeline_api(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        refiner = IcpRefiner(mesh, CAM, sample_step=8, mesh_arrays=marr)
        pose = ObjectPose(
            translation=(trans + np.array([5, 5, 10], np.float32)).astype(np.float64),
            quaternion=mat_to_quat(rotation_about_axis([0, 0, 1], np.radians(3)) @ rot),
            bounding_box=(276, 249, 93, 92),
        )
        refined = refiner.refine(depth, [pose])
        assert np.linalg.norm(refined[0].translation - trans) < 5.0
        best = refiner.best_verified(depth, refined)
        assert best is not None

    def test_verify_rejects_bad_pose(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        refiner = IcpRefiner(mesh, CAM, sample_step=8, mesh_arrays=marr)
        bad = ObjectPose(
            translation=(trans + np.array([0, 0, 120.0])).astype(np.float64),
            quaternion=mat_to_quat(rot),
            bounding_box=(276, 249, 93, 92),
        )
        assert refiner.best_verified(depth, [bad]) is None


class TestMetrics:
    def test_vsd_zero_for_identical(self, fixture_scene):
        _, _, _, _, depth = fixture_scene
        d = jnp.asarray(depth)
        assert float(vsd_error(d, d, d)) == pytest.approx(0.0, abs=1e-6)

    def test_vsd_high_for_disjoint(self, fixture_scene):
        mesh, marr, rot, trans, depth = fixture_scene
        shifted = np.roll(depth, 200, axis=1)
        e = float(vsd_error(jnp.asarray(depth), jnp.asarray(shifted), jnp.asarray(depth)))
        assert e > 0.8

    def test_add_errors(self, fixture_scene):
        mesh, _, rot, trans, _ = fixture_scene
        v = jnp.asarray(mesh.vertices)
        r = jnp.asarray(rot)
        t = jnp.asarray(trans)
        assert float(add_error(v, r, t, r, t)) == pytest.approx(0.0, abs=1e-3)
        t2 = t + jnp.asarray([10.0, 0, 0])
        assert float(add_error(v, r, t, r, t2)) == pytest.approx(10.0, abs=1e-2)
        sub = jnp.asarray(mesh.subsampled_vertices(40))
        # ADD-S <= ADD always
        assert float(adds_error(sub, r, t, r, t2)) <= 10.0 + 1e-3
        # rotation about the symmetry axis (model y): ADD-S stays small
        rsym = jnp.asarray(
            (np.asarray(rot) @ rotation_about_axis([0, 1, 0], np.radians(30))).astype(np.float32)
        )
        assert float(adds_error(sub, r, t, rsym, t)) < OBJECT_DIAMETER


def test_refine_best_equals_two_call_api(fixture_scene):
    """The fused refine_best must pick the same pose as refine +
    best_verified (one device fetch vs three)."""
    mesh, marr, gt_rot, gt_trans, depth = fixture_scene
    refiner = IcpRefiner(mesh, CAM, sample_step=8, mesh_arrays=marr)
    off = ObjectPose(
        translation=gt_trans + np.array([6.0, -4.0, 10.0]),
        quaternion=mat_to_quat(gt_rot),
        bounding_box=(240, 200, 160, 160),
    )
    refined = refiner.refine(depth, [off])
    two_call = refiner.best_verified(depth, refined)
    fused = refiner.refine_best(depth, [off])
    assert (two_call is None) == (fused is None)
    if fused is not None:
        np.testing.assert_allclose(fused.translation, two_call.translation, atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.dot(fused.quaternion, two_call.quaternion)), 1.0, atol=1e-6
        )
