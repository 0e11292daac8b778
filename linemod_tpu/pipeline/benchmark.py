"""Accuracy-scoring harness (replaces C8's per-frame loop + counters).

Scores detected poses against ground truth with VSD (Hodan), ADD and ADD-S,
keeping running accuracy counters like the reference
(src/Benchmark.cpp:11-16,247-257). Ground truth sources: the reference's own
`pose{i}.yml` format and the public LINEMOD dataset's .tra/.rot files
(src/Benchmark.cpp:182-245).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..config import CameraParameters
from ..ops.metrics import (
    ADDS_SUBSAMPLE,
    OBJECT_DIAMETER,
    VSD_CORRECT,
    add_error,
    adds_error,
    render_pose_depth,
    vsd_error,
)
from ..ops.rasterizer import mesh_to_arrays
from ..types import ObjectPose
from ..utils.geometry import mat_to_quat, quat_to_mat, rotation_about_axis
from ..utils.yamlcv import read_yamlcv


def read_ground_truth_pose(path: str) -> ObjectPose:
    """Reference pose YAML: rotMat + position in mm (src/Benchmark.cpp:182-194)."""
    d = read_yamlcv(path)
    rot = np.asarray(d["rotMat"], np.float64)
    pos = np.asarray(d["position"], np.float64).ravel()
    return ObjectPose(translation=pos, quaternion=mat_to_quat(rot))


def read_ground_truth_linemod(tra_path: str, rot_path: str) -> ObjectPose:
    """Public LINEMOD dataset GT: .tra (cm -> mm x10) + .rot with the
    coordinate-frame fix (src/Benchmark.cpp:196-245: -pi/2 about x)."""
    tra = np.loadtxt(tra_path, skiprows=1).ravel()
    rot = np.loadtxt(rot_path, skiprows=1).reshape(3, 3)
    adj = rotation_about_axis([1.0, 0.0, 0.0], -np.pi / 2.0)
    return ObjectPose(
        translation=tra[-3:] * 10.0,
        quaternion=mat_to_quat(adj @ rot),
    )


class Benchmark:
    def __init__(self, mesh, cam: CameraParameters):
        self.mesh = mesh
        self.marr = mesh_to_arrays(mesh)
        self.cam = cam
        self.vertices = jnp.asarray(mesh.vertices)
        self.sub_vertices = jnp.asarray(mesh.subsampled_vertices(ADDS_SUBSAMPLE))
        self.image_counter = 0
        self.hodan_correct = 0
        self.add_correct = 0

    def _render(self, pose: ObjectPose):
        return render_pose_depth(
            self.marr,
            jnp.asarray(quat_to_mat(pose.quaternion), jnp.float32),
            jnp.asarray(pose.translation, jnp.float32),
            self.cam.fx,
            self.cam.fy,
            width=self.cam.width,
            height=self.cam.height,
        )

    def score_vsd(self, scene_depth: np.ndarray, gt: ObjectPose, est: ObjectPose) -> float:
        gt_r = self._render(gt)
        est_r = self._render(est)
        err = float(vsd_error(gt_r, est_r, jnp.asarray(scene_depth, jnp.float32)))
        if err < VSD_CORRECT:
            self.hodan_correct += 1
        return err

    def score_add(self, gt: ObjectPose, est: ObjectPose, diameter=OBJECT_DIAMETER) -> float:
        err = float(
            add_error(
                self.vertices,
                jnp.asarray(quat_to_mat(gt.quaternion), jnp.float32),
                jnp.asarray(gt.translation, jnp.float32),
                jnp.asarray(quat_to_mat(est.quaternion), jnp.float32),
                jnp.asarray(est.translation, jnp.float32),
            )
        )
        if err <= diameter:
            self.add_correct += 1
        return err

    def score_adds(self, gt: ObjectPose, est: ObjectPose, diameter=OBJECT_DIAMETER) -> float:
        err = float(
            adds_error(
                self.sub_vertices,
                jnp.asarray(quat_to_mat(gt.quaternion), jnp.float32),
                jnp.asarray(gt.translation, jnp.float32),
                jnp.asarray(quat_to_mat(est.quaternion), jnp.float32),
                jnp.asarray(est.translation, jnp.float32),
            )
        )
        if err <= diameter:
            self.add_correct += 1
        return err

    def next_image(self):
        self.image_counter += 1

    @property
    def hodan_score(self) -> float:
        return 100.0 * self.hodan_correct / max(self.image_counter, 1)

    def print_scores(self):
        print(
            f"Hodan Score: {self.hodan_score:.1f} Counter: {self.image_counter}"
        )
