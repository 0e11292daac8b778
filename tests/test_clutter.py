"""Clutter robustness: multi-instance scenes vs candidate truncation.

VERDICT round-1 weakness #6: the old device-side check stage could only
validate the top-64 candidates, silently changing group sizes in cluttered
bin-picking scenes. Checks now run host-side for every candidate reached in
group order, so the only remaining truncation is the static top_k=512
candidate cut. These tests put many instances in one frame and assert that
grouping + the 35% cull behave like the reference's unbounded semantics
(src/HighLevelLinemod.cpp:206-253)."""

import numpy as np
import pytest

from linemod_tpu.config import CameraParameters, ModelProperties, TemplateSettings
from linemod_tpu.models.template_bank import build_template_bank
from linemod_tpu.ops.rasterizer import mesh_to_arrays, render_views
from linemod_tpu.pipeline.pose_detection import DetectionDebug, PoseDetection
from linemod_tpu.utils.geometry import quat_to_mat

from test_matching import cube_mesh


@pytest.fixture(scope="module")
def cube_bank():
    cam = CameraParameters(fx=500.0, fy=500.0, cx=320, cy=240, width=640, height=480)
    settings = TemplateSettings(
        distance_start=600,
        distance_stop=600,
        distance_step=50,
        subdivisions=0,
        angle_start=-45,
        angle_stop=45,
        angle_step=45,
        # clutter tests stress grouping/truncation semantics, not viewpoint
        # generalization: off-center instances see perspective the 1-radius
        # test bank was never trained on, so relax the similarity threshold
        detector_threshold=70.0,
        use_depth_improvement=True,
        depth_offset=0.0,
        number_wanted_poses=1,
    )
    props = ModelProperties(
        lower_color_range=(0.0, 0.0, 0.0),
        upper_color_range=(255.0, 255.0, 255.0),
        rotationally_symmetrical=False,
        planes_of_symmetry=(1.0, 1.0, 1.0),
    )
    mesh = cube_mesh()
    bank = build_template_bank(mesh, "cube", cam, settings, props)
    return cam, settings, props, mesh, bank


def render_instances(cam, mesh, bank, positions):
    rot = quat_to_mat(bank.quat[4]).astype(np.float32)
    depth_acc = np.zeros((480, 640), np.float32)
    color_acc = np.zeros((480, 640, 3), np.float32)
    for pos in positions:
        d, col = render_views(
            mesh_to_arrays(mesh), rot[None], np.array([pos], np.float32), cam,
            with_color=True,
        )
        d = np.asarray(d)[0]
        col = np.asarray(col)[0]
        closer = (d > 0) & ((depth_acc == 0) | (d < depth_acc))
        depth_acc = np.where(closer, d, depth_acc)
        color_acc = np.where(closer[..., None], col, color_acc)
    return (color_acc * 255).astype(np.uint8), depth_acc.astype(np.uint16)


def test_six_instances_all_detected(cube_bank):
    cam, settings, props, mesh, bank = cube_bank
    positions = [
        (-150.0, -90.0, 600.0),
        (0.0, -90.0, 600.0),
        (150.0, -90.0, 600.0),
        (-150.0, 90.0, 600.0),
        (0.0, 90.0, 600.0),
        (150.0, 90.0, 600.0),
    ]
    color, depth = render_instances(cam, mesh, bank, positions)
    det = PoseDetection(bank, cam, settings, props)
    dbg = DetectionDebug()
    poses = det.detect(color, depth, num_objects=6, debug=dbg)
    assert dbg.num_groups >= 6
    assert len(poses) == 6
    # pair each pose with its nearest expected instance; the reference's
    # calcTrueZ pixel/mm mixing quirk (reproduced for parity) skews
    # off-center translations by up to ~25 mm
    found = np.array([(p.translation[0], p.translation[1]) for p in poses])
    expect = np.array([(x, y) for x, y, _ in positions])
    d = np.linalg.norm(found[:, None] - expect[None, :], axis=2)
    nearest = d.argmin(axis=1)
    assert len(set(nearest.tolist())) == 6, "poses did not cover all instances"
    assert d.min(axis=1).max() < 30


def test_group_cull_matches_unbounded_semantics(cube_bank):
    """The kept-group set after the 35% cull must equal what unbounded
    (all-matches) grouping would keep: recompute groups from ALL valid
    candidates in the packed output and compare."""
    from linemod_tpu.ops.postprocess import discard_small_groups, group_matches

    cam, settings, props, mesh, bank = cube_bank
    positions = [(-150.0, 0.0, 600.0), (150.0, 0.0, 600.0)]
    color, depth = render_instances(cam, mesh, bank, positions)
    det = PoseDetection(bank, cam, settings, props)
    packed = np.asarray(det.detect_submit(color, depth)[0])
    valid = packed[:, 4] > 0.5
    n_valid = int(valid.sum())
    # the static top-K must not be saturated — otherwise grouping could be
    # truncated relative to the reference's all-matches semantics
    assert n_valid < det.state.cfg.top_k, "top_k saturated; raise it"
    xs, ys = packed[valid, 1], packed[valid, 2]
    groups = group_matches(xs, ys, settings.group_radius)
    kept = discard_small_groups(groups, settings.discard_group_ratio)
    founders = sorted(
        (round(float(np.mean(xs[np.asarray(g)])), -1)) for g in kept
    )
    assert len(kept) == 2, f"expected 2 kept groups, got {len(kept)}"
    assert founders[0] < 320 < founders[1]
