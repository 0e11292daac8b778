"""Aruco ground-truth capture: board image, pose detection with marker
refinement, headless capture loop (C11, src/Aruco.cpp)."""

import os

import numpy as np
import pytest

from linemod_tpu.config import CameraParameters
from linemod_tpu.pipeline.aruco_capture import (
    capture_ground_truth,
    create_aruco_board,
    detect_board_pose,
)


@pytest.fixture(scope="module")
def board_frame(tmp_path_factory):
    """A synthetic camera frame: the rendered board image centred on gray."""
    import cv2

    p = str(tmp_path_factory.mktemp("aruco") / "board.png")
    create_aruco_board(p, width=720, height=1000)
    board = cv2.imread(p)
    frame = np.full((1080, 1920, 3), 128, np.uint8)
    frame[40 : 40 + 1000, 600 : 600 + 720] = board
    cam = CameraParameters(fx=1000.0, fy=1000.0, cx=960.0, cy=540.0,
                           width=1920, height=1080)
    return frame, cam


def test_board_pose_detected(board_frame):
    frame, cam = board_frame
    result = detect_board_pose(frame, cam)
    assert result is not None
    rot, trans = result
    assert rot.shape == (3, 3)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)


def test_refinement_recovers_occluded_marker(board_frame):
    """Partially corrupt one marker: the refine pass (board-layout-guided,
    src/Aruco.cpp:68) must still detect the board, and refine=True must
    recover at least as many markers as refine=False."""
    import cv2

    frame, cam = board_frame
    noisy = frame.copy()
    # damage a corner marker enough to fail plain detection (checker noise)
    rng = np.random.default_rng(0)
    noisy[60:180, 620:740] = rng.integers(0, 255, (120, 120, 3), dtype=np.uint8)

    from linemod_tpu.pipeline.aruco_capture import _board

    dic, board = _board()
    det = cv2.aruco.ArucoDetector(dic)
    corners, ids, rejected = det.detectMarkers(noisy)
    n_plain = 0 if ids is None else len(ids)
    corners2, ids2, _, _ = det.refineDetectedMarkers(
        noisy, board, corners, ids, rejected,
        cam.matrix, np.asarray(cam.distortion, np.float64),
    )
    n_refined = 0 if ids2 is None else len(ids2)
    assert n_refined >= n_plain
    assert detect_board_pose(noisy, cam, refine=True) is not None


def test_headless_capture_roundtrip(board_frame, tmp_path):
    from linemod_tpu.utils.yamlcv import read_yamlcv

    frame, cam = board_frame
    depth = np.full(frame.shape[:2], 700, np.uint16)
    n = capture_ground_truth([(frame, depth)], cam, out_dir=str(tmp_path))
    assert n == 1
    assert os.path.exists(tmp_path / "img0.png")
    assert os.path.exists(tmp_path / "depth0.png")
    d = read_yamlcv(str(tmp_path / "pose0.yml"))
    assert np.asarray(d["rotMat"]).shape == (3, 3)
