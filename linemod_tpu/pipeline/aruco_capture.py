"""Ground-truth capture tooling (replaces C11 Aruco, src/Aruco.cpp).

Same board: 5x7 GridBoard, DICT_6X6_100, 120 px markers / 20 px separation
(include/Aruco.h:40-46); the detected board pose is converted to the pipeline
frame with the reference's hand-measured scale (0.283 px->mm) and
board-centre offset (96, 136, 0) mm and axis flips (src/Aruco.cpp:71-78).

Live capture needs a camera; `capture_ground_truth` therefore takes a frame
source (see pipeline/sensors.py) so it works headless with file-backed
sources in tests.
"""

from __future__ import annotations

import os

import numpy as np

MARKERS_X = 5
MARKERS_Y = 7
MARKER_LENGTH = 120
MARKER_SEPARATION = 20
PX_TO_MM = 0.283
BOARD_CENTER_OFFSET = np.array([96.0, 136.0, 0.0])


def _board():
    import cv2

    dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_100)
    board = cv2.aruco.GridBoard(
        (MARKERS_X, MARKERS_Y), float(MARKER_LENGTH), float(MARKER_SEPARATION), dic
    )
    return dic, board


def create_aruco_board(path: str, width: int = 720, height: int = 1000) -> None:
    """Generate the printable board image (createArucoBoard, src/Aruco.cpp:11-34)."""
    import cv2

    _, board = _board()
    img = board.generateImage((width, height), marginSize=20)
    cv2.imwrite(path, img)


def detect_board_pose(color: np.ndarray, cam, refine: bool = True):
    """Estimate the board pose in one frame; returns (rot 3x3, trans mm) in
    the pipeline camera frame, or None (detectBoard, src/Aruco.cpp:36-93).

    refine recovers markers the first pass rejected using the board layout
    (cv::aruco::refineDetectedMarkers, src/Aruco.cpp:68)."""
    import cv2

    dic, board = _board()
    det = cv2.aruco.ArucoDetector(dic)
    corners, ids, rejected = det.detectMarkers(color)
    if refine and rejected:
        corners, ids, rejected, _ = det.refineDetectedMarkers(
            color, board, corners, ids, rejected,
            cam.matrix, np.asarray(cam.distortion, np.float64),
        )
    if ids is None or len(ids) == 0:
        return None
    obj_pts, img_pts = board.matchImagePoints(corners, ids)
    if obj_pts is None or len(obj_pts) < 4:
        return None
    ok, rvec, tvec = cv2.solvePnP(
        obj_pts, img_pts, cam.matrix, np.asarray(cam.distortion, np.float64)
    )
    if not ok:
        return None
    rot, _ = cv2.Rodrigues(rvec)
    t = tvec.ravel() * PX_TO_MM
    # board-centre shift and axis flip into the pipeline frame
    # (src/Aruco.cpp:71-78)
    center = rot @ (BOARD_CENTER_OFFSET / PX_TO_MM) * PX_TO_MM + t
    rot_fixed = rot @ np.diag([1.0, -1.0, -1.0])
    return rot_fixed, center


def capture_ground_truth(source, cam, out_dir: str = "benchmark", max_frames: int = 0):
    """Iterate frames from `source` (see sensors.FrameSource), saving
    img{i}.png / depth{i}.png / pose{i}.yml for frames with a detected board
    (the TAB-save loop of src/Aruco.cpp:94-108, non-interactive)."""
    import cv2

    from ..utils.yamlcv import write_yamlcv

    os.makedirs(out_dir, exist_ok=True)
    i = 0
    for color, depth in source:
        result = detect_board_pose(color, cam)
        if result is None:
            continue
        rot, trans = result
        cv2.imwrite(os.path.join(out_dir, f"img{i}.png"), color)
        cv2.imwrite(os.path.join(out_dir, f"depth{i}.png"), depth.astype(np.uint16))
        write_yamlcv(
            os.path.join(out_dir, f"pose{i}.yml"),
            {"rotMat": np.asarray(rot, np.float64), "position": list(map(float, trans))},
        )
        i += 1
        if max_frames and i >= max_frames:
            break
    return i


def capture_ground_truth_interactive(source, cam, out_dir: str = "benchmark"):
    """The reference's live HUD loop (src/Aruco.cpp:79-110): draw detected
    markers + board axes on each frame, TAB saves img/depth/pose, ESC quits.
    Requires a GUI-capable OpenCV; use capture_ground_truth for headless
    operation."""
    import cv2

    from ..utils.yamlcv import write_yamlcv

    os.makedirs(out_dir, exist_ok=True)
    dic, _ = _board()
    det = cv2.aruco.ArucoDetector(dic)
    i = 0
    for color, depth in source:
        hud = color.copy()
        corners, ids, _ = det.detectMarkers(color)
        if ids is not None and len(ids):
            cv2.aruco.drawDetectedMarkers(hud, corners, ids)
        result = detect_board_pose(color, cam)
        if result is not None:
            rot, trans = result
            rvec, _ = cv2.Rodrigues(rot)
            cv2.drawFrameAxes(
                hud, cam.matrix, np.asarray(cam.distortion, np.float64),
                rvec, trans / PX_TO_MM, 100.0,
            )
        cv2.putText(hud, f"saved: {i}  TAB=save  ESC=quit", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2)
        cv2.imshow("aruco capture", hud)
        key = cv2.waitKey(1) & 0xFF
        if key == 27:  # ESC
            break
        if key == 9 and result is not None:  # TAB
            rot, trans = result
            cv2.imwrite(os.path.join(out_dir, f"img{i}.png"), color)
            cv2.imwrite(
                os.path.join(out_dir, f"depth{i}.png"), depth.astype(np.uint16)
            )
            write_yamlcv(
                os.path.join(out_dir, f"pose{i}.yml"),
                {"rotMat": np.asarray(rot, np.float64),
                 "position": list(map(float, trans))},
            )
            i += 1
    cv2.destroyAllWindows()
    return i
