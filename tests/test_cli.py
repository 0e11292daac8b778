"""CLI entry-point tests on the bundled fixture (generate is exercised by the
bank fixture's existence; detect/evaluate drive the full pipeline)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "example")


@pytest.fixture()
def in_example(monkeypatch):
    monkeypatch.chdir(EXAMPLE)


def test_evaluate_yml_fixture(in_example, capsys):
    from linemod_tpu.cli import main

    rc = main(
        [
            "evaluate",
            "--model",
            "lagergehaeuse.ply",
            "--images",
            "benchmark/img%d.png",
            "--depths",
            "benchmark/depth%d.png",
            "--gt",
            "yml",
            "--max-frames",
            "1",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "VSD pass 100.0%" in out
    # lagergehaeuse is rotationally symmetric -> ADD-S selected
    assert "ADD-S pass 100.0%" in out


def test_evaluate_linemod_format(tmp_path, monkeypatch, capsys):
    """Synthesize one frame in the public-LINEMOD layout (color%d.jpg,
    depth%d.dpt, tra%d.tra/rot%d.rot) and drive `evaluate --gt linemod`."""
    import cv2

    from linemod_tpu.cli import main
    from linemod_tpu.utils.io import save_depth_linemod_dataset

    monkeypatch.chdir(EXAMPLE)
    seq = tmp_path / "benchmarkLINEMOD"
    seq.mkdir()
    color = cv2.imread("benchmark/img0.png")
    depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)
    cv2.imwrite(str(seq / "color0.jpg"), color)
    save_depth_linemod_dataset(str(seq / "depth0.dpt"), depth)
    # GT in the dataset's convention: mm -> cm /10, rotation un-fixed
    # (read_ground_truth_linemod re-applies x10 and the -pi/2 x-rotation)
    from linemod_tpu.pipeline.benchmark import read_ground_truth_pose
    from linemod_tpu.utils.geometry import quat_to_mat, rotation_about_axis

    gt = read_ground_truth_pose("benchmark/pose0.yml")
    adj = rotation_about_axis([1.0, 0.0, 0.0], -np.pi / 2.0)
    rot_raw = adj.T @ quat_to_mat(gt.quaternion)
    (seq / "tra0.tra").write_text(
        "1 3\n" + " ".join(f"{v / 10.0:.6f}" for v in gt.translation) + "\n"
    )
    (seq / "rot0.rot").write_text(
        "3 3\n" + "\n".join(" ".join(f"{v:.8f}" for v in row) for row in rot_raw) + "\n"
    )
    rc = main(
        [
            "evaluate",
            "--model",
            "lagergehaeuse.ply",
            "--images",
            str(seq / "color%d.jpg"),
            "--depths",
            str(seq / "depth%d.dpt"),
            "--gt",
            "linemod",
            "--max-frames",
            "1",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "ADD-S pass 100.0%" in out
