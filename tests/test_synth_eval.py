"""Reduced synthetic-eval accuracy check (the committed ACCURACY_r05.json
artifact runs the full >=100-frame protocol via scripts/accuracy_eval.py;
this keeps a 2-frame slice of the same generator + criteria in the suite)."""

import numpy as np
import pytest

from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops.metrics import OBJECT_DIAMETER, VSD_CORRECT
from linemod_tpu.pipeline.benchmark import Benchmark
from linemod_tpu.pipeline.pose_detection import PoseDetection
from linemod_tpu.pipeline.synth_eval import SyntheticEvalSet, eval_camera
from linemod_tpu.utils.ply import load_ply

import os

EXAMPLE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "example"
)


@pytest.fixture(scope="module")
def fixture_setup():
    ex = EXAMPLE_DIR
    cam0, settings = load_settings(os.path.join(ex, "linemod_settings.yml"))
    bank = TemplateBank.load(os.path.join(ex, "banks", "lagergehaeuse.npz"))
    props = load_model_properties(
        os.path.join(ex, "models", "lagergehaeuse.ply")
    )
    mesh = load_ply(os.path.join(ex, "models", "lagergehaeuse.ply"))
    return cam0, settings, bank, props, mesh


def test_synthetic_eval_frames_pass_reference_criteria(fixture_setup):
    """Frame 0 of the shiny and clutter modes (between-template GT poses,
    +40 mm sensor corruption, distractors) must be detected and pass the
    reference's correctness criteria (VSD < 0.3, ADD-S <= 21)."""
    cam0, settings, bank, props, mesh = fixture_setup
    cam = eval_camera(cam0)
    gen = SyntheticEvalSet(mesh, bank, cam0, seed=0)
    det = PoseDetection(bank, cam, settings, props)
    bench = Benchmark(mesh, cam)

    for mode in ("shiny", "clutter"):
        color, depth, gt, _ = gen.make_frame(0, mode)
        poses = det.detect(color, depth, 1)
        assert poses, f"no detection in mode {mode}"
        est = poses[0]
        vsd = bench.score_vsd(depth.astype(np.float32), gt, est)
        adds = bench.score_adds(gt, est)
        assert vsd < VSD_CORRECT, f"{mode}: VSD {vsd}"
        assert adds <= OBJECT_DIAMETER, f"{mode}: ADD-S {adds}"
        t_err = np.linalg.norm(est.translation - gt.translation)
        assert t_err < 30.0, f"{mode}: translation error {t_err} mm"
