"""In-suite end-to-end + feature-parity tests on the bundled benchmark frame.

These pin the pipeline's behavior on real data (VERDICT round-1 gap: the only
real-data E2E lived outside CI in bench.py):

- full pipeline on `example/benchmark/img0.png` with the committed 1950-
  template bank -> detected pose must pass the reference's own correctness
  criteria (VSD error < 0.3, src/Benchmark.cpp:33; mean ADD <= 21,
  include/Benchmark.h:105) against the captured ground truth `pose0.yml`;
- feature-level goldens (tests/goldens/img0_golden.npz, generated on the CPU
  backend): the quantized-orientation map and the top match candidates are
  compared exactly, so any drift in gradient extraction / spreading /
  scoring that would change threshold-80 semantics fails loudly
  (SURVEY §7 hard part (b)).
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "example")
GOLDEN = os.path.join(REPO, "tests", "goldens", "img0_golden.npz")


@pytest.fixture(scope="module")
def fixture_pipeline():
    import cv2

    from linemod_tpu.config import load_model_properties, load_settings
    from linemod_tpu.models.template_bank import TemplateBank
    from linemod_tpu.pipeline.pose_detection import PoseDetection

    cwd = os.getcwd()
    os.chdir(EXAMPLE)
    try:
        cam, settings = load_settings("linemod_settings.yml")
        bank = TemplateBank.load(os.path.join("banks", "lagergehaeuse.npz"))
        props = load_model_properties("models/lagergehaeuse.ply")
        det = PoseDetection(bank, cam, settings, props)
        color = cv2.imread("benchmark/img0.png")
        depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)
    finally:
        os.chdir(cwd)
    return det, cam, color, depth


def test_fixture_detect_pose_correct(fixture_pipeline):
    from linemod_tpu.pipeline.benchmark import Benchmark, read_ground_truth_pose
    from linemod_tpu.utils.ply import load_ply

    det, cam, color, depth = fixture_pipeline
    poses = det.detect(color, depth, 1)
    assert len(poses) == 1

    mesh = load_ply(os.path.join(EXAMPLE, "models", "lagergehaeuse.ply"))
    bench = Benchmark(mesh, cam)
    gt = read_ground_truth_pose(os.path.join(EXAMPLE, "benchmark", "pose0.yml"))
    scene = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
    vsd = bench.score_vsd(scene, gt, poses[0])
    add = bench.score_add(gt, poses[0])
    assert vsd < 0.3, f"VSD {vsd} fails the reference's <0.3 criterion"
    assert add <= 21.0, f"ADD {add} mm fails the reference's <=21 criterion"


def test_fixture_quantized_orientations_golden(fixture_pipeline):
    import jax.numpy as jnp

    from linemod_tpu.ops.gradients import quantize_color_gradients

    det, cam, color, depth = fixture_pipeline
    color_c = det.recenter(np.ascontiguousarray(color))
    quant, _ = quantize_color_gradients(jnp.asarray(color_c.astype(np.float32)))
    golden = np.load(GOLDEN)
    np.testing.assert_array_equal(np.asarray(quant), golden["quant"])


def test_fixture_top_matches_golden(fixture_pipeline):
    det, cam, color, depth = fixture_pipeline
    packed = np.asarray(det.detect_submit(color, depth)[0])
    valid = packed[:, 4] > 0.5
    top = packed[valid][:8]
    golden = np.load(GOLDEN)["top_matches"]
    np.testing.assert_allclose(top, golden, atol=1e-4)


def test_host_quant_transport_parity(fixture_pipeline):
    """The host-quantize transport mode (C++ quantizer + quant-map upload)
    must produce the exact same packed candidates as the on-device path —
    native/quantize.cpp is bit-identical to ops/gradients.py."""
    from linemod_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    import jax.numpy as jnp

    from linemod_tpu.ops.detect_core import detect_frame, detect_frame_quant

    det, cam, color, depth = fixture_pipeline
    color_c = det.recenter(np.ascontiguousarray(color))
    q0, q1 = native.quantize_frame(color_c)
    packed_q = np.asarray(detect_frame_quant(det.state, jnp.asarray(q0), jnp.asarray(q1)))
    packed_d = np.asarray(detect_frame(det.state, jnp.asarray(color_c.astype(np.uint8))))
    np.testing.assert_array_equal(packed_q, packed_d)
