"""Behavioral parity vs the independent numpy oracle (tests/oracle_linemod.py).

Round-2 gap: the feature goldens were self-generated, pinning regressions but
not parity with the engine the reference actually uses (cv::linemod, called
at /root/reference/src/HighLevelLinemod.cpp:93,152). The oracle is a
from-scratch numpy port of that algorithm (it imports nothing from
linemod_tpu), so agreement here is evidence, not tautology.

Documented deviations of the production implementation (each bounded by an
assertion below):
- angle function: we use exact atan2, OpenCV uses its fastAtan2 polynomial
  (~0.3 deg max error) -> quantized bins may differ only for pixels whose
  gradient angle lies within ~0.5 deg of a 11.25-deg bin boundary;
- border policy: we use replicate padding everywhere, OpenCV uses
  reflect-101 + zeroes the 1-px bin border before voting -> compared on the
  interior (8 px margin);
- scattered selection: OpenCV rescans its candidate list decrementing the
  min-distance by 1; we use a static 4-step schedule over the top-512
  candidates (ops/extract.py) -> same feature COUNT, high overlap, and
  every selected feature satisfies the same candidate criteria.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

import oracle_linemod as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "example")


@pytest.fixture(scope="module")
def img0():
    import cv2

    img = cv2.imread(os.path.join(EXAMPLE, "benchmark", "img0.png"))
    assert img is not None
    return img


@pytest.fixture(scope="module")
def oracle_quant_img0(img0):
    return oracle.quantized_orientations(img0)


class TestQuantizationParity:
    def test_quantized_map_agreement(self, img0, oracle_quant_img0):
        from linemod_tpu.ops.gradients import quantize_color_gradients

        oq, omag2 = oracle_quant_img0
        ours = np.asarray(
            quantize_color_gradients(jnp.asarray(img0.astype(np.float32)))[0]
        )
        m = 8  # interior margin: border policies differ (documented)
        a = ours[m:-m, m:-m]
        b = oq[m:-m, m:-m]
        agree = np.mean(a == b)
        assert agree >= 0.999, f"quantized-map agreement {agree:.5f} < 99.9%"

    def test_disagreements_are_bin_boundary_cases(self, img0, oracle_quant_img0):
        """Every interior disagreement must be attributable to a documented
        deviation: either the fastAtan2-vs-atan2 angle difference at a bin
        boundary, or a vote flip caused by such a neighbor."""
        from linemod_tpu.ops.gradients import quantize_color_gradients

        oq, _ = oracle_quant_img0
        ours = np.asarray(
            quantize_color_gradients(jnp.asarray(img0.astype(np.float32)))[0]
        )
        m = 8
        diff = np.argwhere(ours[m:-m, m:-m] != oq[m:-m, m:-m]) + m
        # recompute the oracle's unquantized angles to classify disagreements
        g = oracle.gaussian_kernel7()
        sm = oracle._sep_filter(img0.astype(np.float64), g, g)
        sob_d = np.array([-1.0, 0.0, 1.0])
        sob_s = np.array([1.0, 2.0, 1.0])
        dx = oracle._sep_filter(sm, sob_d, sob_s)
        dy = oracle._sep_filter(sm, sob_s, sob_d)
        mag2 = dx * dx + dy * dy
        best = np.argmax(mag2, axis=-1)
        ii, jj = np.meshgrid(*(np.arange(s) for s in best.shape), indexing="ij")
        ang = oracle.fast_atan2_deg(
            dy[ii, jj, best].astype(np.float32), dx[ii, jj, best].astype(np.float32)
        )
        # distance (deg) to the nearest 16-bin boundary: bins are centred at
        # k*22.5, so boundaries sit at k*22.5 + 11.25 (frac 0.5)
        bound = np.abs(((ang / 22.5) % 1.0) - 0.5) * 22.5
        # a disagreement is explained by a pixel near a boundary (atan2 vs
        # fastAtan2) or by a near-tie between color channels (float64 oracle
        # vs float32 production picks a different channel)
        rel = np.sort(mag2, axis=-1)
        chan_tie = rel[..., 2] < rel[..., 1] * 1.02 + 1.0
        near = (bound < 0.75) | chan_tie
        for r, c in diff:
            patch = near[r - 1 : r + 2, c - 1 : c + 2]
            assert patch.any(), (
                f"disagreement at ({r},{c}) not explained by a bin-boundary "
                f"pixel in its vote neighborhood"
            )


class TestFeatureSelectionParity:
    @pytest.fixture(scope="class")
    def rendered_template(self):
        from linemod_tpu.config import CameraParameters
        from linemod_tpu.ops.rasterizer import mesh_to_arrays, render_views
        from linemod_tpu.utils.geometry import quat_to_mat
        from linemod_tpu.utils.ply import load_ply

        cam = CameraParameters()
        mesh = load_ply(os.path.join(EXAMPLE, "models", "lagergehaeuse.ply"))
        # a representative viewpoint at the fixture's detection distance
        from linemod_tpu.models.template_bank import TemplateBank

        bank = TemplateBank.load(os.path.join(EXAMPLE, "banks", "lagergehaeuse.npz"))
        t = bank.num_templates // 2
        rot = quat_to_mat(bank.quat[t]).astype(np.float32)
        depth, color = render_views(
            mesh_to_arrays(mesh), rot[None],
            np.array([[0.0, 0.0, float(bank.z[t])]], np.float32),
            cam, with_color=True,
        )
        return (np.asarray(color)[0] * 255.0), np.asarray(depth)[0]

    def test_scattered_selection(self, rendered_template):
        from linemod_tpu.ops.extract import extract_template

        color, depth = rendered_template
        out = extract_template(
            jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32)
        )
        x, y, ori, valid = (np.asarray(v) for v in out["grad0"])
        ours = set(zip(x[valid].tolist(), y[valid].tolist(), ori[valid].tolist()))

        oq, omag2 = oracle.quantized_orientations(color)
        # same mask the extractor uses: eroded object mask
        from linemod_tpu.ops.extract import erode_mask

        mask = np.asarray(erode_mask(jnp.asarray(depth > 0)))
        feats = oracle.extract_features(oq, omag2, mask)
        theirs = set(feats)

        # same feature budget
        assert len(theirs) == oracle.NUM_FEATURES
        assert len(ours) == oracle.NUM_FEATURES
        # high positional overlap despite the different rescan schedule:
        # count features within 2 px of a same-orientation counterpart
        def close(a, bs):
            return any(
                (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 <= 4 and a[2] == b[2]
                for b in bs
            )

        overlap = sum(close(f, theirs) for f in ours) / len(ours)
        assert overlap >= 0.7, f"feature overlap {overlap:.2f}"
        # every oracle feature satisfies our candidate criteria (same
        # thresholds), i.e. the candidate sets agree even where selection
        # order differs
        from linemod_tpu.ops.gradients import quantize_color_gradients

        q_ours, mag2_ours = (
            np.asarray(v)
            for v in quantize_color_gradients(jnp.asarray(color, jnp.float32))
        )
        for fx, fy, fori in theirs:
            assert mag2_ours[fy, fx] > oracle.STRONG_THRESHOLD**2 * 0.9


class TestMatchParity:
    def test_threshold80_semantics_on_img0(self, img0, oracle_quant_img0):
        """The oracle's dense level-0 similarity must confirm every valid
        match our detector reports on the real fixture (threshold-80
        semantics carry over), including the pose the benchmark accepts."""
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
            depth = cv2.imread(
                os.path.join("benchmark", "depth0.png"), cv2.IMREAD_ANYDEPTH
            )
            handle = det.detect_submit(img0, depth)
            packed = np.asarray(handle[0])
        finally:
            os.chdir(cwd)
        valid = packed[:, 4] > 0.5
        assert valid.any()

        oq, _ = oracle_quant_img0
        t_fine = det.state.cfg.t_fine
        resp = oracle.response_maps(oracle.spread(oq, t_fine))

        checked = 0
        for tid, x, y, sim in packed[valid][:, :4][:20]:
            tid = int(tid)
            feats = [
                (int(fx), int(fy), int(fo))
                for (fx, fy, fo), v in zip(bank.feat0[tid], bank.valid0[tid])
                if v
            ]
            gx, gy = int(x) // t_fine, int(y) // t_fine
            dense = oracle.dense_similarity(feats, resp, t_fine)
            o_sim = dense[gy, gx]
            # tolerance: the quantized maps differ on <0.1% of pixels
            assert o_sim >= 78.0, f"tid {tid} at ({x},{y}): oracle {o_sim:.1f}"
            assert abs(o_sim - sim) <= 3.0, (
                f"tid {tid}: oracle {o_sim:.1f} vs ours {sim:.1f}"
            )
            checked += 1
        assert checked > 0
