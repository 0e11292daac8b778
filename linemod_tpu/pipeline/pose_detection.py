"""Online pose-detection orchestrator (replaces C4, src/PoseDetection.cpp).

Sequences per frame: principal-point recentring -> full-bank pyramid match
(jitted) -> host-side grouping -> batched color/depth validation (jitted) ->
closed-form pose reconstruction -> optional ICP refinement + verify-by-render.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import CameraParameters, ModelProperties, TemplateSettings
from ..ops.detect_core import detect_frame, make_check_state
from ..ops.matching import MatchConfig, MatchState, build_match_state
from ..ops.postprocess import (
    discard_small_groups,
    group_matches,
    reconstruct_pose,
)
from ..types import ObjectPose


@dataclasses.dataclass
class DetectionDebug:
    num_raw_matches: int = 0
    num_groups: int = 0
    groups_kept: int = 0
    checks: list = dataclasses.field(default_factory=list)


class PoseDetection:
    """Holds one model class's bank + jitted matcher state.

    Multi-class operation = one instance per class (the reference also
    matches one class per detect call, src/HighLevelLinemod.cpp:145).
    """

    def __init__(
        self,
        bank,
        cam: CameraParameters,
        settings: TemplateSettings,
        props: ModelProperties,
        mesh=None,
        icp=None,
    ):
        self.bank = bank
        self.cam = cam
        self.settings = settings
        self.props = props
        self.mesh = mesh
        self.icp = icp  # optional IcpRefiner (pipeline wiring in detect())
        t_coarse = 8
        # VMEM-resident Pallas coarse scan: TPU backend, grid within one
        # (32 x 128) tile (640x480 at T=8 is 30 x 40)
        import jax

        use_pallas = (
            jax.default_backend() == "tpu"
            and (cam.height // 2) // t_coarse <= 32
            and (cam.width // 2) // t_coarse <= 128
        )
        cfg = MatchConfig(
            width=cam.width,
            height=cam.height,
            t_fine=5 if bank.dual_modality else 2,
            t_coarse=t_coarse,
            threshold=settings.detector_threshold,
            dual_modality=bank.dual_modality,
            template_chunk=min(256, _pad_chunk(bank.num_templates)),
            use_pallas=use_pallas,
        )
        padded = _pad_bank(bank, cfg.template_chunk)
        self.state = build_match_state(padded, cfg)
        self.check = make_check_state(padded, props)

    # ------------------------------------------------------------------
    def recenter(self, img: np.ndarray) -> np.ndarray:
        """Shift principal point to the image centre (translateImg,
        src/PoseDetection.cpp:54-59,192-197) — integer shift, zero fill."""
        dx = int(round(-self.cam.cx + self.cam.width / 2))
        dy = int(round(-self.cam.cy + self.cam.height / 2))
        if dx == 0 and dy == 0:
            return img
        out = np.zeros_like(img)
        h, w = img.shape[:2]
        sy0, dy0 = max(0, -dy), max(0, dy)
        sx0, dx0 = max(0, -dx), max(0, dx)
        hh = h - abs(dy)
        ww = w - abs(dx)
        out[dy0 : dy0 + hh, dx0 : dx0 + ww] = img[sy0 : sy0 + hh, sx0 : sx0 + ww]
        return out

    # ------------------------------------------------------------------
    def detect(
        self,
        color: np.ndarray,
        depth: np.ndarray,
        num_objects: int = 1,
        debug: DetectionDebug | None = None,
    ) -> list:
        """Detect up to num_objects poses in one RGB-D frame.

        color: [H, W, 3] uint8 BGR; depth: [H, W] uint16/float mm.
        Returns a list of ObjectPose (CV camera frame, mm).

        The device does all per-frame array work in ONE jitted program
        (ops/detect_core.py) and the host reads back ONE packed array —
        device->host fetches are the latency bottleneck on remote TPU
        transports. Grouping, gating and pose math are host-side numpy.
        """
        color_c = self.recenter(np.ascontiguousarray(color))
        depth_c = self.recenter(np.ascontiguousarray(depth)).astype(np.float32)

        packed = np.asarray(
            detect_frame(
                self.state,
                self.check,
                jnp.asarray(color_c.astype(np.uint8)),
                jnp.asarray(depth_c),
            )
        )
        tid_all = packed[:, 0].astype(np.int64)
        valid = packed[:, 4] > 0.5
        has_checks = packed[:, 5] >= 0.0
        keep = valid & has_checks
        tid = tid_all[keep]
        xs = packed[keep, 1]
        ys = packed[keep, 2]
        color_pct = packed[keep, 5]
        scene_p20 = packed[keep, 6]
        if debug is not None:
            debug.num_raw_matches = int(valid.sum())
        if len(tid) == 0:
            return []

        groups = group_matches(xs, ys, self.settings.group_radius)
        if debug is not None:
            debug.num_groups = len(groups)
        groups = discard_small_groups(groups, self.settings.discard_group_ratio)
        if debug is not None:
            debug.groups_kept = len(groups)
        if not groups:
            return []

        poses: list[ObjectPose] = []
        grouped_pose_sets = []  # per group, candidate poses (for ICP's joint refine)
        for g in groups:
            g = np.asarray(g)
            group_poses = []
            for j in g:
                ok_color = color_pct[j] > self.settings.percent_to_pass_check
                t = int(tid[j])
                if self.settings.use_depth_improvement:
                    depth_diff = (
                        float(scene_p20[j])
                        - float(self.bank.median_depth[t])
                        - self.settings.depth_offset
                    )
                    ok_depth = abs(depth_diff) < self.settings.distance_step
                    direct_depth = float(self.bank.z[t]) + depth_diff
                else:
                    ok_depth = True
                    direct_depth = float(self.bank.z[t])
                if debug is not None:
                    debug.checks.append(
                        (t, float(color_pct[j]), float(scene_p20[j]), ok_color, ok_depth)
                    )
                if ok_color and ok_depth:
                    pose = reconstruct_pose(
                        float(xs[j]),
                        float(ys[j]),
                        self.bank.bbox[t],
                        self.bank.quat[t],
                        direct_depth,
                        self.cam,
                    )
                    group_poses.append(pose)
                if len(group_poses) >= self.settings.number_wanted_poses:
                    break
            if group_poses:
                grouped_pose_sets.append(group_poses)

        # ICP refinement + verify-by-render best-pose selection per group
        # (src/PoseDetection.cpp:72-84); otherwise first pose per group.
        for group_poses in grouped_pose_sets:
            if self.icp is not None and self.settings.use_icp:
                refined = self.icp.refine(depth_c, group_poses)
                best = self.icp.best_verified(depth_c, refined)
                if best is not None:
                    poses.append(best)
            else:
                poses.append(group_poses[0])
            if len(poses) >= num_objects:
                break
        return poses


def _pad_chunk(n: int) -> int:
    return max(1, 1 << (int(np.ceil(np.log2(max(n, 1))))))


def _pad_bank(bank, chunk: int):
    """Pad the bank to a multiple of the template chunk with inert templates."""
    n = bank.num_templates
    target = int(np.ceil(n / chunk)) * chunk
    if target == n:
        return bank
    pad = target - n
    import copy

    b = copy.copy(bank)

    def padded(a, fill=0):
        if a is None:
            return None
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    b.feat0 = padded(bank.feat0)
    b.valid0 = padded(bank.valid0, False)
    b.feat1 = padded(bank.feat1)
    b.valid1 = padded(bank.valid1, False)
    b.bbox = padded(bank.bbox, 1)
    b.quat = padded(bank.quat)
    b.z = padded(bank.z, 1.0)
    b.median_depth = padded(bank.median_depth)
    b.hull = padded(bank.hull)
    b.nfeat0 = padded(bank.nfeat0)
    b.nvalid0 = padded(bank.nvalid0, False)
    b.nfeat1 = padded(bank.nfeat1)
    b.nvalid1 = padded(bank.nvalid1, False)
    return b
