"""Multi-model online orchestration.

The reference loads ALL models' template banks at startup, cross-checks the
bank's class ids against the model files on disk
(src/PoseDetection.cpp:142-160), and matches the requested class per frame
(src/HighLevelLinemod.cpp:145). The TPU equivalent holds every class in one
concatenated super-bank so a single device program computes the per-frame
response planes ONCE and scans all classes against them — per-class scans
would each recompute the planes.

detect_all returns poses for every class in one frame; detect(class_id)
restricts post-processing (and pose output) to one class. The scan itself is
always whole-bank — with the Pallas kernels the marginal cost of the extra
classes' templates is far below one extra planes pass.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..config import CameraParameters, ModelProperties, TemplateSettings
from ..models.template_bank import TemplateBank, concat_banks
from ..ops.detect_core import (
    delta_encode_host,
    detect_frame,
    detect_frame_delta,
    detect_frame_dual,
    detect_frame_dual_delta,
)
from ..ops.matching import build_match_state
from .pose_detection import (
    DetectionDebug,
    PoseDetection,
    _pad_bank,
    make_match_config,
)


def check_bank_model_consistency(class_ids, model_files) -> None:
    """Banks on disk must one-to-one match the model files
    (src/PoseDetection.cpp:155-159: 'Number of Models does not match' /
    per-index id==file check)."""
    stems = sorted(os.path.splitext(os.path.basename(f))[0] for f in model_files)
    ids = sorted(class_ids)
    if len(ids) != len(stems):
        raise ValueError(
            f"number of banks ({len(ids)}) does not match number of model "
            f"files ({len(stems)})"
        )
    for i, s in zip(ids, stems):
        if i != s:
            raise ValueError(f"bank class id {i!r} does not match model file {s!r}")


class MultiModelPoseDetection:
    """One detector over N classes: shared per-frame planes, per-class
    post-processing.

    banks/props: dicts keyed by class id. model_files (optional): model file
    names to consistency-check against, like the reference's startup check.
    """

    def __init__(
        self,
        banks: dict[str, TemplateBank],
        cam: CameraParameters,
        settings: TemplateSettings,
        props: dict[str, ModelProperties],
        model_files=None,
        icps: dict | None = None,
    ):
        if model_files is not None:
            check_bank_model_consistency(list(banks), model_files)
        if set(banks) != set(props):
            raise ValueError("banks and props must cover the same class ids")
        self.class_ids = list(banks)
        self.banks = banks
        self.props = props
        self.cam = cam
        self.settings = settings
        self.icps = icps or {}

        combined, offsets = concat_banks([banks[c] for c in self.class_ids])
        self.offsets = offsets  # first global tid per class
        self.sizes = np.array([banks[c].num_templates for c in self.class_ids])
        # top_k scales with the class count (make_match_config) so one
        # dominant class can't crowd every candidate slot of the shared cut.
        cfg = make_match_config(
            cam,
            settings,
            combined.dual_modality,
            combined.num_templates,
            n_classes=len(self.class_ids),
        )
        self.dual = combined.dual_modality
        import jax as _jax

        # delta-encoded color upload on TPU transports (see
        # PoseDetection.delta_transport / ops/detect_core.delta_encode_host)
        self.delta_transport = _jax.default_backend() == "tpu"
        self.state = build_match_state(_pad_bank(combined, cfg.template_chunk), cfg)
        self._hull_masks = {c: {} for c in self.class_ids}
        # recentring is shared with the single-model orchestrator
        self.recenter = PoseDetection.recenter.__get__(self)

    # ------------------------------------------------------------------
    def detect_submit(self, color: np.ndarray, depth: np.ndarray):
        color_c = self.recenter(np.ascontiguousarray(color))
        depth_c = self.recenter(np.ascontiguousarray(depth))
        if self.dual:
            if self.delta_transport:
                packed = detect_frame_dual_delta(
                    self.state,
                    jnp.asarray(delta_encode_host(color_c.astype(np.uint8))),
                    jnp.asarray(depth_c),
                )
            else:
                packed = detect_frame_dual(
                    self.state,
                    jnp.asarray(color_c.astype(np.uint8)),
                    jnp.asarray(depth_c),
                )
        elif self.delta_transport:
            packed = detect_frame_delta(
                self.state,
                jnp.asarray(delta_encode_host(color_c.astype(np.uint8))),
            )
        else:
            packed = detect_frame(self.state, jnp.asarray(color_c.astype(np.uint8)))
        return packed, color_c, depth_c

    def detect_all(
        self,
        color: np.ndarray,
        depth: np.ndarray,
        num_objects: int = 1,
        debug: dict[str, DetectionDebug] | None = None,
    ) -> dict[str, list]:
        """Detect every loaded class in one frame (planes computed once).

        Returns {class_id: [ObjectPose, ...]} (empty lists included)."""
        return self._collect(
            self.detect_submit(color, depth), self.class_ids, num_objects, debug
        )

    def detect(
        self,
        class_id: str,
        color: np.ndarray,
        depth: np.ndarray,
        num_objects: int = 1,
        debug: DetectionDebug | None = None,
    ) -> list:
        """Detect one class (the reference's per-frame shape,
        src/PoseDetection.cpp:45 with a model name argument)."""
        out = self._collect(
            self.detect_submit(color, depth),
            [class_id],
            num_objects,
            {class_id: debug} if debug is not None else None,
        )
        return out[class_id]

    def detect_all_stream(
        self,
        frames,
        num_objects: int = 1,
        pipeline_depth: int | None = None,
        workers: int | None = None,
    ):
        """Generator: detect_all over an iterable of (color, depth) with up
        to `pipeline_depth` frames in flight (the multi-class analogue of
        PoseDetection.detect_stream — same transport reasoning: several
        fetches must be in flight for the stream to reach the upload/device
        ceiling). With ICP configured, collection splits into two chained
        executor stages so every class's ICP fetch overlaps the next
        frame's match fetch, and the pipeline auto-sizes up (see
        PoseDetection.detect_stream). Yields {class_id: [ObjectPose, ...]}
        in submission order."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        two_stage = bool(self.icps) and self.settings.use_icp
        if workers is None:
            workers = 8 if two_stage else 3
        if pipeline_depth is None:
            pipeline_depth = 12 if two_stage else 4

        with ThreadPoolExecutor(max(1, workers)) as ex:
            futs: collections.deque = collections.deque()
            for color, depth in frames:
                handle = self.detect_submit(color, depth)
                if two_stage:
                    f1 = ex.submit(
                        self._collect_phase1, handle, self.class_ids
                    )
                    futs.append(
                        ex.submit(
                            lambda f=f1: self._collect_phase2(
                                f.result(), num_objects
                            )
                        )
                    )
                else:
                    futs.append(
                        ex.submit(
                            self._collect, handle, self.class_ids,
                            num_objects, None,
                        )
                    )
                while len(futs) > pipeline_depth:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()

    # ------------------------------------------------------------------
    def _collect(self, handle, class_ids, num_objects, debug):
        return self._collect_phase2(
            self._collect_phase1(handle, class_ids, debug), num_objects
        )

    def _collect_phase1(self, handle, class_ids, debug=None):
        """Stage 1: fetch the match results, run every class's host-side
        grouping + checks, and SUBMIT each ICP-enabled class's fused
        per-group refine+verify program without waiting (the multi-class
        analogue of PoseDetection._collect_phase1 — the ICP fetches then
        overlap the next frame's match in detect_all_stream)."""
        from .pose_detection import (
            group_candidate_poses,
            resolve_prefilter_packed,
        )

        packed, color_c, depth_c = handle
        packed = resolve_prefilter_packed(
            np.asarray(packed), self, color_c, depth_c, self.dual
        )
        valid = packed[:, 4] > 0.5
        tid = packed[valid, 0].astype(np.int64)
        xs = packed[valid, 1]
        ys = packed[valid, 2]
        cls_idx = np.searchsorted(self.offsets, tid, side="right") - 1
        per_class = {}
        for c in class_ids:
            i = self.class_ids.index(c)
            sel = cls_idx == i
            dbg = debug.get(c) if debug else None
            if dbg is not None:
                dbg.num_raw_matches = int(sel.sum())
            grouped = group_candidate_poses(
                tid[sel] - self.offsets[i], xs[sel], ys[sel],
                self.banks[c], self.props[c], self.settings, self.cam,
                color_c, depth_c, self._hull_masks[c], debug=dbg,
            )
            icp = self.icps.get(c)
            icp_handle = None
            if icp is not None and self.settings.use_icp and grouped:
                icp_handle = icp.refine_submit(depth_c, grouped)
            per_class[c] = (grouped, icp_handle)
        return per_class

    def _collect_phase2(self, per_class, num_objects):
        results: dict[str, list] = {}
        for c, (grouped, icp_handle) in per_class.items():
            if icp_handle is not None:
                poses = []
                for best in self.icps[c].refine_collect(icp_handle):
                    if best is not None:
                        poses.append(best)
                    if len(poses) >= num_objects:
                        break
                results[c] = poses
            else:
                results[c] = [g[0] for g in grouped[:num_objects]]
        return results
