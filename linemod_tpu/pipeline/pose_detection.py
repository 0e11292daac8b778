"""Online pose-detection orchestrator (replaces C4, src/PoseDetection.cpp).

Sequences per frame: principal-point recentring -> full-bank pyramid match
(one jitted device program) -> host-side grouping -> lazy per-candidate
color/depth validation (numpy, reference post-grouping order) -> closed-form
pose reconstruction -> optional ICP refinement + verify-by-render.

Supports synchronous detect() and a pipelined detect_submit/detect_collect
pair (detect_stream keeps one frame in flight) for streaming throughput on
high-latency device transports.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import CameraParameters, ModelProperties, TemplateSettings
from ..ops.detect_core import (
    delta_encode_host,
    detect_frame,
    detect_frame_delta,
    detect_frame_dual,
    detect_frame_quant,
    detect_frames_batch,
)
from ..ops.matching import MatchConfig, MatchState, build_match_state
from ..ops.postprocess import (
    color_check_host,
    hull_mask,
    depth_p20_host,
    discard_small_groups,
    group_matches,
    reconstruct_pose,
)
from ..types import ObjectPose


def resolve_prefilter_packed(
    packed: np.ndarray, owner, color_c: np.ndarray, depth_c: np.ndarray,
    dual: bool,
) -> np.ndarray:
    """Handle the prefiltered cut's exactness-proof row (detect_core._pack
    appends it when MatchConfig.prefilter_sel is active): slice it off, and
    re-run a saturated frame synchronously on the exact streaming matcher.

    Shared by the single- and multi-model orchestrators: `owner` carries the
    compiled `.state` and caches the lazily-built exact retry state on
    itself (saturation needs template maxes tied at the selection boundary,
    which real banks essentially never hit, so the retry program compiles
    only if ever needed)."""
    top_k = owner.state.cfg.top_k
    if packed.shape[0] != top_k + 1:
        return packed
    if packed[-1, 0] < 0.5:
        if getattr(owner, "_exact_state", None) is None:
            cfg = dataclasses.replace(
                owner.state.cfg, prefilter_sel=0,
                scan_chunk=owner.state.cfg.scan_chunk or 4096,
            )
            owner._exact_state = dataclasses.replace(owner.state, cfg=cfg)
        from ..ops.detect_core import detect_frame, detect_frame_dual

        if dual:
            packed = np.asarray(
                detect_frame_dual(
                    owner._exact_state,
                    jnp.asarray(color_c.astype(np.uint8)),
                    jnp.asarray(depth_c),
                )
            )
        else:
            packed = np.asarray(
                detect_frame(
                    owner._exact_state, jnp.asarray(color_c.astype(np.uint8))
                )
            )
    return packed[:top_k]


@dataclasses.dataclass
class DetectionDebug:
    num_raw_matches: int = 0
    num_groups: int = 0
    groups_kept: int = 0
    checks: list = dataclasses.field(default_factory=list)


def make_match_config(
    cam: CameraParameters,
    settings: TemplateSettings,
    dual_modality: bool,
    n_templates: int,
    n_classes: int = 1,
) -> MatchConfig:
    """Production MatchConfig shared by the single- and multi-model
    orchestrators.

    - Pallas VMEM-resident scan as the coarse engine on TPU (grids up to
      32 x 128 cells); XLA gather elsewhere. (An MXU im2col-matmul engine
      existed in rounds 2-3 and was deleted — see the note in
      ops/matching.MatchConfig.)
    - top_k scales with the class count so classes in a super-bank can't
      starve each other of candidate slots (the reference matches each class
      with its own unbounded match list, src/HighLevelLinemod.cpp:145-164).
    - the candidate cut is the exact blocked top-K (adaptive ~8-block
      decomposition): bare approx_max_k measurably changed the match set on
      the real fixture (2 missed / 3 extra of 115, scripts/tpu_parity.py)
      so it stays off, and the guarded approx cut (exactness guard +
      fallback, MatchConfig.guarded_cut) stays an opt-in for sparse scenes
      because dense coarse-level candidate counts on real scenes defeat its
      guard (see the guarded_cut note below).
    """
    import jax

    t_coarse = 8
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = (
        on_tpu
        and (cam.height // 2) // t_coarse <= 32
        and (cam.width // 2) // t_coarse <= 128
    )
    top_k = 512 * n_classes
    # Large banks (the reference's configured regime reaches 96,300
    # templates, linemod_settings.yml:21-27) never materialize the dense
    # [N, G] similarity: the prefiltered exact cut reduces the bank to
    # per-template maxes and rescans only the top prefilter_sel templates
    # (MatchConfig.prefilter_sel); scan_chunk stays configured as the exact
    # streaming engine the host retries rare saturated frames on.
    big_bank = n_templates > 8192
    return MatchConfig(
        width=cam.width,
        height=cam.height,
        t_fine=5 if dual_modality else 2,
        t_coarse=t_coarse,
        top_k=top_k,
        threshold=settings.detector_threshold,
        dual_modality=dual_modality,
        template_chunk=min(256, _pad_chunk(n_templates)),
        use_pallas=use_pallas,
        approx_topk=False,
        prefilter_sel=max(2 * top_k, 1024) if big_bank else 0,
        scan_chunk=4096 if big_bank else 0,
        # guarded_cut stays OFF for production: real bin-picking scenes are
        # DENSE at the coarse level (the fixture frame has ~554k of 2.4M
        # (template, cell) pairs >= threshold 80 — T=8 spreading over a
        # cluttered scene saturates the response planes), so the guard's
        # every-above-threshold-captured condition can never hold and the
        # approx pass is pure overhead. It is a 12x cut win on SPARSE
        # scenes (<~512 coarse candidates) — an explicit opt-in for such
        # deployments (MatchConfig.guarded_cut).
        guarded_cut=False,
        # blocked exact cut: same top-K values as one flat lax.top_k at a
        # fraction of its TPU cost (3.9 -> 0.9 ms at 2048 templates; block
        # size auto-adapts to ~8 blocks per shape, candidate_cut)
        cut_block_rows=256,
    )


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
        host_quant: bool | None = None,
    ):
        self.bank = bank
        self.cam = cam
        self.settings = settings
        self.props = props
        self.mesh = mesh
        self.icp = icp  # optional IcpRefiner (pipeline wiring in detect())
        cfg = make_match_config(cam, settings, bank.dual_modality, bank.num_templates)
        padded = _pad_bank(bank, cfg.template_chunk)
        self.state = build_match_state(padded, cfg)
        self._hull_masks: dict[int, np.ndarray] = {}  # per-template, lazy
        # host-quantize transport mode: on byte-constrained links, quantize
        # on the host (bit-identical C++, native/quantize.cpp) and send the
        # two u8 orientation maps (384 KB) instead of the BGR frame (921 KB).
        # The tradeoff is link bytes vs host CPU: the C++ quantizer is ~26 ms
        # on 2 cores (~4 ms on 16), while the measured upload saving is only
        # ~6 ms at the current ~83 MB/s link — so auto-enable only when the
        # host has cores to spare; on small hosts raw-color upload wins.
        if host_quant is None:
            import os

            import jax

            from ..utils import native

            host_quant = (
                not bank.dual_modality
                and jax.default_backend() == "tpu"
                and (os.cpu_count() or 1) >= 8
                and native.available()
            )
        self.host_quant = host_quant and not bank.dual_modality
        # delta-encoded color upload (when not host-quantizing): see
        # detect_submit. On TPU transports only — on CPU the "upload" is a
        # memcpy and the encode would be pure overhead.
        import jax as _jax

        self.delta_transport = (
            not self.host_quant and _jax.default_backend() == "tpu"
        )

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
        """Detect up to num_objects poses in one RGB-D frame (synchronous).

        color: [H, W, 3] uint8 BGR; depth: [H, W] uint16/float mm.
        Returns a list of ObjectPose (CV camera frame, mm).
        """
        return self.detect_collect(self.detect_submit(color, depth), num_objects, debug)

    def detect_submit(self, color: np.ndarray, depth: np.ndarray):
        """Enqueue the per-frame device program; returns a handle for
        detect_collect.

        The device runs ONE jitted match-only program (ops/detect_core.py)
        and the host later reads back ONE packed candidate array —
        device->host round-trips cost ~50 ms on remote TPU transports, so a
        streaming caller keeps one frame in flight (submit k+1 before
        collecting k) and pays only device + upload time per frame. In
        color-only mode the depth image stays on the host (the validation
        checks run there), halving the per-frame upload.
        """
        color_c = self.recenter(np.ascontiguousarray(color))
        depth_c = self.recenter(np.ascontiguousarray(depth))
        if self.bank.dual_modality:
            from ..ops.detect_core import detect_frame_dual_delta

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
        elif self.host_quant:
            from ..utils import native

            q0, q1 = native.quantize_frame(color_c)
            packed = detect_frame_quant(
                self.state, jnp.asarray(q0), jnp.asarray(q1)
            )
        elif self.delta_transport:
            # delta-encoded upload: the transport compresses, and the
            # PNG-style predictor shrinks the compressed frame ~15%
            # (ops/detect_core.delta_encode_host); decode is a cumsum
            # fused into the device program, output bit-identical
            packed = detect_frame_delta(
                self.state,
                jnp.asarray(delta_encode_host(color_c.astype(np.uint8))),
            )
        else:
            packed = detect_frame(self.state, jnp.asarray(color_c.astype(np.uint8)))
        return packed, color_c, depth_c

    def detect_submit_batch(self, frames):
        """Enqueue ONE device program covering several frames (color-only
        path). frames: list of (color, depth); returns a batch handle for
        detect_collect_batch. Amortizes the per-call transport handshake
        over the batch — see ops/detect_core.detect_frames_batch."""
        recentred = [
            (
                self.recenter(np.ascontiguousarray(c)),
                self.recenter(np.ascontiguousarray(d)),
            )
            for c, d in frames
        ]
        if self.delta_transport:
            from ..ops.detect_core import detect_frames_batch_delta

            deltas = np.stack(
                [delta_encode_host(c.astype(np.uint8)) for c, _ in recentred]
            )
            packed = detect_frames_batch_delta(self.state, jnp.asarray(deltas))
        else:
            colors = np.stack([c for c, _ in recentred]).astype(np.uint8)
            packed = detect_frames_batch(self.state, jnp.asarray(colors))
        return packed, recentred

    def detect_collect_batch(self, handle, num_objects: int = 1):
        """Fetch + post-process one submitted batch; returns a list of pose
        lists (one per frame, submission order)."""
        packed, recentred = handle
        packed = np.asarray(packed)
        return [
            self.detect_collect((packed[i], c, d), num_objects)
            for i, (c, d) in enumerate(recentred)
        ]

    def detect_stream(
        self,
        frames,
        num_objects: int = 1,
        pipeline_depth: int | None = None,
        workers: int | None = None,
        batch: int = 1,
    ):
        """Generator: detect over an iterable of (color, depth) with up to
        `pipeline_depth` frames in flight, collected by `workers` threads.

        Collection runs on worker threads: the device fetch (HTTP wait) and
        the host quantization (ctypes) both release the GIL, so frame k's
        readback+postprocess overlaps frame k+1's quantize+upload. On
        high-latency device transports the per-frame fetch round-trip (~50 ms
        measured on the axon tunnel) dwarfs both device compute (~5 ms) and
        the frame upload (~11 ms), so SEVERAL fetches must be in flight at
        once for the stream rate to reach the upload/device ceiling — one
        collector thread caps the stream at ~1/RTT-ish rates regardless of
        device speed. Results yield in submission order (the future deque
        preserves it)."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        # auto-sized pipeline: the ICP-on stream is TWO chained round trips
        # per frame (match fetch, then ICP fetch), so it needs roughly twice
        # the in-flight fetches of the one-trip stream to stay
        # transport-latency-free (measured on the ~50 ms-RTT tunnel: 20 ->
        # ~28 fps going from 3/4 to 8/12 with ICP on; the one-trip stream
        # saturates at 3/4)
        two_stage_icp = self.icp is not None and self.settings.use_icp
        if workers is None:
            workers = 8 if two_stage_icp else 3
        if pipeline_depth is None:
            pipeline_depth = 12 if two_stage_icp else 4

        use_batch = (
            batch > 1 and not self.bank.dual_modality and not self.host_quant
        )
        with ThreadPoolExecutor(max(1, workers)) as ex:
            futs: collections.deque = collections.deque()
            if use_batch:
                pend: list = []
                for cd in frames:
                    pend.append(cd)
                    if len(pend) == batch:
                        handle = self.detect_submit_batch(pend)
                        futs.append(
                            ex.submit(self.detect_collect_batch, handle, num_objects)
                        )
                        pend = []
                    while len(futs) > pipeline_depth:
                        yield from futs.popleft().result()
                if pend:
                    handle = self.detect_submit_batch(pend)
                    futs.append(
                        ex.submit(self.detect_collect_batch, handle, num_objects)
                    )
                while futs:
                    yield from futs.popleft().result()
                return
            # With ICP on, collection is two transport round trips (match
            # fetch, then ICP fetch). Splitting them into two chained
            # executor stages lets frame k's ICP fetch overlap frame k+1's
            # match fetch — a worker picking up stage 2 blocks briefly on
            # its own stage-1 future, which is safe: stages are submitted
            # in dependency order, so FIFO workers always make progress.
            two_stage = two_stage_icp
            for color, depth in frames:
                handle = self.detect_submit(color, depth)
                if two_stage:
                    f1 = ex.submit(self._collect_phase1, handle)
                    futs.append(
                        ex.submit(
                            lambda f=f1: self._collect_phase2(
                                f.result(), num_objects
                            )
                        )
                    )
                else:
                    futs.append(
                        ex.submit(self.detect_collect, handle, num_objects)
                    )
                while len(futs) > pipeline_depth:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()

    def detect_collect(
        self,
        handle,
        num_objects: int = 1,
        debug: DetectionDebug | None = None,
    ) -> list:
        """Fetch + post-process one submitted frame.

        Grouping, the lazy color/depth validation checks, and the pose math
        are host-side numpy: the checks touch only the bbox window of each
        candidate actually reached in group order (exactly the reference's
        post-grouping check order, src/HighLevelLinemod.cpp:382-421 — no
        top-K truncation of which candidates can be checked)."""
        return self._collect_phase2(
            self._collect_phase1(handle, debug), num_objects
        )

    def _collect_phase1(self, handle, debug: DetectionDebug | None = None):
        """Stage 1 of collection: fetch the match results (the first
        transport round trip), run the host-side grouping + checks, and —
        when ICP is on — SUBMIT the frame's fused per-group refine+verify
        program (ops/icp.py refine_submit) without waiting for it. The
        second round trip (the ICP fetch) then overlaps the next frame's
        match in detect_stream's pipeline instead of serializing behind
        this frame (round-4 weakness: the synchronous chain cost ~2 RTTs of
        critical path per frame)."""
        packed, color_c, depth_c = handle
        packed = resolve_prefilter_packed(
            np.asarray(packed), self, color_c, depth_c,
            self.bank.dual_modality,
        )
        valid = packed[:, 4] > 0.5
        tid = packed[valid, 0].astype(np.int64)
        xs = packed[valid, 1]
        ys = packed[valid, 2]
        if debug is not None:
            debug.num_raw_matches = int(valid.sum())
        grouped = group_candidate_poses(
            tid, xs, ys, self.bank, self.props, self.settings, self.cam,
            color_c, depth_c, self._hull_masks, debug=debug,
        )
        icp_handle = None
        if self.icp is not None and self.settings.use_icp and grouped:
            # depth ships in its capture dtype (u16 zlib-compresses ~10:1 on
            # the wire; f32 would double the bytes) — cast happens on device
            icp_handle = self.icp.refine_submit(depth_c, grouped)
        return grouped, icp_handle

    def _collect_phase2(self, phase1, num_objects: int = 1) -> list:
        """Stage 2 of collection: fetch the ICP results (if submitted) and
        select the final poses."""
        grouped, icp_handle = phase1
        if icp_handle is not None:
            poses = []
            for best in self.icp.refine_collect(icp_handle):
                if best is not None:
                    poses.append(best)
                if len(poses) >= num_objects:
                    break
            return poses
        return [g[0] for g in grouped[:num_objects]]


def group_candidate_poses(
    tid: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    bank,
    props,
    settings,
    cam,
    color_c: np.ndarray,
    depth_c: np.ndarray,
    hull_masks: dict,
    debug: DetectionDebug | None = None,
) -> list:
    """The pure-host half of post-processing: group the valid matches, run
    the lazy per-candidate color/depth checks in reference post-grouping
    order (src/HighLevelLinemod.cpp:382-421), and reconstruct candidate
    poses. Returns a list of per-group pose lists (empty groups dropped);
    pose selection / ICP happens on top of this (postprocess_matches)."""
    if len(tid) == 0:
        return []

    groups = group_matches(xs, ys, settings.group_radius)
    if debug is not None:
        debug.num_groups = len(groups)
    groups = discard_small_groups(groups, settings.discard_group_ratio)
    if debug is not None:
        debug.groups_kept = len(groups)
    if not groups:
        return []

    lower = np.asarray(props.lower_color_range, np.float32)
    upper = np.asarray(props.upper_color_range, np.float32)
    grouped_pose_sets = []  # per group, candidate poses (for ICP's joint refine)
    for g in groups:
        g = np.asarray(g)
        group_poses = []
        for j in g:
            t = int(tid[j])
            xy = (xs[j], ys[j])
            wh = bank.bbox[t, 2:4]
            mask = hull_masks.get(t)
            if mask is None:
                mask = hull_mask(bank.hull[t], wh)
                hull_masks[t] = mask
            color_pct = color_check_host(color_c, mask, xy, lower, upper)
            ok_color = color_pct > settings.percent_to_pass_check
            if settings.use_depth_improvement:
                scene_p20 = depth_p20_host(depth_c, xy, wh)
                depth_diff = (
                    scene_p20 - float(bank.median_depth[t]) - settings.depth_offset
                )
                ok_depth = abs(depth_diff) < settings.distance_step
                direct_depth = float(bank.z[t]) + depth_diff
            else:
                scene_p20 = -1.0
                ok_depth = True
                direct_depth = float(bank.z[t])
            if debug is not None:
                debug.checks.append(
                    (t, float(color_pct), float(scene_p20), ok_color, ok_depth,
                     (float(xy[0]), float(xy[1])))
                )
            if ok_color and ok_depth:
                pose = reconstruct_pose(
                    float(xs[j]),
                    float(ys[j]),
                    bank.bbox[t],
                    bank.quat[t],
                    direct_depth,
                    cam,
                )
                group_poses.append(pose)
            if len(group_poses) >= settings.number_wanted_poses:
                break
        if group_poses:
            grouped_pose_sets.append(group_poses)
    return grouped_pose_sets


def postprocess_matches(
    tid: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    bank,
    props,
    settings,
    cam,
    color_c: np.ndarray,
    depth_c: np.ndarray,
    num_objects: int,
    hull_masks: dict,
    icp=None,
    debug: DetectionDebug | None = None,
) -> list:
    """Group + validate + reconstruct poses for one class's valid matches
    (the host half of the frame; shared by single- and multi-model
    orchestration). tid is local to `bank`."""
    grouped_pose_sets = group_candidate_poses(
        tid, xs, ys, bank, props, settings, cam, color_c, depth_c,
        hull_masks, debug=debug,
    )
    return select_group_poses(
        grouped_pose_sets, settings, depth_c, num_objects, icp=icp
    )


def select_group_poses(
    grouped_pose_sets: list, settings, depth_c, num_objects: int, icp=None
) -> list:
    """Pose selection per group: ICP refinement + verify-by-render when
    enabled (src/PoseDetection.cpp:72-84) — ALL groups batched into one
    device program with one fetch (ops/icp.py refine_best_many) — otherwise
    the first pose per group."""
    if not grouped_pose_sets:
        return []
    poses: list[ObjectPose] = []
    if icp is not None and settings.use_icp:
        results = icp.refine_best_many(depth_c, grouped_pose_sets)
        for best in results:
            if best is not None:
                poses.append(best)
            if len(poses) >= num_objects:
                break
    else:
        for group_poses in grouped_pose_sets:
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
