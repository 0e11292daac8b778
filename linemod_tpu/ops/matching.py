"""Detect-time template matching: coarse-to-fine pyramid scan.

The online half of the matching engine (what `cv::linemod::Detector::match`
does inside OpenCV, called at src/HighLevelLinemod.cpp:152), re-designed for
TPU:

- the whole template bank is scored *densely* at the coarse pyramid level
  (half resolution, T=8 spreading) as one batched gather-accumulate over the
  linearized response planes — every template at every grid cell, no
  data-dependent control flow;
- a static top-K of (template, cell) candidates is refined at the fine level
  (full resolution, T=2 color-only / T=5 dual) over the 8x8 sub-cell
  positions the coarse cell covers;
- similarity = 100 * raw / (4 * num_features), matches kept at the detector
  threshold (linemod_settings.yml:29).

This module is the pure-XLA reference implementation; ops/similarity_pallas.py
provides the VMEM-resident Pallas kernel for the same contraction.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .extract import downsample2
from .gradients import quantize_color_gradients
from .normals import quantize_normals
from .spread import (
    feature_flat_offsets,
    linear_plane_shape,
    linearized_response_planes,
)

MAX_RESPONSE = 4
# Fine-refine Pallas kernel requires the fine-level planes resident in VMEM
# (~16 MB/core on v5e; headroom left for the accumulators). Dual-modality
# 640x480 planes are ~10.7 MB and fit; larger frames (e.g. 800x600 dual,
# ~16.7 MB) fall back to the XLA gather path — fine_refine checks this
# bound and scripts/dual_vmem_cliff.py commits the measured cost of both
# paths so the fallback is not a silent surprise.
FINE_PALLAS_VMEM_LIMIT = 12 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    width: int = 640
    height: int = 480
    t_fine: int = 2  # T at level 0 (2 color-only, 5 dual; src/HighLevelLinemod.cpp:32,40)
    t_coarse: int = 8  # T at level 1
    top_k: int = 512
    threshold: float = 80.0
    dual_modality: bool = False
    template_chunk: int = 256
    use_pallas: bool = False  # VMEM-resident Pallas coarse scan (TPU only)
    # NOTE on the removed MXU coarse engine (rounds 2-3): the dense scan as
    # one int8 im2col matmul beat the Pallas scan ~2x in isolation, but
    # (a) it lowered poorly fused into the frame program, (b) its one-hot
    # W was ~25 KB/template — 2.4 GB at the reference's configured 96k-
    # template regime — and (c) the production stream is transport-bound,
    # so its ~0.5 ms device saving never reached the frame rate. Deleted in
    # round 4 (VERDICT r3 item 4); see git history for the implementation.
    # TPU-optimized approximate top-k for the coarse candidate cut
    # (lax.approx_max_k, recall target 0.99). Off by default — the reference's
    # candidate cut is exact; opt in only where a real-TPU test has verified
    # the above-threshold match set is unchanged (tests/test_tpu_hw.py).
    approx_topk: bool = False
    # Guarded approx cut — an opt-in for SPARSE scenes. lax.approx_max_k
    # (fast, hardware-sampled) plus an on-device exactness guard: the count
    # of above-threshold entries in the approx result is compared with the
    # count in the full similarity; the approx result's above-threshold
    # entries are a sub-multiset of the full set, so count equality PROVES
    # every above-threshold candidate was captured, and a lax.cond falls
    # back to the exact blocked cut otherwise. 12x faster than the exact
    # cut when the scene has fewer than top_k coarse candidates (0.08 vs
    # 0.97 ms at 2048 templates on v5e). NOT the production default: real
    # cluttered scenes are dense at the coarse level (the fixture frame has
    # ~554k of 2.4M pairs >= 80 — T=8 spreading saturates the planes), the
    # guard then never passes, and the approx pass is pure overhead (~+9%).
    # Takes precedence over approx_topk/cut_block_rows.
    guarded_cut: bool = False
    # Large-bank streaming cut: scan the bank in chunks of this many
    # templates, merging a running exact top-K instead of materializing the
    # dense [N, G] similarity (at 96k templates that array alone is ~460 MB
    # and the Pallas tile output 1.6 GB). 0 = dense one-shot cut. The
    # streamed cut is exact: each chunk can contribute at most top_k
    # candidates, and tie order (sim desc, then global flat index asc) is
    # preserved because chunks arrive in ascending template order.
    scan_chunk: int = 0
    # Prefiltered exact cut for LARGE banks: phase 1 reduces the whole bank
    # to one masked-max score per template (a Pallas kernel that writes 4
    # bytes per template instead of the dense score tiles — ~1.6 GB/frame at
    # the reference's configured 96k-template regime); phase 2 rescans only
    # the top `prefilter_sel` templates by max and runs the exact cut there.
    # Exactness: every global top-K (template, cell) entry's template max is
    # >= the K-th global value v*, and v* >= theta (the prefilter's weakest
    # selected max) because the selected templates alone supply
    # prefilter_sel >= K values >= theta — so all contributing templates are
    # selected unless maxes TIE at theta beyond the selection budget. That
    # rare saturation (plus theta == v* >= threshold) is detected on device
    # and reported via the packed `cut_exact` flag; the host re-runs such
    # frames on the exact streaming cut (pipeline/pose_detection.py), the
    # same report-and-retry shape the sharded two-round cut uses
    # (parallel/sharded_match.py) — an in-program lax.cond fallback is a
    # scheduling barrier. 0 = off. Takes precedence over scan_chunk.
    prefilter_sel: int = 0
    # Blocked exact cut: batched per-block (this many templates per block)
    # value top-K, then a deterministic re-rank of the tiny merged set by
    # (sim desc, global flat index asc). Same top-K VALUES as the flat
    # lax.top_k — every global top-K entry is inside its block's top-K —
    # at a fraction of its cost on TPU, where a single huge top_k is
    # sort-bound. Which representatives of a >top_k-fold tie WITHIN one
    # block survive is lowering-dependent; such ties sit far below
    # threshold in practice and finalize_matches canonicalizes invalid
    # slots, so outputs stay deterministic. 0 = flat cut.
    cut_block_rows: int = 0


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["off_fine", "off_coarse", "nf_fine", "nf_coarse", "lim_coarse",
                 "off3_coarse", "off3_fine"],
    meta_fields=["cfg", "n_templates", "fine_shape", "coarse_shape",
                 "max_cells_fine", "max_cells_coarse"],
)
@dataclasses.dataclass
class MatchState:
    """Device-resident bank data in scan layout (a pytree: array leaves +
    static geometry metadata)."""

    cfg: MatchConfig
    n_templates: int
    off_fine: jax.Array  # [N, F_tot] int32 flat offsets into fine planes
    off_coarse: jax.Array  # [N, F_tot] int32 flat offsets into coarse planes
    nf_fine: jax.Array  # [N] int32 valid feature counts
    nf_coarse: jax.Array
    lim_coarse: jax.Array  # [N, 2] int32 (gy_lim, gx_lim) valid cell bounds
    off3_coarse: jax.Array  # [N, F, 3] int32 (plane, sy, sx) for the Pallas path
    off3_fine: jax.Array  # [N, F, 3] int32 fine-level triplets (Pallas fine refine)
    fine_shape: tuple  # (ch, cw, rows, stride)
    coarse_shape: tuple
    max_cells_fine: int
    max_cells_coarse: int


def _level_offsets(feats, valids, t, rows, stride, plane_base, zero_base):
    xs = feats[:, :, 0].astype(np.int64)
    ys = feats[:, :, 1].astype(np.int64)
    oris = feats[:, :, 2].astype(np.int64)
    off = feature_flat_offsets(xs, ys, oris, t, rows, stride) + plane_base
    return np.where(valids, off, zero_base).astype(np.int32)


def build_match_state(bank, cfg: MatchConfig) -> MatchState:
    """Precompute per-template flat plane offsets from a TemplateBank."""
    n = bank.num_templates
    # max template extent in grid cells at each level (static pad)
    bw = bank.bbox[:, 2]
    bh = bank.bbox[:, 3]
    mc_fine = int(np.ceil(max(bw.max(), bh.max()) / cfg.t_fine)) + 1
    mc_coarse = int(np.ceil(max(bw.max(), bh.max()) / 2 / cfg.t_coarse)) + 1

    fine = linear_plane_shape(cfg.height, cfg.width, cfg.t_fine, mc_fine)
    coarse = linear_plane_shape(cfg.height // 2, cfg.width // 2, cfg.t_coarse, mc_coarse)
    _, _, rows_f, stride_f = fine
    _, _, rows_c, stride_c = coarse
    plane_f = rows_f * stride_f
    plane_c = rows_c * stride_c
    n_planes_f = 8 * cfg.t_fine * cfg.t_fine
    n_planes_c = 8 * cfg.t_coarse * cfg.t_coarse
    n_mods = 2 if cfg.dual_modality else 1
    zero_f = n_mods * n_planes_f * plane_f
    zero_c = n_mods * n_planes_c * plane_c

    offs_f = [_level_offsets(bank.feat0, bank.valid0, cfg.t_fine, rows_f, stride_f, 0, zero_f)]
    offs_c = [_level_offsets(bank.feat1, bank.valid1, cfg.t_coarse, rows_c, stride_c, 0, zero_c)]
    nf_f = bank.valid0.sum(1)
    nf_c = bank.valid1.sum(1)
    if cfg.dual_modality:
        offs_f.append(
            _level_offsets(
                bank.nfeat0, bank.nvalid0, cfg.t_fine, rows_f, stride_f,
                n_planes_f * plane_f, zero_f,
            )
        )
        offs_c.append(
            _level_offsets(
                bank.nfeat1, bank.nvalid1, cfg.t_coarse, rows_c, stride_c,
                n_planes_c * plane_c, zero_c,
            )
        )
        nf_f = nf_f + bank.nvalid0.sum(1)
        nf_c = nf_c + bank.nvalid1.sum(1)
    # inert (padding) templates have zero features; clamp to avoid 0-division
    nf_f = np.maximum(nf_f, 1)
    nf_c = np.maximum(nf_c, 1)

    # coarse-cell bounds where the template still fits in the image
    ch, cw = coarse[0], coarse[1]
    gy_lim = ch - np.ceil(bh / 2 / cfg.t_coarse).astype(np.int64)
    gx_lim = cw - np.ceil(bw / 2 / cfg.t_coarse).astype(np.int64)

    # (plane, sy, sx) triplet form of the offsets for the Pallas kernels
    from .similarity_pallas import feature_plane_triplets

    trips = [feature_plane_triplets(bank.feat1, bank.valid1, cfg.t_coarse, n_mods * n_planes_c)]
    if cfg.dual_modality:
        tn = feature_plane_triplets(
            bank.nfeat1, bank.nvalid1, cfg.t_coarse, n_mods * n_planes_c
        )
        tn[:, :, 0] = np.where(
            bank.nvalid1, tn[:, :, 0] + n_planes_c, tn[:, :, 0]
        )
        trips.append(tn)
    off3 = np.concatenate(trips, axis=1)
    # fine-level triplets for the Pallas fine refine; in dual mode the
    # normal-modality features ride in the same table with their plane ids
    # offset past the color planes (mirroring the coarse table above)
    trips_f = [
        feature_plane_triplets(bank.feat0, bank.valid0, cfg.t_fine, n_mods * n_planes_f)
    ]
    if cfg.dual_modality:
        tnf = feature_plane_triplets(
            bank.nfeat0, bank.nvalid0, cfg.t_fine, n_mods * n_planes_f
        )
        tnf[:, :, 0] = np.where(
            bank.nvalid0, tnf[:, :, 0] + n_planes_f, tnf[:, :, 0]
        )
        trips_f.append(tnf)
    off3_f = np.concatenate(trips_f, axis=1)

    return MatchState(
        cfg=cfg,
        n_templates=n,
        off_fine=jnp.asarray(np.concatenate(offs_f, axis=1)),
        off_coarse=jnp.asarray(np.concatenate(offs_c, axis=1)),
        nf_fine=jnp.asarray(nf_f.astype(np.int32)),
        nf_coarse=jnp.asarray(nf_c.astype(np.int32)),
        lim_coarse=jnp.asarray(
            np.stack([gy_lim, gx_lim], axis=1).astype(np.int32)
        ),
        off3_coarse=jnp.asarray(off3),
        off3_fine=jnp.asarray(off3_f),
        fine_shape=fine,
        coarse_shape=coarse,
        max_cells_fine=mc_fine,
        max_cells_coarse=mc_coarse,
    )


def _planes_from_quant(quants, t, max_cells):
    """Linearized response planes [P(+1 zero), rows, stride] from one or more
    quantized one-hot orientation maps (one per modality); the trailing
    all-zero plane is where invalid-feature offsets point."""
    h, w = quants[0].shape
    hp = h - h % t
    wp = w - w % t
    _, _, rows, stride = linear_plane_shape(hp, wp, t, max_cells)
    planes = [
        linearized_response_planes(q[:hp, :wp], t, max_cells).reshape(
            -1, rows, stride
        )
        for q in quants
    ]
    planes.append(jnp.zeros((1, rows, stride), jnp.uint8))
    return jnp.concatenate(planes, axis=0)


def _planes_3d(color, depth, t, max_cells, dual):
    """Quantize one pyramid level and return its linearized planes."""
    quants = [quantize_color_gradients(color)[0]]
    if dual:
        quants.append(quantize_normals(depth)[0])
    return _planes_from_quant(quants, t, max_cells)


@jax.jit
def match_templates(state: MatchState, color: jax.Array, depth: jax.Array):
    """Full coarse-to-fine match of the whole bank against one frame.

    color: [H, W, 3] f32 0..255; depth: [H, W] f32 mm (ignored unless dual).
    Returns dict with per-candidate template_id, x, y (level-0 pixel coords of
    the bbox top-left), similarity (percent), valid — all [top_k], sorted by
    similarity descending.
    """
    cfg = state.cfg
    color1 = downsample2(color)
    depth1 = depth[::2, ::2]
    fine_planes = _planes_3d(
        color, depth, cfg.t_fine, state.max_cells_fine, cfg.dual_modality
    )
    coarse_planes = _planes_3d(
        color1, depth1, cfg.t_coarse, state.max_cells_coarse, cfg.dual_modality
    )
    return _match_with_planes(state, fine_planes, coarse_planes)


@jax.jit
def match_templates_quant(state: MatchState, quant0: jax.Array, quant1: jax.Array):
    """Match from precomputed quantized-orientation maps (color-only mode).

    quant0: [H, W] uint8 one-hot; quant1: [H/2, W/2] uint8 (the pyramid's
    second level, quantized on the 2x2-average downsample). Used by the
    host-quantize transport mode: on links where the host->device upload is
    the frame-rate ceiling, the host (native/quantize.cpp, bit-identical to
    ops/gradients.py) sends these 1-byte maps instead of the 3-byte color.
    """
    cfg = state.cfg
    fine_planes = _planes_from_quant([quant0], cfg.t_fine, state.max_cells_fine)
    coarse_planes = _planes_from_quant(
        [quant1], cfg.t_coarse, state.max_cells_coarse
    )
    return _match_with_planes(state, fine_planes, coarse_planes)


def coarse_similarity(state: MatchState, coarse_planes) -> jax.Array:
    """Dense masked coarse similarity of every template at every grid cell.

    Returns [N, G] f32 percent similarity, -1 where the template does not fit
    the image at that cell. N is the state's (possibly shard-local) template
    count. Engine per cfg: Pallas VMEM scan / XLA gather.
    """
    cfg = state.cfg
    coarse_flat = coarse_planes.reshape(-1)
    ch, cw, rows_c, stride_c = state.coarse_shape
    grid = (
        jnp.arange(ch, dtype=jnp.int32)[:, None] * stride_c
        + jnp.arange(cw, dtype=jnp.int32)[None, :]
    ).reshape(-1)  # [G]

    if cfg.use_pallas:
        from .similarity_pallas import coarse_scores_pallas

        tiles = coarse_scores_pallas(
            coarse_planes, state.off3_coarse, state.max_cells_coarse
        )
        scores = tiles[:, :ch, :cw].reshape(-1, ch * cw)
    else:

        def chunk_scores(off_chunk):
            idx = off_chunk[:, :, None] + grid[None, None, :]
            vals = coarse_flat[idx].astype(jnp.int32)  # [C, F, G]
            return vals.sum(axis=1)  # [C, G]

        # clamp so a tp shard smaller than the configured chunk still works,
        # and shrink to a divisor so a shard that is larger than the chunk
        # but not a multiple of it (e.g. 384 rows, chunk 256) still reshapes
        n_rows = state.off_coarse.shape[0]
        chunk = min(cfg.template_chunk, n_rows)
        if n_rows % chunk:
            chunk = max(d for d in range(chunk, 0, -1) if n_rows % d == 0)
        n_chunks = n_rows // chunk
        off_chunks = state.off_coarse.reshape(n_chunks, chunk, -1)
        scores = jax.lax.map(chunk_scores, off_chunks).reshape(-1, grid.shape[0])

    gy = jnp.broadcast_to(jnp.arange(ch, dtype=jnp.int32)[:, None], (ch, cw)).reshape(-1)
    gx = jnp.broadcast_to(jnp.arange(cw, dtype=jnp.int32)[None, :], (ch, cw)).reshape(-1)
    fits = (gy[None, :] < state.lim_coarse[:, 0:1]) & (
        gx[None, :] < state.lim_coarse[:, 1:2]
    )
    sim_c = (
        scores.astype(jnp.float32)
        * 100.0
        / (MAX_RESPONSE * state.nf_coarse[:, None].astype(jnp.float32))
    )
    return jnp.where(fits, sim_c, -1.0)


def rank_by_sim_then_index(sim: jax.Array, idx: jax.Array, top_k: int):
    """Deterministic (sim desc, index asc) top-K of a SMALL candidate set.

    One lexicographic lax.sort over the pair — exact composite ordering with
    no reliance on top_k tie stability. Returns (top_sim, top_idx)."""
    neg_sim, idx_sorted = jax.lax.sort((-sim, idx), num_keys=2)
    return -neg_sim[:top_k], idx_sorted[:top_k]


def candidate_cut(cfg: MatchConfig, sim_c: jax.Array, cw: int, top_k: int):
    """Static top-K (template, cell) candidates from dense coarse similarity.

    sim_c: [N, G]. Candidates rank by (sim desc, flat (template, cell) index
    asc), so a sharded per-shard cut + merge reproduces the single-device
    cut (shards own contiguous template ranges). With cut_block_rows the cut
    is decomposed into a batched per-block value top-K plus a deterministic
    re-rank of the merged survivors (see MatchConfig.cut_block_rows).
    Returns (top_sim, cand_t, cand_gy, cand_gx), each [top_k]."""
    n, n_cells = sim_c.shape
    rpb = cfg.cut_block_rows
    if rpb:
        # Adapt the block size to the row count: ~8 blocks is the measured
        # optimum at every shape tried on v5e (2048 rows -> rpb 256 and
        # 512-row tp shards -> rpb 64 both beat other splits;
        # scripts/profile_cut2.py + round-4 tuning), and the config value
        # caps it. Shrink to the largest divisor — the blocked path is a
        # pure optimization with identical results, so any block size is
        # legal, and divisor 1 degenerates to a per-row top-K (still exact).
        rpb = min(rpb, max(n // 8, 1))
        if n % rpb:
            rpb = max(d for d in range(rpb, 0, -1) if n % d == 0)
    def _exact_ranked():
        """Exact cut in canonical (sim desc, index asc) order — blocked
        decomposition when configured (a flat huge top_k is sort-bound on
        TPU), flat otherwise."""
        if rpb and n > rpb:
            nb = n // rpb
            blk = sim_c.reshape(nb, rpb * n_cells)
            s, li = jax.lax.top_k(blk, top_k)  # per-block value top-K
            gi = li.astype(jnp.int32) + (
                jnp.arange(nb, dtype=jnp.int32) * (rpb * n_cells)
            )[:, None]
            return rank_by_sim_then_index(s.reshape(-1), gi.reshape(-1), top_k)
        s, li = jax.lax.top_k(sim_c.reshape(-1), top_k)
        return rank_by_sim_then_index(s, li.astype(jnp.int32), top_k)

    if cfg.guarded_cut:
        # approx_max_k + exactness guard (see MatchConfig.guarded_cut): the
        # guard compares above-threshold counts — the approx result's
        # above-threshold entries are a sub-multiset of the dense ones, so
        # equality proves full capture; otherwise fall back to the exact cut.
        flat = sim_c.reshape(-1)
        thr = jnp.float32(cfg.threshold)
        a_total = jnp.sum((flat >= thr).astype(jnp.int32))
        s_a, i_a = jax.lax.approx_max_k(
            flat, top_k, recall_target=0.99, aggregate_to_topk=True
        )
        a_in = jnp.sum((s_a >= thr).astype(jnp.int32))
        # canonical (sim desc, index asc) order in both branches, so any
        # approx tie-selection cannot leak into the above-threshold prefix
        top_sim, top_idx = jax.lax.cond(
            a_in == a_total,
            lambda o: rank_by_sim_then_index(o[0], o[1].astype(jnp.int32), top_k),
            lambda o: _exact_ranked(),
            (s_a, i_a),
        )
    elif cfg.approx_topk:
        top_sim, top_idx = jax.lax.approx_max_k(
            sim_c.reshape(-1), top_k, recall_target=0.99, aggregate_to_topk=True
        )
    else:
        top_sim, top_idx = _exact_ranked()
    cand_t = (top_idx // n_cells).astype(jnp.int32)
    cand_g = (top_idx % n_cells).astype(jnp.int32)
    return top_sim, cand_t, cand_g // cw, cand_g % cw


def candidate_cut_streaming(state: MatchState, coarse_planes, top_k: int):
    """Exact top-K cut over the whole bank without the dense [N, G] array.

    lax.scan over template chunks: each chunk's dense similarity is reduced
    to its local top-K and merged into the running top-K. HBM high-water is
    O(chunk * G) instead of O(N * G). Returns the same
    (top_sim, cand_t, cand_gy, cand_gx) as candidate_cut."""
    cfg = state.cfg
    n = state.off_coarse.shape[0]
    chunk = min(cfg.scan_chunk, n)
    if n % chunk:
        # shrink to the largest divisor (cf. candidate_cut's block fallback):
        # shard sizes need not divide the configured chunk, e.g. a 24,576-row
        # bank on tp=4 gives 6,144-row shards with scan_chunk 4096
        chunk = max(d for d in range(chunk, 0, -1) if n % d == 0)
    cw = state.coarse_shape[1]
    n_cells = state.coarse_shape[0] * cw

    def body(carry, ci):
        run_sim, run_pos = carry
        t0 = ci * chunk

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, t0, chunk)

        sub = dataclasses.replace(
            state,
            off_coarse=sl(state.off_coarse),
            nf_coarse=sl(state.nf_coarse),
            lim_coarse=sl(state.lim_coarse),
            off3_coarse=sl(state.off3_coarse),
        )
        sim_c = coarse_similarity(sub, coarse_planes)  # [chunk, G]
        # per-chunk cut (blocked when cut_block_rows is set), then a
        # deterministic composite-key merge into the running top-K
        c_sim, ct, cgy, cgx = candidate_cut(cfg, sim_c, cw, top_k)
        c_pos = (ct + t0) * n_cells + cgy * cw + cgx
        cat_sim = jnp.concatenate([run_sim, c_sim])
        cat_pos = jnp.concatenate([run_pos, c_pos])
        m_sim, m_pos = rank_by_sim_then_index(cat_sim, cat_pos, top_k)
        return (m_sim, m_pos), None

    init = (
        jnp.full((top_k,), -jnp.inf, jnp.float32),
        jnp.zeros((top_k,), jnp.int32),
    )
    (top_sim, top_pos), _ = jax.lax.scan(
        body, init, jnp.arange(n // chunk, dtype=jnp.int32)
    )
    cand_t = (top_pos // n_cells).astype(jnp.int32)
    cand_g = (top_pos % n_cells).astype(jnp.int32)
    return top_sim, cand_t, cand_g // cw, cand_g % cw


def _template_maxes(state: MatchState, coarse_planes) -> jax.Array:
    """Per-template masked max percent similarity over all coarse cells.

    Returns [N] f32 (-1 where the template fits nowhere). Pallas engine
    writes one scalar per template (coarse_max_pallas); the fallback scans
    the bank in chunks and max-reduces each chunk's dense similarity."""
    cfg = state.cfg
    if cfg.use_pallas:
        from .similarity_pallas import coarse_max_pallas

        raw = coarse_max_pallas(
            coarse_planes, state.off3_coarse, state.lim_coarse,
            state.max_cells_coarse,
        )
        pct = (
            raw.astype(jnp.float32)
            * 100.0
            / (MAX_RESPONSE * state.nf_coarse.astype(jnp.float32))
        )
        return jnp.where(raw < 0, -1.0, pct)
    n = state.off_coarse.shape[0]
    chunk = min(cfg.scan_chunk or 1024, n)
    if n % chunk:
        chunk = max(d for d in range(chunk, 0, -1) if n % d == 0)

    def body(ci):
        t0 = ci * chunk

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, t0, chunk)

        sub = dataclasses.replace(
            state,
            off_coarse=sl(state.off_coarse),
            nf_coarse=sl(state.nf_coarse),
            lim_coarse=sl(state.lim_coarse),
            off3_coarse=sl(state.off3_coarse),
        )
        return coarse_similarity(sub, coarse_planes).max(axis=1)

    return jax.lax.map(
        body, jnp.arange(n // chunk, dtype=jnp.int32)
    ).reshape(-1)


def candidate_cut_prefilter(state: MatchState, coarse_planes, top_k: int):
    """Two-phase exact cut for large banks (see MatchConfig.prefilter_sel).

    Phase 1: per-template masked max similarity (tiny output — the dense
    [N, G] scores never materialize). Phase 2: gather the top `n_sel`
    templates by (max desc, template asc), rescan ONLY them densely, exact
    cut there. Returns (top_sim, cand_t, cand_gy, cand_gx, exact): `exact`
    is the on-device proof that the output equals the full dense cut —
    False only when template maxes tie at the selection boundary theta AND
    the K-th candidate value sits at theta above threshold (host retries
    those frames on the exact streaming cut)."""
    cfg = state.cfg
    n = state.off_coarse.shape[0]
    n_sel = min(max(cfg.prefilter_sel, top_k), n)
    cw = state.coarse_shape[1]

    m_pct = _template_maxes(state, coarse_planes)
    sel_sim, sel_idx = rank_by_sim_then_index(
        m_pct, jnp.arange(n, dtype=jnp.int32), n_sel
    )
    theta = sel_sim[n_sel - 1]
    saturated = jnp.sum((m_pct >= theta).astype(jnp.int32)) > n_sel
    # ascending template order: phase-2's local (sim desc, flat idx asc)
    # tie-ranking then coincides with the global composite order
    sel_sorted = jnp.sort(sel_idx)
    sub = dataclasses.replace(
        state,
        off_coarse=state.off_coarse[sel_sorted],
        nf_coarse=state.nf_coarse[sel_sorted],
        lim_coarse=state.lim_coarse[sel_sorted],
        off3_coarse=state.off3_coarse[sel_sorted],
    )
    sim_c = coarse_similarity(sub, coarse_planes)
    top_sim, ct, cand_gy, cand_gx = candidate_cut(cfg, sim_c, cw, top_k)
    cand_t = sel_sorted[ct]
    v_star = top_sim[top_k - 1]
    # v* >= theta always (the selected templates alone supply n_sel >= K
    # values >= theta). Strict inequality proves every possibly-contributing
    # template was selected; v* below threshold means boundary ties can only
    # shuffle candidates that finalize_matches discards anyway.
    exact = (
        (~saturated)
        | (v_star > theta)
        | (v_star < jnp.float32(cfg.threshold))
    )
    return top_sim, cand_t, cand_gy, cand_gx, exact


def fine_refine(state: MatchState, fine_planes, cand_t, cand_gy, cand_gx):
    """Refine candidates over the fine sub-cell window of their coarse cell.

    Uses only the state's fine-level fields (off_fine/off3_fine/nf_fine),
    which the sharded matcher replicates — cand_t must index THEM.
    Returns (sim, x, y), each [K]; x, y are level-0 bbox top-left pixels.

    One coarse cell spans 2*t_coarse level-0 px = (2*t_coarse)/t_fine fine
    cells — 8 exactly in color-only mode (16/2), 3.2 in dual mode (16/5).
    The window origin is therefore the *exact* fine-grid cell of the coarse
    cell's level-0 position, (gx*2*t_coarse)//t_fine (NOT gx*(16//5), which
    drifts ~1 px per coarse-cell index), and the window spans
    ceil(2*t_coarse/t_fine) cells so every level-0 position inside the
    coarse cell is reachable.
    """
    cfg = state.cfg
    _, _, rows_f, stride_f = state.fine_shape
    span = 2 * cfg.t_coarse  # level-0 px per coarse cell
    win = -(-span // cfg.t_fine)  # sub-cells per window (ceil)
    base_gy = (cand_gy * span) // cfg.t_fine
    base_gx = (cand_gx * span) // cfg.t_fine
    # The Pallas fine kernel computes an 8 x 128 score block per candidate,
    # so any window up to 8 sub-cells works (8 in color-only t_fine=2 mode,
    # 4 in dual t_fine=5 mode); the planes must fit VMEM (~16 MB/core on
    # v5e — dual fine planes are ~10.7 MB, color-only ~4.4 MB).
    planes_vmem_ok = (
        fine_planes.shape[0] * fine_planes.shape[1] * fine_planes.shape[2]
        <= FINE_PALLAS_VMEM_LIMIT
    )
    if cfg.use_pallas and win <= 8 and planes_vmem_ok:
        from .similarity_pallas import fine_scores_pallas

        base_yx = jnp.stack([base_gy, base_gx], axis=1)
        tiles_f = fine_scores_pallas(
            fine_planes, state.off3_fine, cand_t, base_yx
        )
        fine_scores = tiles_f[:, :win, :win].reshape(-1, win * win)
    else:
        fine_flat = fine_planes.reshape(-1)
        sub = (
            jnp.arange(win, dtype=jnp.int32)[:, None] * stride_f
            + jnp.arange(win, dtype=jnp.int32)[None, :]
        ).reshape(-1)  # [win^2]
        base = base_gy * stride_f + base_gx  # [K]
        pos = base[:, None] + sub[None, :]  # [K, S]
        offs = state.off_fine[cand_t]  # [K, F]
        idx = offs[:, :, None] + pos[:, None, :]
        fine_scores = fine_flat[idx].astype(jnp.int32).sum(axis=1)  # [K, S]
    best = jnp.argmax(fine_scores, axis=1)
    best_raw = jnp.take_along_axis(fine_scores, best[:, None], axis=1)[:, 0]
    sim = (
        best_raw.astype(jnp.float32)
        * 100.0
        / (MAX_RESPONSE * state.nf_fine[cand_t].astype(jnp.float32))
    )
    dy = best // win
    dx = best % win
    x = (base_gx + dx) * cfg.t_fine
    y = (base_gy + dy) * cfg.t_fine
    return sim, x, y


def finalize_matches(cfg: MatchConfig, cand_t, sim, x, y, top_sim):
    """Threshold + similarity-sort the refined candidates into the match dict.

    A match must beat the threshold at BOTH pyramid levels — cv::linemod's
    matchClass only refines lowest-resolution candidates that already score
    >= threshold there (the cascade the reference invokes at
    src/HighLevelLinemod.cpp:152) — so `top_sim` (the candidate's coarse
    score) is gated alongside the refined fine score. This also makes the
    output independent of which below-threshold filler candidates the cut
    happened to select (see MatchConfig.guarded_cut/cut_block_rows).

    Invalid slots are canonicalized to sentinels (id -1, x/y 0, sim -1) so
    the output is bit-deterministic."""
    valid = (sim >= cfg.threshold) & (top_sim >= cfg.threshold)
    order = jnp.argsort(-jnp.where(valid, sim, -1.0))
    v = valid[order]
    return {
        "template_id": jnp.where(v, cand_t[order], -1),
        "x": jnp.where(v, x[order], 0),
        "y": jnp.where(v, y[order], 0),
        "similarity": jnp.where(v, sim[order], -1.0),
        "valid": v,
    }


def _match_with_planes(state: MatchState, fine_planes, coarse_planes):
    cfg = state.cfg
    cw = state.coarse_shape[1]
    cut_exact = None
    if cfg.prefilter_sel and state.off_coarse.shape[0] > max(
        cfg.prefilter_sel, cfg.top_k
    ):
        top_sim, cand_t, cand_gy, cand_gx, cut_exact = candidate_cut_prefilter(
            state, coarse_planes, cfg.top_k
        )
    elif cfg.scan_chunk and state.off_coarse.shape[0] > cfg.scan_chunk:
        top_sim, cand_t, cand_gy, cand_gx = candidate_cut_streaming(
            state, coarse_planes, cfg.top_k
        )
    else:
        sim_c = coarse_similarity(state, coarse_planes)
        top_sim, cand_t, cand_gy, cand_gx = candidate_cut(cfg, sim_c, cw, cfg.top_k)
    sim, x, y = fine_refine(state, fine_planes, cand_t, cand_gy, cand_gx)
    out = finalize_matches(cfg, cand_t, sim, x, y, top_sim)
    if cut_exact is not None:
        # exactness proof of the prefiltered cut; packed as an extra row by
        # detect_core so the host can retry rare saturated frames
        out["cut_exact"] = cut_exact
    return out
