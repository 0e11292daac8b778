"""Template-bank-sharded matching over a device mesh.

Design (SURVEY §7, revised round 3): every per-frame stage is either sharded
or provably cheap, so scaling is no longer capped by replicated precompute
(the round-2 design recomputed the response planes on every device — ~2 ms
of fixed cost per frame per device):

1. response-plane precompute: band-sharded — device i computes grid rows
   [i*rows/tp, (i+1)*rows/tp) of every (modality, orientation, sub-cell)
   plane — quantize included — (ops/spread.py:band_planes_from_image), one tiled
   all_gather reassembles the exact full planes on each device (a few MB on
   ICI). The quantize+spread prefix is replicated — it is tens of
   microseconds on a v5e.
2. coarse scan: template-sharded (the dominant, perfectly-parallel cost).
3. candidate cut: two-round distributed exact top-K — per-shard top-m
   (m = max(2K/tp, 256)), one tiny all_gather, replicated merge, and a
   per-frame saturation PROOF that the union contains the exact top-K
   (every shard's m-th value strictly below the merged K-th). Rare failures
   are reported via the `cut_exact` output and re-run on an exact_only
   matcher by the host (sharded_detect) — an in-program lax.cond fallback
   is a scheduling barrier that costs more than the fast path saves.
   Ties resolve by global flat (template, cell) index in both the sharded
   and single-device paths, so the merged candidate list is bit-identical
   to the single-device cut.
4. fine refine: the K global candidates are split into static K/tp slices —
   any device can refine any candidate because the fine-level feature
   tables (off_fine/off3_fine/nf_fine, ~0.5 MB) are REPLICATED, unlike the
   sharded coarse tables. One all_gather of [K/tp] results reassembles.
5. threshold + sort: replicated on the merged [K] arrays (identical on
   every device).

Frames batch over the "dp" axis (`lax.map` within a device's local batch);
templates/bands shard over "tp". Output is bit-identical to
ops/matching.py's single-device path (tests/test_parallel.py asserts this
at tp in {2, 4, 8}, for both the two-round fast path and the saturated
host-retry path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.extract import downsample2
from ..ops.gradients import quantize_color_gradients
from ..ops.matching import (
    MatchState,
    _template_maxes,
    candidate_cut,
    candidate_cut_streaming,
    coarse_similarity,
    finalize_matches,
    fine_refine,
    rank_by_sim_then_index,
)
from ..ops.normals import quantize_normals
from ..ops.spread import band_planes_from_image


def place_global(x, mesh: Mesh, spec: P):
    """Place a host-local array as a global sharded array on `mesh`.

    Works in both single-process and multi-host (multi-controller) runs:
    every process materializes its addressable shards from the full host
    copy via jax.make_array_from_callback (device_put cannot target
    non-addressable devices)."""
    import numpy as np

    arr = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_state(state: MatchState, mesh: Mesh) -> MatchState:
    """Place the coarse per-template arrays on the tp axis; fine-level
    tables replicate (they are small and let any device refine any
    candidate). Multi-host safe (see place_global).

    With the prefiltered cut configured (cfg.prefilter_sel) the coarse
    tables replicate as well: phase 2 reshards by SELECTED-template slices,
    so any device must be able to gather any template's coarse rows
    locally. The tables are the bank's compact feature form (~100 MB at the
    96k-template regime) — replicating them trades a little HBM for a cut
    whose per-device cost actually shrinks with tp."""

    def tp(x):
        return place_global(x, mesh, P("tp"))

    def rep(x):
        return place_global(x, mesh, P())

    coarse = rep if state.cfg.prefilter_sel else tp
    return MatchState(
        cfg=state.cfg,
        n_templates=state.n_templates,
        off_fine=rep(state.off_fine),
        off_coarse=coarse(state.off_coarse),
        nf_fine=rep(state.nf_fine),
        nf_coarse=coarse(state.nf_coarse),
        lim_coarse=coarse(state.lim_coarse),
        off3_coarse=coarse(state.off3_coarse),
        off3_fine=rep(state.off3_fine),
        fine_shape=state.fine_shape,
        coarse_shape=state.coarse_shape,
        max_cells_fine=state.max_cells_fine,
        max_cells_coarse=state.max_cells_coarse,
    )


def _gathered_planes_band(modalities, t, max_cells, n_bands, shape):
    """Compute this device's band of the linearized planes for each modality
    (quantize included — band-sharded end to end) and all_gather the full
    planes (zero plane appended), inside a shard_map body.

    modalities: [(image, quantize_fn), ...]."""
    band = jax.lax.axis_index("tp")
    _, _, rows, stride = shape
    parts = [
        band_planes_from_image(img, t, max_cells, band, n_bands, fn).reshape(
            -1, rows // n_bands, stride
        )
        for img, fn in modalities
    ]
    # the zero plane rides along as a zero band: its bands gather back into a
    # full zero plane, so the gather's output IS the final [P+1] plane stack —
    # no post-gather full-size concat copy (a few MB of HBM traffic saved)
    zero = jnp.zeros((1, rows // n_bands, stride), jnp.uint8)
    local = jnp.concatenate(parts + [zero], axis=0)  # [P+1, rows/tp, stride]
    return jax.lax.all_gather(local, "tp", axis=1, tiled=True)


def make_sharded_matcher(state: MatchState, mesh: Mesh, exact_only: bool = False):
    """Build a jitted sharded matcher: (color [B, H, W, 3], depth [B, H, W])
    -> match dict with leading batch axis + `cut_exact` [B] bool. B must be
    a multiple of the dp axis size. Template ids returned are global.

    With exact_only=False (default) the candidate cut uses the fast
    two-round distributed top-K whose exactness proof is reported per frame
    in `cut_exact`; a frame flagged False must be re-run on an
    exact_only=True matcher (see sharded_detect) — outputs for frames
    flagged True are bit-identical to the single-device path."""
    tp = mesh.shape["tp"]
    n_total = state.off_coarse.shape[0]
    n_shard = n_total // tp
    cfg = state.cfg
    prefilter = bool(cfg.prefilter_sel)
    if cfg.top_k % tp:
        raise ValueError(f"top_k {cfg.top_k} must be a multiple of tp {tp}")
    k_slice = cfg.top_k // tp

    def local_match(
        off_f, off_c, nf_f, nf_c, lim, off3, off3f, color, depth
    ):
        shard_idx = jax.lax.axis_index("tp")
        if prefilter:
            # coarse tables arrive REPLICATED (shard_state): phase 1 scans
            # this shard's contiguous template range
            t0 = shard_idx * n_shard

            def slc(a):
                return jax.lax.dynamic_slice_in_dim(a, t0, n_shard)

            loc = (slc(off_c), slc(nf_c), slc(lim), slc(off3))
        else:
            loc = (off_c, nf_c, lim, off3)

        def sub_state(oc, nc, lm, o3):
            return MatchState(
                cfg=cfg,
                n_templates=oc.shape[0],
                off_fine=off_f,
                off_coarse=oc,
                nf_fine=nf_f,
                nf_coarse=nc,
                lim_coarse=lm,
                off3_coarse=o3,
                off3_fine=off3f,
                fine_shape=state.fine_shape,
                coarse_shape=state.coarse_shape,
                max_cells_fine=state.max_cells_fine,
                max_cells_coarse=state.max_cells_coarse,
            )

        # shard-local coarse state + replicated fine tables
        local = sub_state(*loc)

        def one_frame(c, d):
            # 1. band-sharded planes precompute (quantize included) +
            # reassembly; the fine-planes gather is independent of the coarse
            # scan, so XLA's latency-hiding scheduler overlaps it with the
            # scan compute
            c1 = downsample2(c)
            mods0 = [(c, quantize_color_gradients)]
            mods1 = [(c1, quantize_color_gradients)]
            if cfg.dual_modality:
                mods0.append((d, quantize_normals))
                mods1.append((d[::2, ::2], quantize_normals))
            fine_planes = _gathered_planes_band(
                mods0, cfg.t_fine, state.max_cells_fine, tp, state.fine_shape
            )
            coarse_planes = _gathered_planes_band(
                mods1, cfg.t_coarse, state.max_cells_coarse, tp,
                state.coarse_shape,
            )

            # 2-3. template-sharded coarse scan + distributed exact top-K.
            # The local cut's lax.top_k cost is LINEAR in k on TPU, so a
            # shard cutting the full K=top_k locally is the piece that
            # refuses to strong-scale (k cannot shrink with tp: one shard
            # may own the whole global top-K). The TWO-ROUND protocol fixes
            # the common case: round 1 cuts a small local top-m
            # (m = max(2*top_k/tp, 256) — sized so real workloads pass; the
            # fixture passes at tp=4/8), merges the union, and PROVES
            # exactness when every shard's m-th value is strictly below the
            # merged K-th value tau: every entry a shard dropped is then
            # strictly below the true K-th value, so the union contains the
            # exact top-K. Saturation (some shard's m-th >= tau) is
            # reported via the `cut_exact` output instead of an in-program
            # fallback — a lax.cond here acts as a scheduling barrier that
            # was measured to erase the entire fast-path win — and the HOST
            # re-runs the frame on the exact_only matcher (sharded_detect
            # below). With exact_only=True the cut is the single-round
            # full-K local cut and `cut_exact` is constant True.
            cw = state.coarse_shape[1]
            n_cells = state.coarse_shape[0] * cw

            def cut_merge(k_local):
                if cfg.scan_chunk and n_shard > cfg.scan_chunk:
                    # big-bank shard: the exact cut streams template chunks
                    # so the dense [n_shard, G] never materializes
                    # (ops/matching.candidate_cut_streaming) — the sharded x
                    # streaming composition
                    top_sim, cand_t, cand_gy, cand_gx = (
                        candidate_cut_streaming(local, coarse_planes, k_local)
                    )
                else:
                    sim_c = coarse_similarity(local, coarse_planes)
                    top_sim, cand_t, cand_gy, cand_gx = candidate_cut(
                        cfg, sim_c, cw, k_local
                    )
                ct = cand_t + shard_idx * n_shard  # globalize
                g_sim = jax.lax.all_gather(top_sim, "tp", tiled=True)
                g_flat = jax.lax.all_gather(
                    ct * n_cells + cand_gy * cw + cand_gx, "tp", tiled=True
                )
                # replicated deterministic merge: rank by (sim desc, global
                # flat (template, cell) index asc) — the same composite
                # order the single-device cut uses
                m_sim, m_flat = rank_by_sim_then_index(g_sim, g_flat, cfg.top_k)
                return top_sim, m_sim, m_flat

            # tp >= 8 gate: at tp=4 a measured in-program A/B (round 4)
            # shows the k=256 local cut scheduling WORSE than the k=512 one
            # inside the fused frame program (1.53 vs 1.33 ms per device)
            # despite being 2x cheaper in isolation — XLA overlaps the big
            # top_k better. The two-round protocol pays off from tp=8
            # (0.72 vs 0.79 ms per device).
            m_small = min(cfg.top_k, max(2 * k_slice, 256))
            if prefilter and not exact_only:
                # DISTRIBUTED PREFILTERED CUT (mirrors ops/matching.py
                # candidate_cut_prefilter): phase 1 — each shard reduces its
                # template range to per-template maxes (the perfectly-
                # parallel bulk of the cut; its output is N floats, so the
                # all_gather is microseconds); a replicated tiny selection
                # picks the top n_sel templates; phase 2 — the SELECTED set
                # reshards into static n_sel/tp slices (any shard can gather
                # any template's rows from the replicated coarse tables),
                # each shard rescans + cuts its slice, and the K-candidate
                # merge reassembles the exact global cut. Unlike the local
                # full-K cut, per-shard cut cost shrinks with tp (the slice
                # is n_sel/tp rows), which is what clears the tp=4
                # efficiency cell at small bank shapes. Exactness proof ==
                # the single-device prefilter's (theta/v*/threshold),
                # reported via cut_exact with the same host retry.
                m_local = _template_maxes(local, coarse_planes)
                g_max = jax.lax.all_gather(m_local, "tp", tiled=True)
                n_sel = (
                    min(max(cfg.prefilter_sel, cfg.top_k), n_total) // tp
                ) * tp
                sel_sim, sel_idx = rank_by_sim_then_index(
                    g_max, jnp.arange(n_total, dtype=jnp.int32), n_sel
                )
                theta = sel_sim[n_sel - 1]
                saturated = (
                    jnp.sum((g_max >= theta).astype(jnp.int32)) > n_sel
                )
                sel_sorted = jnp.sort(sel_idx)
                s_slice = n_sel // tp
                my_sel = jax.lax.dynamic_slice_in_dim(
                    sel_sorted, shard_idx * s_slice, s_slice
                )
                sub = sub_state(
                    off_c[my_sel], nf_c[my_sel], lim[my_sel], off3[my_sel]
                )
                sim_sel = coarse_similarity(sub, coarse_planes)
                l_sim, lt, lgy, lgx = candidate_cut(
                    cfg, sim_sel, cw, cfg.top_k
                )
                g_t = my_sel[lt]
                g_sim = jax.lax.all_gather(l_sim, "tp", tiled=True)
                g_flat = jax.lax.all_gather(
                    g_t * n_cells + lgy * cw + lgx, "tp", tiled=True
                )
                m_sim, m_flat = rank_by_sim_then_index(
                    g_sim, g_flat, cfg.top_k
                )
                v_star = m_sim[cfg.top_k - 1]
                cut_exact = (
                    (~saturated)
                    | (v_star > theta)
                    | (v_star < jnp.float32(cfg.threshold))
                )
            elif m_small < cfg.top_k and tp >= 8 and not exact_only:
                l_sim, m_sim, m_flat = cut_merge(m_small)
                tau = m_sim[cfg.top_k - 1]
                lasts = jax.lax.all_gather(
                    l_sim[m_small - 1 : m_small], "tp", tiled=True
                )
                cut_exact = jnp.all(lasts < tau)
            else:
                _, m_sim, m_flat = cut_merge(cfg.top_k)
                cut_exact = jnp.bool_(True)
            m_t = m_flat // n_cells
            m_g = m_flat % n_cells
            m_gy = m_g // cw
            m_gx = m_g % cw

            # 4. fine refine of a static K/tp slice (fine tables replicated)
            s0 = shard_idx * k_slice
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, k_slice)
            f_sim, f_x, f_y = fine_refine(
                local, fine_planes, sl(m_t), sl(m_gy), sl(m_gx)
            )
            sim = jax.lax.all_gather(f_sim, "tp", tiled=True)
            x = jax.lax.all_gather(f_x, "tp", tiled=True)
            y = jax.lax.all_gather(f_y, "tp", tiled=True)

            # 5. replicated threshold + sort
            out = finalize_matches(cfg, m_t, sim, x, y, m_sim)
            out["cut_exact"] = cut_exact
            return out

        # lax.map, not vmap: the guarded cut's exactness fallback is a
        # lax.cond, which vmap would lower to a select that executes BOTH
        # branches every frame; map keeps it a real rare branch. Frames are
        # processed sequentially either way (dp shards frames across
        # devices; the local batch is almost always 1).
        return jax.lax.map(lambda cd: one_frame(cd[0], cd[1]), (color, depth))

    cspec = P() if prefilter else P("tp")  # see shard_state
    args_specs = (
        P(),     # off_fine (replicated)
        cspec,   # off_coarse
        P(),     # nf_fine
        cspec,   # nf_coarse
        cspec,   # lim_coarse
        cspec,   # off3_coarse
        P(),     # off3_fine
        P("dp"),  # color
        P("dp"),  # depth
    )

    mapped = shard_map(
        local_match,
        mesh=mesh,
        in_specs=args_specs,
        out_specs=P("dp"),
        check_vma=False,  # outputs are tp-replicated after the final gather
    )

    @jax.jit
    def matcher(color, depth):
        args = [
            state.off_fine,
            state.off_coarse,
            state.nf_fine,
            state.nf_coarse,
            state.lim_coarse,
            state.off3_coarse,
            state.off3_fine,
        ]
        return mapped(*args, color, depth)

    return matcher


def sharded_detect(matcher_fast, matcher_exact, color, depth):
    """Serve one batch through the two-round sharded matcher with the
    host-side exactness retry.

    matcher_fast / matcher_exact: matchers from make_sharded_matcher with
    exact_only False / True for the same state+mesh. When any frame's
    two-round saturation proof fails (`cut_exact` False — in practice only
    when one shard owns nearly the whole global top-K), the batch re-runs on
    the exact single-round matcher. The retry lives on the HOST because an
    in-program lax.cond fallback acts as a scheduling barrier that was
    measured to cost more than the two-round cut saves."""
    import numpy as np

    out = matcher_fast(color, depth)
    if bool(np.all(np.asarray(out["cut_exact"]))):
        return out
    return matcher_exact(color, depth)
