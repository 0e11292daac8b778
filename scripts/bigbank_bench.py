"""Full-scale bank regime: generation + matching at the reference's real
configured shape.

The reference's settings build up to 642 icosphere views x 15 radii x 10
in-plane rotations ~= 96k templates for a NON-symmetric model
(/root/reference/linemod_settings.yml:21-27); the committed fixture is
rotationally symmetric so round 2 only ever exercised 1,950. This script
measures, on the real chip:

1. generation wall time + throughput for the fixture mesh with symmetry
   pruning disabled at a given subdivision level;
2. bank size on disk and match-state HBM footprint;
3. single-chip match latency/fps at the big-bank shape, using the streaming
   candidate cut (ops/matching.py:candidate_cut_streaming) so HBM high-water
   stays O(scan_chunk x G);
4. modeled tp strong scaling at that shape (same methodology as
   scripts/scaling_bench.py: per-device compute measured on the real chip at
   shard sizes + ICI comm model).

Writes BANK_SCALE.json. Usage: python scripts/bigbank_bench.py [--subdiv 2]
(subdiv 2 = 162 views -> 24,300 templates; subdiv 3 = 642 -> 96,300).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from linemod_tpu.config import CameraParameters, ModelProperties, TemplateSettings, load_settings
from linemod_tpu.models.template_bank import TemplateBank, build_template_bank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates
from linemod_tpu.ops.extract import downsample2
from linemod_tpu.ops.gradients import quantize_color_gradients
from linemod_tpu.ops.matching import (
    candidate_cut_streaming,
    coarse_similarity,
    candidate_cut,
    fine_refine,
    finalize_matches,
)
from linemod_tpu.ops.spread import linearized_response_planes_band
from linemod_tpu.pipeline.pose_detection import _pad_bank
from linemod_tpu.utils.ply import load_ply

K_REPEAT = 50
TOP_K = 512
SCAN_CHUNK = 4096
PREFILTER_SEL = 1024
ICI_BW = 40e9
ICI_LAT = 2e-6


def device_time(body, *examples):
    @jax.jit
    def run(*xs):
        def step(acc, i):
            return acc + body(i, *xs), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K_REPEAT))[0]

    np.asarray(run(*examples))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*examples))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_REPEAT


def state_hbm_bytes(state) -> int:
    total = 0
    for f in ("off_fine", "off_coarse", "nf_fine", "nf_coarse", "lim_coarse",
              "off3_coarse", "off3_fine"):
        a = getattr(state, f)
        total += a.size * a.dtype.itemsize
    return total


def run_subdiv(subdiv: int, bank_cache: str, dual: bool = False):
    cam, base = load_settings(os.path.join(REPO, "example", "linemod_settings.yml"))
    settings = TemplateSettings(
        **{**base.__dict__, "subdivisions": subdiv,
           "only_color_modality": not dual}
    )
    # NON-symmetric: full icosphere, no pruning (the reference's configured
    # regime for an asymmetric part)
    props = ModelProperties(
        lower_color_range=(0, 0, 50), upper_color_range=(255, 255, 255),
        rotationally_symmetrical=False, planes_of_symmetry=(0.0, 0.0, 0.0),
    )
    mesh = load_ply(os.path.join(REPO, "example", "models", "lagergehaeuse.ply"))

    if os.path.exists(bank_cache):
        bank = TemplateBank.load(bank_cache)
        gen_s = None
        print(f"loaded cached bank: {bank.num_templates} templates")
    else:
        t0 = time.time()
        bank = build_template_bank(mesh, "bigbank", cam, settings, props)
        gen_s = time.time() - t0
        bank.save(bank_cache)
        print(
            f"generated {bank.num_templates} templates in {gen_s:.1f} s "
            f"({bank.num_templates / gen_s:.1f} templates/s)"
        )
    n = bank.num_templates
    disk_mb = os.path.getsize(bank_cache) / 1e6

    use_pallas = jax.default_backend() == "tpu"
    cfg = MatchConfig(
        width=cam.width, height=cam.height, top_k=TOP_K,
        template_chunk=256, use_pallas=use_pallas, cut_block_rows=256,
        scan_chunk=SCAN_CHUNK, prefilter_sel=PREFILTER_SEL,
        dual_modality=bank.dual_modality,
        t_fine=5 if bank.dual_modality else 2,
    )
    padded = _pad_bank(bank, SCAN_CHUNK)
    state = build_match_state(padded, cfg)
    hbm_mb = state_hbm_bytes(state) / 1e6
    n_pad = padded.num_templates if hasattr(padded, "num_templates") else state.off_coarse.shape[0]

    ovh = device_time(lambda i, x: x * i.astype(jnp.float32), jnp.float32(1.0))
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (cam.height, cam.width, 3)).astype(np.float32))
    depth = jnp.zeros((cam.height, cam.width), jnp.float32)

    t1 = device_time(
        lambda i, c, d: match_templates(state, c + i.astype(jnp.float32), d)[
            "similarity"
        ].sum(), color, depth,
    ) - ovh
    print(f"single-chip match: {t1 * 1e3:.2f} ms/frame ({1.0 / t1:.1f} fps device-side)")

    # --- modeled tp scaling at this shape: the DISTRIBUTED PREFILTERED cut
    # (parallel/sharded_match.py prefilter branch) — phase-1 per-template
    # maxes over this shard's N/tp templates, replicated selection over the
    # gathered [N] maxes, phase-2 rescan + exact cut of the n_sel/tp
    # selected slice, exact K-merge ---
    pf_sh, pc_sh = state.fine_shape, state.coarse_shape
    rows_f, stride_f = pf_sh[2], pf_sh[3]
    rows_c, stride_c = pc_sh[2], pc_sh[3]
    n_mods = 2 if cfg.dual_modality else 1
    planes_bytes = n_mods * (
        (8 * cfg.t_fine ** 2) * rows_f * stride_f
        + (8 * cfg.t_coarse ** 2) * rows_c * stride_c
    )
    cw = pc_sh[1]
    n_total = state.off_coarse.shape[0]
    scaling = []
    for tp in (4, 8):
        import dataclasses as dc

        from linemod_tpu.ops.matching import (
            _template_maxes,
            rank_by_sim_then_index,
        )
        from linemod_tpu.ops.normals import quantize_normals

        n_shard = n_total // tp
        k_slice = TOP_K // tp
        s_slice = min(PREFILTER_SEL, n_total) // tp

        def per_device(i, c, d, _tp=tp, _k=k_slice, _s=s_slice,
                       _full=state, _cfg=cfg, _n_shard=n_shard):
            c = c + i.astype(jnp.float32)
            mods0 = [(c, quantize_color_gradients)]
            mods1 = [(downsample2(c), quantize_color_gradients)]
            if _cfg.dual_modality:
                mods0.append((d, quantize_normals))
                mods1.append((d[::2, ::2], quantize_normals))
            fbs = [
                linearized_response_planes_band(
                    fn(img)[0], _cfg.t_fine, _full.max_cells_fine, 0, _tp
                ).reshape(-1, rows_f // _tp, stride_f)
                for img, fn in mods0
            ]
            cbs = [
                linearized_response_planes_band(
                    fn(img)[0], _cfg.t_coarse, _full.max_cells_coarse, 0, _tp
                ).reshape(-1, rows_c // _tp, stride_c)
                for img, fn in mods1
            ]
            # zero plane rides along as a zero band (mirrors _gathered_planes_band)
            fbz = jnp.concatenate(
                fbs + [jnp.zeros((1, rows_f // _tp, stride_f), jnp.uint8)], 0)
            cbz = jnp.concatenate(
                cbs + [jnp.zeros((1, rows_c // _tp, stride_c), jnp.uint8)], 0)
            fine_planes = jnp.tile(fbz, (1, _tp, 1))
            coarse_planes = jnp.tile(cbz, (1, _tp, 1))
            n_cells = _full.coarse_shape[0] * cw
            # phase 1: per-template maxes over my shard range
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, 0, _n_shard)
            local = dc.replace(
                _full, off_coarse=sl(_full.off_coarse),
                nf_coarse=sl(_full.nf_coarse),
                lim_coarse=sl(_full.lim_coarse),
                off3_coarse=sl(_full.off3_coarse),
            )
            m_local = _template_maxes(local, coarse_planes)
            g_max = jnp.tile(m_local, _tp)  # stands in for the all_gather
            n_sel = _s * _tp
            sel_sim, sel_idx = rank_by_sim_then_index(
                g_max, jnp.arange(n_total, dtype=jnp.int32), n_sel
            )
            theta = sel_sim[n_sel - 1]
            saturated = jnp.sum((g_max >= theta).astype(jnp.int32)) > n_sel
            sel_sorted = jnp.sort(sel_idx)
            my_sel = jax.lax.dynamic_slice_in_dim(sel_sorted, 0, _s)
            sub = dc.replace(
                _full, off_coarse=_full.off_coarse[my_sel],
                nf_coarse=_full.nf_coarse[my_sel],
                lim_coarse=_full.lim_coarse[my_sel],
                off3_coarse=_full.off3_coarse[my_sel],
            )
            sim_sel = coarse_similarity(sub, coarse_planes)
            l_sim, lt, lgy, lgx = candidate_cut(_cfg, sim_sel, cw, TOP_K)
            g_t = my_sel[lt]
            g_sim = jnp.tile(l_sim, _tp) - jnp.repeat(
                jnp.arange(_tp, dtype=jnp.float32) * 1e-3, TOP_K
            )
            g_flat = jnp.tile(g_t * n_cells + lgy * cw + lgx, _tp)
            m_sim, m_flat = rank_by_sim_then_index(g_sim, g_flat, TOP_K)
            v_star = m_sim[TOP_K - 1]
            cut_exact = (
                (~saturated) | (v_star > theta)
                | (v_star < jnp.float32(_cfg.threshold))
            )
            m_t = m_flat // n_cells
            m_gy = (m_flat % n_cells) // cw
            m_gx = m_flat % cw
            f_sim, f_x, f_y = fine_refine(
                _full, fine_planes, m_t[:_k], m_gy[:_k], m_gx[:_k]
            )
            out = finalize_matches(
                _cfg, m_t, jnp.tile(f_sim, _tp), jnp.tile(f_x, _tp),
                jnp.tile(f_y, _tp), m_sim)
            return out["similarity"].sum() + cut_exact.astype(jnp.float32)

        t_dev = device_time(per_device, color, depth) - ovh
        comm = (
            4 * ICI_LAT
            + (tp - 1) / tp * planes_bytes / ICI_BW
            + (tp - 1) / tp * n_total * 4 / ICI_BW  # maxes all_gather
            + (tp - 1) * 2 * TOP_K * 4 / ICI_BW
            + (tp - 1) * 3 * k_slice * 4 / ICI_BW
        )
        t_tp = t_dev + comm
        eff = t1 / (tp * t_tp)
        scaling.append({
            "tp": tp, "per_device_compute_ms": t_dev * 1e3,
            "modeled_comm_ms": comm * 1e3, "ms_per_frame": t_tp * 1e3,
            "efficiency_pct": 100 * eff,
        })
        print(f"tp={tp}: {t_tp*1e3:.2f} ms/frame, efficiency {100*eff:.1f}%")

    return {
        "subdiv": subdiv,
        "dual_modality": dual,
        "n_templates": n,
        "generation_seconds": gen_s,
        "templates_per_second": (n / gen_s) if gen_s else None,
        "bank_disk_mb": disk_mb,
        "match_state_hbm_mb": hbm_mb,
        "single_chip_ms_per_frame": t1 * 1e3,
        "single_chip_fps": 1.0 / t1,
        "scan_chunk": SCAN_CHUNK,
        "strong_scaling": scaling,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivs", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--dual", action="store_true",
                    help="dual-modality (ColorGradient+DepthNormal) bank")
    args = ap.parse_args()

    path = os.path.join(REPO, "BANK_SCALE.json")
    results = {"note": (
        "reference configured regime (linemod_settings.yml:21-27 + "
        "src/CameraViewPoints.cpp:26): 15 radii x icosphere views x 10 "
        "in-plane, symmetry pruning off. subdiv 2 = 162 views -> 24,300 "
        "templates; subdiv 3 = 642 -> 96,300. Efficiency numbers are "
        "measured-per-chip compute (one real v5e chip) + ICI comm model."
    ), "configs": []}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if isinstance(old, dict) and "configs" in old:
            results = old
    for s in args.subdivs:
        tag = "_dual" if args.dual else ""
        cache = os.path.join(REPO, f".bigbank_cache{tag}_s{s}.npz")
        r = run_subdiv(s, cache, dual=args.dual)
        if r["generation_seconds"] is None:
            # cached bank: keep the original measured generation numbers
            for c in results["configs"]:
                if (c["subdiv"] == s
                        and bool(c.get("dual_modality")) == args.dual
                        and c.get("generation_seconds")):
                    r["generation_seconds"] = c["generation_seconds"]
                    r["templates_per_second"] = c["templates_per_second"]
        results["configs"] = [
            c for c in results["configs"]
            if not (c["subdiv"] == s
                    and bool(c.get("dual_modality")) == args.dual)
        ] + [r]
        results["configs"].sort(
            key=lambda c: (bool(c.get("dual_modality")), c["subdiv"])
        )
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {path} (subdiv {s}{tag})")


if __name__ == "__main__":
    main()
