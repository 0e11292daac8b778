"""Stage-by-stage timing of the tp=4 per-device sharded-match program on the
real chip — finds the fixed (non-sharded) cost that caps strong-scaling
efficiency. Throwaway diagnostic for tuning scripts/scaling_bench.py."""

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

from linemod_tpu.models.template_bank import make_synthetic_bank
from linemod_tpu.ops.extract import downsample2
from linemod_tpu.ops.gradients import quantize_color_gradients
from linemod_tpu.ops.matching import (
    MatchConfig,
    build_match_state,
    candidate_cut,
    coarse_similarity,
    finalize_matches,
    fine_refine,
)
from linemod_tpu.ops.spread import band_planes_from_image
from linemod_tpu.pipeline.pose_detection import _pad_bank

K_REPEAT = 100
N_TEMPLATES = 2048
TOP_K = 512
TP = 4


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


def main():
    use_pallas = jax.default_backend() == "tpu"
    ovh = device_time(lambda i, x: x * i.astype(jnp.float32), jnp.float32(1.0))
    print(f"overhead {ovh*1e3:.3f} ms")

    n_shard = N_TEMPLATES // TP
    bank = _pad_bank(
        make_synthetic_bank(n_shard, bbox_wh=96, image_wh=(640, 480)), 256
    )
    cfg = MatchConfig(
        width=640, height=480, top_k=TOP_K, template_chunk=256,
        use_pallas=use_pallas, approx_topk=use_pallas,
    )
    st = build_match_state(bank, cfg)
    rows_f, stride_f = st.fine_shape[2], st.fine_shape[3]
    rows_c, stride_c = st.coarse_shape[2], st.coarse_shape[3]
    cw = st.coarse_shape[1]
    k_slice = TOP_K // TP

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))

    def bands(i, c):
        c = c + i.astype(jnp.float32)
        fb = band_planes_from_image(
            c, cfg.t_fine, st.max_cells_fine, jnp.int32(0), TP,
            quantize_color_gradients,
        )
        cb = band_planes_from_image(
            downsample2(c), cfg.t_coarse, st.max_cells_coarse, jnp.int32(0), TP,
            quantize_color_gradients,
        )
        return fb.sum(dtype=jnp.int32).astype(jnp.float32) + cb.sum(
            dtype=jnp.int32
        ).astype(jnp.float32)

    t_bands = device_time(bands, color) - ovh
    print(f"band planes (fine+coarse, incl quantize+downsample): {t_bands*1e3:.3f} ms")

    def full_with_stages(i, c, with_fine, with_cut, with_refine):
        c = c + i.astype(jnp.float32)
        fb = band_planes_from_image(
            c, cfg.t_fine, st.max_cells_fine, jnp.int32(0), TP,
            quantize_color_gradients,
        ).reshape(-1, rows_f // TP, stride_f)
        cb = band_planes_from_image(
            downsample2(c), cfg.t_coarse, st.max_cells_coarse, jnp.int32(0), TP,
            quantize_color_gradients,
        ).reshape(-1, rows_c // TP, stride_c)
        coarse_planes = jnp.concatenate(
            [jnp.tile(cb, (1, TP, 1)), jnp.zeros((1, rows_c, stride_c), jnp.uint8)], 0)
        sim_c = coarse_similarity(st, coarse_planes)
        if not with_cut:
            return sim_c.sum(dtype=jnp.int32).astype(jnp.float32)
        top_sim, ct, cgy, cgx = candidate_cut(cfg, sim_c, cw, TOP_K)
        g_sim = jnp.tile(top_sim, TP)
        m_sim, mi = jax.lax.top_k(g_sim, TOP_K)
        m_t = jnp.tile(ct, TP)[mi]
        m_gy = jnp.tile(cgy, TP)[mi]
        m_gx = jnp.tile(cgx, TP)[mi]
        if not with_refine:
            return m_sim.sum() + m_t.sum().astype(jnp.float32)
        fine_planes = jnp.concatenate(
            [jnp.tile(fb, (1, TP, 1)), jnp.zeros((1, rows_f, stride_f), jnp.uint8)], 0)
        f_sim, f_x, f_y = fine_refine(st, fine_planes, m_t[:k_slice], m_gy[:k_slice], m_gx[:k_slice])
        out = finalize_matches(
            cfg, m_t, jnp.tile(f_sim, TP), jnp.tile(f_x, TP),
            jnp.tile(f_y, TP), m_sim)
        return out["similarity"].sum()

    import functools
    t_scan = device_time(functools.partial(full_with_stages, with_fine=False, with_cut=False, with_refine=False), color) - ovh
    print(f"bands+reassemble+coarse scan: {t_scan*1e3:.3f} ms (scan ~{(t_scan-t_bands)*1e3:.3f})")
    t_cut = device_time(functools.partial(full_with_stages, with_fine=False, with_cut=True, with_refine=False), color) - ovh
    print(f"+ local cut + merge: {t_cut*1e3:.3f} ms (cut ~{(t_cut-t_scan)*1e3:.3f})")
    t_all = device_time(functools.partial(full_with_stages, with_fine=True, with_cut=True, with_refine=True), color) - ovh
    print(f"+ fine reassemble + refine(K/tp) + finalize: {t_all*1e3:.3f} ms (tail ~{(t_all-t_cut)*1e3:.3f})")


if __name__ == "__main__":
    main()
