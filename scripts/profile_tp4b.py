"""Decompose the tp=4 per-device tail (fine reassembly + Pallas fine refine
+ finalize) measured by profile_tp4.py. Throwaway diagnostic."""

import functools
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
from linemod_tpu.ops.gradients import quantize_color_gradients
from linemod_tpu.ops.matching import MatchConfig, build_match_state, fine_refine
from linemod_tpu.ops.spread import band_planes_from_image
from linemod_tpu.pipeline.pose_detection import _pad_bank

K_REPEAT = 100
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

    n_shard = 2048 // TP
    bank = _pad_bank(
        make_synthetic_bank(n_shard, bbox_wh=96, image_wh=(640, 480)), 256
    )
    cfg = MatchConfig(
        width=640, height=480, top_k=TOP_K, template_chunk=256,
        use_pallas=use_pallas, approx_topk=use_pallas,
    )
    st = build_match_state(bank, cfg)
    rows_f, stride_f = st.fine_shape[2], st.fine_shape[3]
    k_slice = TOP_K // TP

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    cand_t = jnp.asarray(rng.integers(0, n_shard, k_slice).astype(np.int32))
    cand_gy = jnp.asarray(rng.integers(0, 20, k_slice).astype(np.int32))
    cand_gx = jnp.asarray(rng.integers(0, 30, k_slice).astype(np.int32))

    def reassemble(i, c):
        c = c + i.astype(jnp.float32)
        fb = band_planes_from_image(
            c, cfg.t_fine, st.max_cells_fine, jnp.int32(0), TP,
            quantize_color_gradients,
        ).reshape(-1, rows_f // TP, stride_f)
        fine_planes = jnp.concatenate(
            [jnp.tile(fb, (1, TP, 1)), jnp.zeros((1, rows_f, stride_f), jnp.uint8)], 0)
        return fine_planes.sum(dtype=jnp.int32).astype(jnp.float32)

    def reassemble_refine(i, c, t, gy, gx):
        c = c + i.astype(jnp.float32)
        fb = band_planes_from_image(
            c, cfg.t_fine, st.max_cells_fine, jnp.int32(0), TP,
            quantize_color_gradients,
        ).reshape(-1, rows_f // TP, stride_f)
        fine_planes = jnp.concatenate(
            [jnp.tile(fb, (1, TP, 1)), jnp.zeros((1, rows_f, stride_f), jnp.uint8)], 0)
        f_sim, f_x, f_y = fine_refine(st, fine_planes, t, gy, gx)
        return f_sim.sum() + f_x.sum().astype(jnp.float32)

    t_r = device_time(reassemble, color) - ovh
    print(f"fine band + tile/concat reassembly: {t_r*1e3:.3f} ms")
    t_rr = device_time(reassemble_refine, color, cand_t, cand_gy, cand_gx) - ovh
    print(f"+ pallas fine refine({k_slice}): {t_rr*1e3:.3f} ms (refine ~{(t_rr-t_r)*1e3:.3f})")


if __name__ == "__main__":
    main()
