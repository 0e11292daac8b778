"""Per-stage device-time breakdown of the match program on the real chip.

Times each stage of ops/matching.py by running it K times INSIDE one jitted
program (lax.scan with a per-iteration input perturbation to defeat CSE) and
fetching one scalar — the axon transport has a ~2 ms per-dispatch floor and a
no-op block_until_ready, so chained host-side dispatch loops cannot resolve
sub-ms stages. This is the measurement behind the tp-sharding design: stages
that replicate per device are the scaling ceiling.
"""

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
from linemod_tpu.ops import matching as M
from linemod_tpu.ops.matching import MatchConfig, build_match_state

K = 50  # in-device repetitions per measurement
N_TEMPLATES = 2048


def device_time(make_body, example, n_outer: int = 3) -> float:
    """Median wall time of one jitted program running body K times on device.

    make_body(x, i) -> scalar; x is the (device-resident) example input and i
    the iteration counter (fold i into the input to defeat CSE)."""

    @jax.jit
    def run(x):
        def step(acc, i):
            return acc + make_body(x, i), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K))
        return acc

    np.asarray(run(example))  # compile + warm
    ts = []
    for _ in range(n_outer):
        t0 = time.perf_counter()
        np.asarray(run(example))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


def main():
    use_pallas = jax.default_backend() == "tpu"
    bank = make_synthetic_bank(N_TEMPLATES, bbox_wh=96, image_wh=(640, 480))
    cfg = MatchConfig(width=640, height=480, top_k=512, template_chunk=256,
                      use_pallas=use_pallas, approx_topk=False)
    state = build_match_state(bank, cfg)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)

    from linemod_tpu.ops.extract import downsample2
    from linemod_tpu.ops.gradients import quantize_color_gradients
    from linemod_tpu.ops.spread import linearize, response_maps, spread_orientations

    results = {}

    def stage(name, body, example):
        results[name] = device_time(body, example)
        print(f"{name:34s} {results[name] * 1e3:7.3f} ms")

    @jax.jit
    def make_planes(c):
        fine = M._planes_3d(c, depth, cfg.t_fine, state.max_cells_fine, False)
        coarse = M._planes_3d(c[::2, ::2], depth[::2, ::2], cfg.t_coarse,
                              state.max_cells_coarse, False)
        return fine, coarse

    # full program
    stage("full match (approx topk)",
          lambda x, i: M._match_with_planes(
              state,
              *make_planes(x + i.astype(jnp.float32)))["similarity"].sum(),
          color)

    stage("planes fine+coarse",
          lambda x, i: sum(p.sum().astype(jnp.float32)
                           for p in make_planes(x + i.astype(jnp.float32))),
          color)

    stage("quantize L0 (640x480)",
          lambda x, i: quantize_color_gradients(
              x + i.astype(jnp.float32))[0].sum().astype(jnp.float32),
          color)
    stage("downsample2 + quantize L1",
          lambda x, i: quantize_color_gradients(
              downsample2(x + i.astype(jnp.float32)))[0].sum().astype(jnp.float32),
          color)

    quant0 = jax.jit(lambda c: quantize_color_gradients(c)[0])(color)
    quant1 = jax.jit(lambda c: quantize_color_gradients(downsample2(c))[0])(color)

    stage("spread T=2 L0",
          lambda x, i: spread_orientations(x ^ i.astype(jnp.uint8), 2)
          .sum().astype(jnp.float32), quant0)
    stage("spread T=8 L1",
          lambda x, i: spread_orientations(x ^ i.astype(jnp.uint8), 8)
          .sum().astype(jnp.float32), quant1)

    spread0 = jax.jit(lambda q: spread_orientations(q, 2))(quant0)
    spread1 = jax.jit(lambda q: spread_orientations(q, 8))(quant1)

    stage("response L0",
          lambda x, i: response_maps(x ^ i.astype(jnp.uint8))
          .sum().astype(jnp.float32), spread0)
    stage("response L1",
          lambda x, i: response_maps(x ^ i.astype(jnp.uint8))
          .sum().astype(jnp.float32), spread1)

    resp0 = jax.jit(response_maps)(spread0)
    resp1 = jax.jit(response_maps)(spread1)

    stage("linearize L0 (T=2)",
          lambda x, i: linearize(x ^ i.astype(jnp.uint8), 2,
                                 state.max_cells_fine).sum().astype(jnp.float32),
          resp0)
    stage("linearize L1 (T=8)",
          lambda x, i: linearize(x ^ i.astype(jnp.uint8), 8,
                                 state.max_cells_coarse).sum().astype(jnp.float32),
          resp1)

    fine_planes, coarse_planes = make_planes(color)

    if use_pallas:
        from linemod_tpu.ops.similarity_pallas import coarse_scores_pallas

        stage("coarse Pallas scan (2048 t)",
              lambda x, i: coarse_scores_pallas(
                  x ^ i.astype(jnp.uint8), state.off3_coarse,
                  state.max_cells_coarse).sum().astype(jnp.float32),
              coarse_planes)

    stage("match given planes",
          lambda x, i: M._match_with_planes(
              state, fine_planes, x ^ i.astype(jnp.uint8)
          )["similarity"].sum(), coarse_planes)

    scores = jnp.asarray(
        rng.uniform(0, 100, (N_TEMPLATES * 1200,)).astype(np.float32))
    stage("topk approx 512-of-2.4M",
          lambda x, i: jax.lax.approx_max_k(
              x + i.astype(jnp.float32), 512, recall_target=0.99,
              aggregate_to_topk=True)[0].sum(), scores)
    stage("topk exact 512-of-2.4M",
          lambda x, i: jax.lax.top_k(
              x + i.astype(jnp.float32), 512)[0].sum(), scores)


if __name__ == "__main__":
    main()
