"""Device-program breakdown on the real TPU.

block_until_ready does not sync through the axon transport, so each stage is
wrapped in a jitted function returning a tiny checksum that is fetched with
np.asarray (a real round-trip).
"""

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

import cv2
import jax.numpy as jnp

from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops import matching as M
from linemod_tpu.ops.detect_core import CHECK_K, detect_frame
from linemod_tpu.ops.postprocess import (
    bgr_to_hsv_inrange,
    color_check_batch,
    depth_p20_batch,
)
from linemod_tpu.ops.similarity_pallas import coarse_scores_pallas
from linemod_tpu.pipeline.pose_detection import PoseDetection

EXAMPLE = os.path.join(REPO, "example")
os.chdir(EXAMPLE)

cam, settings = load_settings("linemod_settings.yml")
bank = TemplateBank.load(os.path.join("banks", "lagergehaeuse.npz"))
props = load_model_properties("models/lagergehaeuse.ply")
det = PoseDetection(bank, cam, settings, props)
state, check = det.state, det.check
cfg = state.cfg
print(f"{bank.num_templates} templates, pallas={cfg.use_pallas}, window={check.window}")

color = cv2.imread("benchmark/img0.png")
depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)
color_c = det.recenter(np.ascontiguousarray(color))
depth_c = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
colorf = jnp.asarray(color_c.astype(np.float32))
depthf = jnp.asarray(depth_c)

N = 10


def bench(label, fn):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(N):
        np.asarray(fn())
    dt = (time.perf_counter() - t0) / N
    print(f"{label:44s} {dt * 1e3:9.2f} ms")


@jax.jit
def planes_only(color, depth):
    fine = M._planes_3d(color, depth, cfg.t_fine, state.max_cells_fine, cfg.dual_modality)
    c1 = M.downsample2(color)
    d1 = depth[::2, ::2]
    coarse = M._planes_3d(c1, d1, cfg.t_coarse, state.max_cells_coarse, cfg.dual_modality)
    return jnp.sum(fine.astype(jnp.int32)) + jnp.sum(coarse.astype(jnp.int32))


@jax.jit
def coarse_only(color, depth):
    c1 = M.downsample2(color)
    d1 = depth[::2, ::2]
    coarse = M._planes_3d(c1, d1, cfg.t_coarse, state.max_cells_coarse, cfg.dual_modality)
    tiles = coarse_scores_pallas(coarse, state.off3_coarse)
    return jnp.sum(tiles)


@jax.jit
def match_sum(color, depth):
    m = M.match_templates(state, color, depth)
    return m["similarity"].sum() + m["x"].sum()


@jax.jit
def checks_only(color, depth):
    # fixed fake candidates (cost is identical)
    tid = jnp.arange(CHECK_K, dtype=jnp.int32)
    xy = jnp.tile(jnp.asarray([[200, 150]], jnp.int32), (CHECK_K, 1))
    inrange = bgr_to_hsv_inrange(color, check.lower, check.upper)
    pct = color_check_batch(inrange, check.hull[tid], xy, window=check.window)
    p20 = depth_p20_batch(depth, xy, check.bbox_wh[tid], window=check.window)
    return pct.sum() + p20.sum()


bench("planes precompute (fine+coarse)", lambda: planes_only(colorf, depthf))
bench("coarse planes + pallas scan", lambda: coarse_only(colorf, depthf))
bench("full match (planes+scan+topk+fine)", lambda: match_sum(colorf, depthf))
bench("checks only (64 cands)", lambda: checks_only(colorf, depthf))
bench("detect_frame (everything)", lambda: detect_frame(state, check, colorf, depthf))


# ---- finer breakdown of the planes pipeline --------------------------------
from linemod_tpu.ops.gradients import quantize_color_gradients
from linemod_tpu.ops.spread import linearize, response_maps, spread_orientations


@functools.partial(jax.jit, static_argnames=("t",))
def quant_only(color, t):
    q, _ = quantize_color_gradients(color)
    return jnp.sum(q.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("t",))
def spread_only(color, t):
    q, _ = quantize_color_gradients(color)
    h, w = q.shape
    q = q[: h - h % t, : w - w % t]
    return jnp.sum(spread_orientations(q, t).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("t",))
def resp_only(color, t):
    q, _ = quantize_color_gradients(color)
    h, w = q.shape
    q = q[: h - h % t, : w - w % t]
    return jnp.sum(response_maps(spread_orientations(q, t)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("t", "mc"))
def lin_only(color, t, mc):
    q, _ = quantize_color_gradients(color)
    h, w = q.shape
    q = q[: h - h % t, : w - w % t]
    r = response_maps(spread_orientations(q, t))
    return jnp.sum(linearize(r, t, mc).astype(jnp.int32))


colorf1 = jnp.asarray(color_c[::2, ::2].astype(np.float32))
bench("fine: quantize", lambda: quant_only(colorf, cfg.t_fine))
bench("fine: +spread", lambda: spread_only(colorf, cfg.t_fine))
bench("fine: +response", lambda: resp_only(colorf, cfg.t_fine))
bench("fine: +linearize", lambda: lin_only(colorf, cfg.t_fine, state.max_cells_fine))
bench("coarse: quantize", lambda: quant_only(colorf1, cfg.t_coarse))
bench("coarse: +response", lambda: resp_only(colorf1, cfg.t_coarse))
bench("coarse: +linearize", lambda: lin_only(colorf1, cfg.t_coarse, state.max_cells_coarse))
