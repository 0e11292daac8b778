"""Per-stage timing of one detect frame on the current backend.

Breaks the frame into: host preprocessing, device program (match-only vs
match+checks), host readback, host grouping/pose-math — so we can see where
the 1.47 s (round 1) actually goes.
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

import cv2
import jax.numpy as jnp

from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops.detect_core import detect_frame
from linemod_tpu.ops.matching import match_templates
from linemod_tpu.pipeline.pose_detection import PoseDetection

EXAMPLE = os.path.join(REPO, "example")
os.chdir(EXAMPLE)

cam, settings = load_settings("linemod_settings.yml")
bank_path = os.path.join("banks", "lagergehaeuse.npz")
if not os.path.exists(bank_path):
    from linemod_tpu.pipeline.template_generator import TemplateGenerator

    gen = TemplateGenerator(cam, settings, out_dir="banks")
    bank_path = gen.bank_path("lagergehaeuse.ply")
    gen.run(verbose=False)
bank = TemplateBank.load(bank_path)
props = load_model_properties("models/lagergehaeuse.ply")
det = PoseDetection(bank, cam, settings, props)
print(f"bank: {bank.num_templates} templates; backend: {jax.default_backend()}")

color = cv2.imread("benchmark/img0.png")
depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)

# --- stage arrays -----------------------------------------------------------
color_c = det.recenter(np.ascontiguousarray(color))
depth_c = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
dc = jnp.asarray(color_c.astype(np.uint8))
dd = jnp.asarray(depth_c)
colorf = dc.astype(jnp.float32)
depthf = dd

N = 20


def bench(label, fn):
    jax.block_until_ready(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(N):
        jax.block_until_ready(fn())  # sync every frame: real per-call latency
    dt = (time.perf_counter() - t0) / N
    print(f"{label:40s} {dt * 1e3:9.2f} ms")
    return dt


bench("h2d transfer (color+depth)", lambda: (jnp.asarray(color_c), jnp.asarray(depth_c)))
bench("recenter (host numpy)", lambda: (det.recenter(color), det.recenter(depth)))
bench("match_templates only", lambda: match_templates(det.state, colorf, depthf))
bench("detect_frame (match+checks)", lambda: detect_frame(det.state, det.check, dc, dd))
bench(
    "detect_frame + np.asarray readback",
    lambda: np.asarray(detect_frame(det.state, det.check, dc, dd)),
)


def full():
    return det.detect(color, depth, 1)


full()
t0 = time.perf_counter()
for _ in range(N):
    full()
dt = (time.perf_counter() - t0) / N
print(f"{'det.detect end-to-end':40s} {dt * 1e3:9.2f} ms  ({1/dt:.2f} fps)")
