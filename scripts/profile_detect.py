"""Per-frame performance breakdown of the detector on the current backend.

Measurement notes for the axon remote-TPU transport:
- jax.block_until_ready does NOT sync through this transport; only a real
  fetch (np.asarray) does. Latency-mode numbers therefore include one ~50 ms
  host<->device round trip.
- Dispatches and uploads are async; "pipelined" rows enqueue N frames and
  sync once, which is the production streaming shape (detect_stream).
- The measured link runs at ~83 MB/s (921 KB color frame ~= 11 ms) and the
  fetch round-trip ~50 ms, so calls-per-frame — not bytes — dominates the
  streaming rate; detect_stream overlaps several fetches across collector
  threads (checks run host-side; depth stays on the host in color-only
  mode).
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
from linemod_tpu.ops import matching as M
from linemod_tpu.ops.detect_core import detect_frame
from linemod_tpu.ops.similarity_pallas import coarse_scores_pallas
from linemod_tpu.pipeline.pose_detection import PoseDetection

EXAMPLE = os.path.join(REPO, "example")
os.chdir(EXAMPLE)

cam, settings = load_settings("linemod_settings.yml")
bank_path = os.path.join("banks", "lagergehaeuse.npz")
if not os.path.exists(bank_path):
    from linemod_tpu.pipeline.template_generator import TemplateGenerator

    gen = TemplateGenerator(cam, settings, out_dir="banks")
    gen.run(verbose=False)
bank = TemplateBank.load(bank_path)
props = load_model_properties("models/lagergehaeuse.ply")
det = PoseDetection(bank, cam, settings, props)
state, cfg = det.state, det.state.cfg
print(f"{bank.num_templates} templates, pallas={cfg.use_pallas}, backend={jax.default_backend()}")

color = cv2.imread("benchmark/img0.png")
depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)
color_c = det.recenter(np.ascontiguousarray(color))
colorf = jnp.asarray(color_c.astype(np.float32))
depthf = jnp.zeros(colorf.shape[:2], jnp.float32)
coloru8 = jnp.asarray(color_c)

N = 30


def pipelined(label, fn):
    np.asarray(fn())  # warm/compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(N)]
    np.asarray(outs[-1])
    print(f"{label:46s} {(time.perf_counter() - t0) / N * 1e3:8.2f} ms (pipelined)")


# --- device program stages (pre-staged inputs: no upload) --------------------
ch, cw, _, _ = state.coarse_shape


@jax.jit
def coarse_planes_only(c, d):
    c1 = M.downsample2(c)
    planes = M._planes_3d(c1, d[::2, ::2], cfg.t_coarse, state.max_cells_coarse, False)
    return planes[0, :2, :2].astype(jnp.int32).sum()


@jax.jit
def coarse_scan(c, d):
    c1 = M.downsample2(c)
    planes = M._planes_3d(c1, d[::2, ::2], cfg.t_coarse, state.max_cells_coarse, False)
    tiles = coarse_scores_pallas(planes, state.off3_coarse, state.max_cells_coarse)
    return tiles[0, 0, 0] + tiles[-1, -1, -1]


@jax.jit
def fine_planes_only(c, d):
    planes = M._planes_3d(c, d, cfg.t_fine, state.max_cells_fine, False)
    return planes[0, :2, :2].astype(jnp.int32).sum()


pipelined("coarse planes", lambda: coarse_planes_only(colorf, depthf))
pipelined("coarse planes + pallas scan", lambda: coarse_scan(colorf, depthf))
pipelined("fine planes", lambda: fine_planes_only(colorf, depthf))
pipelined(
    "full match (planes+scan+topk+fine)",
    lambda: M.match_templates(state, colorf, depthf)["similarity"],
)
pipelined("detect_frame (device total)", lambda: detect_frame(state, coloru8))

# --- end-to-end --------------------------------------------------------------
det.detect(color, depth, 1)  # warm
t0 = time.perf_counter()
for _ in range(N):
    det.detect(color, depth, 1)
dt = (time.perf_counter() - t0) / N
print(f"{'det.detect (sync, incl. upload+RTT)':46s} {dt * 1e3:8.2f} ms ({1 / dt:.2f} fps)")

t0 = time.perf_counter()
n = sum(1 for _ in det.detect_stream((color, depth) for _ in range(N)))
dt = (time.perf_counter() - t0) / n
print(f"{'det.detect_stream (pipelined, incl. upload)':46s} {dt * 1e3:8.2f} ms ({1 / dt:.2f} fps)")
