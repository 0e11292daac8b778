import os, sys, time
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
from linemod_tpu.pipeline.pose_detection import PoseDetection

EXAMPLE = os.path.join(REPO, "example")
os.chdir(EXAMPLE)
cam, settings = load_settings("linemod_settings.yml")
bank = TemplateBank.load(os.path.join("banks", "lagergehaeuse.npz"))
props = load_model_properties("models/lagergehaeuse.ply")
det = PoseDetection(bank, cam, settings, props)
color = cv2.imread("benchmark/img0.png")
depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)
color_c = det.recenter(np.ascontiguousarray(color))
depth_c = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
colorf = jnp.asarray(color_c.astype(np.float32))
depthf = jnp.asarray(depth_c)

@jax.jit
def trivial(x):
    return x + 1.0

x = jnp.float32(3.0)
np.asarray(trivial(x))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(trivial(x))
print(f"RTT floor (trivial scalar): {(time.perf_counter()-t0)/20*1e3:.2f} ms")

# latency mode: sync every frame
np.asarray(detect_frame(det.state, det.check, colorf, depthf))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(detect_frame(det.state, det.check, colorf, depthf))
lat = (time.perf_counter() - t0) / 20
print(f"detect_frame latency-mode: {lat*1e3:.2f} ms ({1/lat:.2f} fps)")

# throughput mode: enqueue 30, sync once at the end
t0 = time.perf_counter()
outs = [detect_frame(det.state, det.check, colorf, depthf) for _ in range(30)]
np.asarray(outs[-1])
thr = (time.perf_counter() - t0) / 30
print(f"detect_frame throughput-mode: {thr*1e3:.2f} ms ({1/thr:.2f} fps)")
# verify all finished (in-order execution assumption): fetch all cheaply
t0 = time.perf_counter()
_ = [np.asarray(o) for o in outs]
print(f"fetch-all-after: {(time.perf_counter()-t0)*1e3:.1f} ms total")
