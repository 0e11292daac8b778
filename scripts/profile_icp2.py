"""A/B the round-5 ICP leg on the real chip: device cost of the fused
grouped chain (organized normals + cropped verify) and the two-stage
pipelined stream rate."""

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
import dataclasses
import jax.numpy as jnp

from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops.icp import IcpRefiner, _refine_verify_groups
from linemod_tpu.ops.rasterizer import mesh_to_arrays
from linemod_tpu.pipeline.pose_detection import PoseDetection
from linemod_tpu.utils.ply import load_ply
from linemod_tpu.utils.geometry import quat_to_mat

os.chdir(os.path.join(REPO, "example"))
cam, settings = load_settings("linemod_settings.yml")
bank = TemplateBank.load("banks/lagergehaeuse.npz")
props = load_model_properties("models/lagergehaeuse.ply")
mesh = load_ply("models/lagergehaeuse.ply")
settings_icp = dataclasses.replace(settings, use_icp=True)
icp = IcpRefiner(mesh, cam, settings.icp_subsampling_factor,
                 mesh_arrays=mesh_to_arrays(mesh))
det = PoseDetection(bank, cam, settings_icp, props, mesh=mesh, icp=icp)

color = cv2.imread("benchmark/img0.png")
depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)

poses = det.detect(color, depth, 1)
print("poses:", len(poses), "t:", None if not poses else poses[0].translation)

depthf = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
no_icp = PoseDetection(bank, cam, settings, props)
p0 = no_icp.detect(color, depth, 1)

for _ in range(3):
    t0 = time.perf_counter()
    best = icp.refine_best(depthf, p0)
    print(f"refine_best (G=1,P=1) end-to-end: {(time.perf_counter() - t0) * 1e3:.1f} ms")

# device-only cost of the grouped chain via in-device repetition
bboxes = jnp.asarray(np.asarray([p0[0].bounding_box], np.int32))
rots = jnp.asarray(np.stack([quat_to_mat(p0[0].quaternion)])[None].astype(np.float32))
trans = jnp.asarray(np.stack([p0[0].translation])[None].astype(np.float32))
depthj = jnp.asarray(depthf)

REPS = 20


@jax.jit
def rep_chain(r0, t0_, d, bb):
    def step(acc, i):
        out = _refine_verify_groups(
            icp.model_pts, icp.model_nrm, icp.marr,
            d + 0.0 * i.astype(jnp.float32), bb, r0, t0_,
            cam.fx, cam.fy, cam.width / 2.0, cam.height / 2.0,
            cam.width, cam.height,
            icp.iterations, icp.tolerance, icp.rejection_scale)
        return acc + out.sum(), None
    return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))[0]


np.asarray(rep_chain(rots, trans, depthj, bboxes))
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(rep_chain(rots, trans, depthj, bboxes))
    print(f"grouped icp chain device (G=1,P=1): "
          f"{(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")

# the pipelined stream
N = 30
for trial in range(3):
    t0 = time.perf_counter()
    n = sum(1 for _ in det.detect_stream(
        (color, depth) for _ in range(N)))
    dt = (time.perf_counter() - t0) / n
    print(f"icp stream: {1.0 / dt:.1f} fps")
