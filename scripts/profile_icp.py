"""Profile the ICP leg: device cost of the fused refine+verify chain and the
end-to-end latency of each call in the ICP-on stream, to size the round-5
submit/collect pipelining work (VERDICT r4 item 2)."""

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
from linemod_tpu.ops.icp import IcpRefiner, icp_refine_batch, _verify_means_batch
from linemod_tpu.ops.depth3d import scene_cloud_from_depth
from linemod_tpu.ops.rasterizer import mesh_to_arrays
from linemod_tpu.pipeline.pose_detection import PoseDetection
from linemod_tpu.utils.ply import load_ply

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

print(f"model_pts: {icp.model_pts.shape}, model_nrm: "
      f"{None if icp.model_nrm is None else icp.model_nrm.shape}")

# one sync detect to warm everything
poses = det.detect(color, depth, 1)
print("poses:", len(poses))

# grab the group poses that reach ICP
from linemod_tpu.pipeline.pose_detection import DetectionDebug

handle = det.detect_submit(color, depth)
packed = np.asarray(handle[0])
valid = packed[:, 4] > 0.5
print("raw matches:", valid.sum())

# time the host-side phases of detect_collect
t0 = time.perf_counter()
poses = det.detect_collect(det.detect_submit(color, depth), 1)
print(f"full sync detect+icp: {(time.perf_counter() - t0) * 1e3:.1f} ms")

# time refine_best alone (1 group, P=1)
depthf = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
no_icp_det = PoseDetection(bank, cam, settings, props)
p0 = no_icp_det.detect(color, depth, 1)
for _ in range(3):
    t0 = time.perf_counter()
    best = icp.refine_best(depthf, p0)
    print(f"refine_best (P=1) end-to-end: {(time.perf_counter() - t0) * 1e3:.1f} ms")

# device-only cost of the chain via in-device repetition
bbox = np.asarray(p0[0].bounding_box, np.int32)
from linemod_tpu.utils.geometry import quat_to_mat

rots = jnp.asarray(np.stack([quat_to_mat(p0[0].quaternion)]).astype(np.float32))
trans = jnp.asarray(np.stack([p0[0].translation]).astype(np.float32))
depthj = jnp.asarray(depthf)
bboxj = jnp.asarray(bbox)

REPS = 20

def chain(r0, t0_, d, bb):
    spts, snrm, svalid = scene_cloud_from_depth(
        d, bb, fx=cam.fx, fy=cam.fy, cx=cam.width / 2.0, cy=cam.height / 2.0)
    r, t, _ = icp_refine_batch(
        icp.model_pts, spts, snrm, svalid, r0, t0_,
        iterations=icp.iterations, model_nrm=icp.model_nrm,
        tolerance=icp.tolerance, rejection_scale=icp.rejection_scale)
    means = _verify_means_batch(
        icp.marr, r, t, d, cam.fx, cam.fy, cam.width / 2.0, cam.height / 2.0,
        cam.width, cam.height)
    return jnp.concatenate([r.reshape(-1, 9), t, means[:, None]], axis=1)


@jax.jit
def rep_chain(r0, t0_, d, bb):
    def step(acc, i):
        return acc + chain(r0, t0_, d + 0.0 * i.astype(jnp.float32), bb).sum(), None
    return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))[0]


np.asarray(rep_chain(rots, trans, depthj, bboxj))
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(rep_chain(rots, trans, depthj, bboxj))
    dt = (time.perf_counter() - t0) / REPS
    print(f"icp chain device (P=1): {dt * 1e3:.2f} ms")

# sub-stage device times
@jax.jit
def rep_cloud(d, bb):
    def step(acc, i):
        s, n, v = scene_cloud_from_depth(
            d + 0.0 * i.astype(jnp.float32), bb, fx=cam.fx, fy=cam.fy,
            cx=cam.width / 2.0, cy=cam.height / 2.0)
        return acc + s.sum() + n.sum(), None
    return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))[0]


np.asarray(rep_cloud(depthj, bboxj))
t0 = time.perf_counter()
np.asarray(rep_cloud(depthj, bboxj))
print(f"scene_cloud device: {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")

spts, snrm, svalid = scene_cloud_from_depth(
    depthj, bboxj, fx=cam.fx, fy=cam.fy, cx=cam.width / 2.0, cy=cam.height / 2.0)


@jax.jit
def rep_icp(r0, t0_, sp, sn, sv):
    def step(acc, i):
        r, t, _ = icp_refine_batch(
            icp.model_pts, sp + 0.0 * i.astype(jnp.float32), sn, sv, r0, t0_,
            iterations=icp.iterations, model_nrm=icp.model_nrm,
            tolerance=icp.tolerance, rejection_scale=icp.rejection_scale)
        return acc + r.sum() + t.sum(), None
    return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))[0]


np.asarray(rep_icp(rots, trans, spts, snrm, svalid))
t0 = time.perf_counter()
np.asarray(rep_icp(rots, trans, spts, snrm, svalid))
print(f"icp_refine device (P=1): {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")


@jax.jit
def rep_verify(r0, t0_, d):
    def step(acc, i):
        m = _verify_means_batch(
            icp.marr, r0, t0_, d + 0.0 * i.astype(jnp.float32),
            cam.fx, cam.fy, cam.width / 2.0, cam.height / 2.0,
            cam.width, cam.height)
        return acc + m.sum(), None
    return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS))[0]


np.asarray(rep_verify(rots, trans, depthj))
t0 = time.perf_counter()
np.asarray(rep_verify(rots, trans, depthj))
print(f"verify render device (P=1): {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")
