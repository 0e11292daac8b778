"""Benchmark entry point: prints ONE JSON line with the headline metric.

Metric (BASELINE.json): detector frames/sec per chip on the bundled
benchmark frame (`benchmark/img0.png`, lagergehaeuse bank, shipped
color-only config), with the detected pose validated against the captured
ground truth via VSD (< 0.3 correct criterion) before timing is reported.

vs_baseline compares against the single-host CPU run of this same pipeline
(the reference publishes no numbers and its OpenMP/OpenGL build does not
exist on this machine, BASELINE.md): measured once and cached in
baseline_cpu.json.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
EXAMPLE = os.path.join(REPO, "example")
CPU_BASELINE_FILE = os.path.join(REPO, "baseline_cpu.json")
FRAMES = 30
# median-of-REPEATS for the headline: the tunnel's throughput drifts
# +-20-30% in phases lasting minutes, so many short reps sample more phases
# than a few long ones (same total frames) and the median converges to the
# nominal rate
REPEATS = 10


def run_pipeline(report_accuracy: bool):
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import cv2

    from linemod_tpu.config import load_model_properties, load_settings
    from linemod_tpu.models.template_bank import TemplateBank
    from linemod_tpu.pipeline.pose_detection import PoseDetection
    from linemod_tpu.pipeline.benchmark import Benchmark, read_ground_truth_pose
    from linemod_tpu.pipeline.template_generator import TemplateGenerator
    from linemod_tpu.utils.ply import load_ply

    os.chdir(EXAMPLE)
    cam, settings = load_settings("linemod_settings.yml")
    gen = TemplateGenerator(cam, settings, out_dir="banks")
    bank_path = gen.bank_path("lagergehaeuse.ply")
    if not os.path.exists(bank_path):
        gen.run(verbose=False)
    bank = TemplateBank.load(bank_path)
    props = load_model_properties("models/lagergehaeuse.ply")
    det = PoseDetection(bank, cam, settings, props)

    color = cv2.imread("benchmark/img0.png")
    depth = cv2.imread("benchmark/depth0.png", cv2.IMREAD_ANYDEPTH)

    # warmup (compile)
    poses = det.detect(color, depth, 1)
    vsd = add = None
    if report_accuracy:
        mesh = load_ply("models/lagergehaeuse.ply")
        bench = Benchmark(mesh, cam)
        gt = read_ground_truth_pose("benchmark/pose0.yml")
        if poses:
            scene = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
            vsd = bench.score_vsd(scene, gt, poses[0])
            add = bench.score_add(gt, poses[0])

    # production serving shape: frames stream in with several in flight
    # (detect_stream overlaps upload, device compute, and the ~50 ms fetch
    # round-trips of the remote transport), so each frame costs
    # max(upload, device) time, not round-trip time. The transport rate
    # drifts in phases lasting MINUTES, so back-to-back reps all land in
    # one phase; headline samples are therefore collected in several
    # bursts SPREAD ACROSS the whole bench run (between the secondary
    # variants) and pooled — the median then straddles phases. An untimed
    # stream first absorbs the cold start (first-stream rates measure ~2x
    # low on this tunnel).
    headline_rates = []

    def headline_burst(reps):
        for _ in det.detect_stream((color, depth) for _ in range(10)):
            pass
        for _ in range(reps):
            t0 = time.time()
            n_done = sum(
                1 for _ in det.detect_stream(
                    (color, depth) for _ in range(FRAMES)
                )
            )
            headline_rates.append((time.time() - t0) / n_done)

    headline_burst(REPEATS // 2)
    dt = sorted(headline_rates)[len(headline_rates) // 2]

    # disk-to-pose: the same stream but read from an on-disk PNG sequence
    # through the native prefetch loader (decode of frame i+1 overlaps frame
    # i's detection), so the published number includes decode+IO — the
    # loader's reason to exist (round-2 weakness #8)
    import tempfile

    disk_fps = None
    try:
        with tempfile.TemporaryDirectory() as td:
            for i in range(FRAMES):
                cv2.imwrite(os.path.join(td, f"img{i}.png"), color)
                cv2.imwrite(os.path.join(td, f"depth{i}.png"), depth)
            from linemod_tpu.cli import _frame_source

            # median of 3 passes over the sequence (transport phase noise)
            disk_rates = []
            for _ in range(3):
                src = _frame_source(
                    os.path.join(td, "img%d.png"),
                    os.path.join(td, "depth%d.png"),
                )
                t0 = time.time()
                n_disk = sum(1 for _ in det.detect_stream(src))
                if n_disk:
                    disk_rates.append(n_disk / (time.time() - t0))
            if disk_rates:
                disk_fps = sorted(disk_rates)[len(disk_rates) // 2]
    except Exception:
        pass

    # --- secondary variants (reported, not the headline; skipped for the
    # one-off CPU-baseline worker) ------------------------------------------
    import dataclasses

    if not report_accuracy:
        return (1.0 / dt, vsd, add, len(poses), disk_fps, None, None, None,
                None, None)

    # device-bound rate: the full fused match program timed by in-device
    # repetition (lax.scan of 100 iterations, one scalar fetch) — the
    # transport-independent capability of the engine (the tunnel's
    # throughput phases swing the streaming headline +-30%; this number is
    # stable run to run)
    def measure_device_fps(state, colorf, depthf, reps=100):
        import jax
        import jax.numpy as jnp

        from linemod_tpu.ops.matching import match_templates

        @jax.jit
        def dev_run(c, d):
            def step(acc, i):
                out = match_templates(state, c + i.astype(jnp.float32), d)
                return acc + out["similarity"].sum(), None
            return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))[0]

        @jax.jit
        def dev_ovh(c):
            def step(acc, i):
                return acc + c[0, 0, 0] * i.astype(jnp.float32), None
            return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))[0]

        np.asarray(dev_run(colorf, depthf))
        np.asarray(dev_ovh(colorf))
        ts = []
        os_ = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(dev_run(colorf, depthf))
            ts.append(time.time() - t0)
            t0 = time.time()
            np.asarray(dev_ovh(colorf))
            os_.append(time.time() - t0)
        dev_s = (sorted(ts)[1] - sorted(os_)[1]) / reps
        return 1.0 / dev_s if dev_s > 0 else None

    device_fps = None
    try:
        import jax.numpy as jnp

        colorf = jnp.asarray(
            det.recenter(np.ascontiguousarray(color)).astype(np.float32)
        )
        depthz = jnp.zeros(colorf.shape[:2], jnp.float32)
        device_fps = measure_device_fps(det.state, colorf, depthz)
    except Exception:
        pass

    headline_burst(REPEATS // 4)  # phase-spread headline sample (see above)

    # host half of the frame (grouping + lazy color/depth checks + pose
    # math), timed from a PREFETCHED packed array so no transport wait or
    # device time is included — the number that would bound the frame rate
    # on a PCIe-class transport where fetches are ~10 us, not ~50 ms
    host_post_ms = None
    try:
        handle = det.detect_submit(color, depth)
        h2 = (np.asarray(handle[0]), handle[1], handle[2])
        det.detect_collect(h2, 1)  # warm the per-template hull-mask cache
        reps_h = 50
        t0 = time.time()
        for _ in range(reps_h):
            det.detect_collect(h2, 1)
        host_post_ms = (time.time() - t0) / reps_h * 1e3
    except Exception:
        pass

    def stream_fps(d, n_frames=30):
        # median of 3 runs: the tunnel's throughput drifts in phases, and a
        # single run mis-states a variant by up to +-30%. An untimed stream
        # absorbs the cold-start penalty first (first stream after idle
        # reads ~2x low on this tunnel).
        d.detect(color, depth, 1)  # warm/compile
        for _ in d.detect_stream((color, depth) for _ in range(10)):
            pass
        rates = []
        for _ in range(3):
            t0 = time.time()
            n = sum(
                1 for _ in d.detect_stream((color, depth) for _ in range(n_frames))
            )
            rates.append(n / (time.time() - t0))
        return sorted(rates)[1]

    # ICP-on (use icp: 1): per-group joint ICP refine + verify-by-render
    # (src/PoseDetection.cpp:72-84); the shipped config matches the
    # reference default of ICP off, so this is a separate number.
    icp_fps = None
    try:
        from linemod_tpu.ops.icp import IcpRefiner
        from linemod_tpu.ops.rasterizer import mesh_to_arrays

        mesh_icp = load_ply("models/lagergehaeuse.ply")
        settings_icp = dataclasses.replace(settings, use_icp=True)
        icp = IcpRefiner(
            mesh_icp,
            cam,
            settings.icp_subsampling_factor,
            mesh_arrays=mesh_to_arrays(mesh_icp),
        )
        det_icp = PoseDetection(bank, cam, settings_icp, props, mesh=mesh_icp, icp=icp)
        icp_fps = stream_fps(det_icp)
    except Exception:
        pass

    headline_burst(REPEATS // 4)  # phase-spread headline sample (see above)

    # Dual-modality (ColorGradient + DepthNormal, T={5,8},
    # src/HighLevelLinemod.cpp:26-35): its own bank; depth goes to the device.
    dual_fps = None
    dual_device_fps = None
    try:
        settings_dual = dataclasses.replace(settings, only_color_modality=False)
        gen_dual = TemplateGenerator(cam, settings_dual, out_dir="banks_dual")
        dual_path = gen_dual.bank_path("lagergehaeuse.ply")
        if not os.path.exists(dual_path):
            gen_dual.run(verbose=False)
        bank_dual = TemplateBank.load(dual_path)
        det_dual = PoseDetection(bank_dual, cam, settings_dual, props)
        dual_fps = stream_fps(det_dual)
        import jax.numpy as jnp

        colorf_d = jnp.asarray(
            det_dual.recenter(np.ascontiguousarray(color)).astype(np.float32)
        )
        depthf_d = jnp.asarray(
            det_dual.recenter(np.ascontiguousarray(depth)).astype(np.float32)
        )
        dual_device_fps = measure_device_fps(det_dual.state, colorf_d, depthf_d)
    except Exception:
        pass

    # final phase-spread burst + pooled median over every headline sample
    headline_burst(REPEATS - len(headline_rates))
    dt = sorted(headline_rates)[len(headline_rates) // 2]
    return (1.0 / dt, vsd, add, len(poses), disk_fps, icp_fps, dual_fps,
            device_fps, host_post_ms, dual_device_fps)


def measure_cpu_baseline() -> float:
    """One-off CPU measurement of the same pipeline, cached to disk."""
    if os.path.exists(CPU_BASELINE_FILE):
        with open(CPU_BASELINE_FILE) as f:
            return json.load(f)["cpu_fps"]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-worker"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    cpu_fps = json.loads(line)["fps"]
    with open(CPU_BASELINE_FILE, "w") as f:
        json.dump({"cpu_fps": cpu_fps}, f)
    return cpu_fps


def main():
    if "--cpu-worker" in sys.argv:
        fps = run_pipeline(report_accuracy=False)[0]
        print(json.dumps({"fps": fps}))
        return

    (fps, vsd, add, n_poses, disk_fps, icp_fps, dual_fps,
     device_fps, host_post_ms, dual_device_fps) = run_pipeline(
        report_accuracy=True)
    try:
        cpu_fps = measure_cpu_baseline()
    except Exception:
        cpu_fps = None
    # reference correctness criteria: VSD < 0.3 (src/Benchmark.cpp:33) AND
    # mean ADD <= 21 (include/Benchmark.h:105)
    ok = n_poses > 0 and (vsd is None or vsd < 0.3) and (add is None or add <= 21.0)
    result = {
        "metric": "detector_fps_per_chip"
        + ("" if ok else "_ACCURACY_FAIL"),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / cpu_fps, 2) if cpu_fps else None,
    }
    if disk_fps is not None:
        # secondary metric: disk-to-pose over an on-disk PNG sequence
        # (decode + prefetch + upload + detect), see run_pipeline. NOTE:
        # this is a single run while the headline is a median of 3, and the
        # tunnel's throughput drifts +-20-30% on minutes timescales, so
        # disk_to_pose can occasionally read ABOVE the headline when its
        # run lands in a better transport phase — decode+IO are fully
        # overlapped by the prefetch loader, so the two paths' true costs
        # differ by less than the phase noise.
        result["disk_to_pose_fps"] = round(disk_fps, 3)
    if device_fps is not None:
        # transport-independent engine capability (in-device repetition)
        result["device_fps"] = round(device_fps, 3)
    if host_post_ms is not None:
        # host half of the frame (grouping + checks + pose math) from a
        # prefetched result: on a PCIe-class transport the frame rate is
        # bounded by max(device, host_post, upload), so publishing this
        # keeps the device_fps claim honest end-to-end
        result["host_post_ms"] = round(host_post_ms, 3)
    if icp_fps is not None:
        result["icp_fps"] = round(icp_fps, 3)
    if dual_fps is not None:
        result["dual_fps"] = round(dual_fps, 3)
    if dual_device_fps is not None:
        # dual-modality transport-independent engine capability
        result["dual_device_fps"] = round(dual_device_fps, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
