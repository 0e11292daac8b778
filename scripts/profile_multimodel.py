"""Multi-model serving perf (VERDICT r4 item 8): time
MultiModelPoseDetection.detect_all with 2 and 3 classes against the
single-class detector, on the real chip, and record the numbers in
MULTIMODEL_PERF.json.

Classes are three independently-loaded copies of the fixture bank under
distinct class ids — shape-identical to three distinct CAD models of the
same template count, which is what the timing depends on. The point being
measured is the super-bank design (pipeline/multi_model.py): per-frame
response planes are computed ONCE and every class's templates scan against
them, so adding a class costs only its marginal template scan, not a second
planes+upload pass.
"""

import copy
import json
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

from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.pipeline.multi_model import MultiModelPoseDetection
from linemod_tpu.pipeline.pose_detection import PoseDetection

N_FRAMES = 30
REPEATS = 3


def stream_rate(fn, n=N_FRAMES):
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        ts.append((time.perf_counter() - t0) / n)
    return 1.0 / float(np.median(ts))


def main():
    ex = os.path.join(REPO, "example")
    cam, settings = load_settings(os.path.join(ex, "linemod_settings.yml"))
    base_bank = TemplateBank.load(os.path.join(ex, "banks", "lagergehaeuse.npz"))
    props0 = load_model_properties(os.path.join(ex, "models", "lagergehaeuse.ply"))
    color = cv2.imread(os.path.join(ex, "benchmark", "img0.png"))
    depth = cv2.imread(
        os.path.join(ex, "benchmark", "depth0.png"), cv2.IMREAD_ANYDEPTH
    )

    det1 = PoseDetection(base_bank, cam, settings, props0)
    det1.detect(color, depth, 1)
    t_single = stream_rate(lambda: det1.detect(color, depth, 1))

    results = {
        "note": (
            "Synchronous detect/detect_all rate (one frame in flight — the "
            "per-call transport round trip is included, so these are "
            "latency-bound on this tunnel; the streamed single-class rate "
            "is bench.py's headline). Classes are shape-identical copies "
            "of the 1950-template fixture bank."
        ),
        "single_class_detect_fps": round(t_single, 2),
        "multi": [],
    }
    print(f"single-class detect: {t_single:.2f} fps")

    for n_classes in (2, 3):
        banks = {}
        props = {}
        for i in range(n_classes):
            cid = base_bank.class_id if i == 0 else f"{base_bank.class_id}_{i}"
            b = copy.copy(base_bank)
            b.class_id = cid
            banks[cid] = b
            props[cid] = props0
        det = MultiModelPoseDetection(banks, cam, settings, props)
        det.detect_all(color, depth)
        rate = stream_rate(lambda: det.detect_all(color, depth))
        n_poses = {k: len(v) for k, v in det.detect_all(color, depth).items()}
        results["multi"].append({
            "n_classes": n_classes,
            "total_templates": base_bank.num_templates * n_classes,
            "detect_all_fps": round(rate, 2),
            "poses_per_class": n_poses,
        })
        print(f"{n_classes} classes: detect_all {rate:.2f} fps, poses {n_poses}")

    with open(os.path.join(REPO, "MULTIMODEL_PERF.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote MULTIMODEL_PERF.json")


if __name__ == "__main__":
    main()
