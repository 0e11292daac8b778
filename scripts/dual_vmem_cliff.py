"""Measure the dual-modality fine-refine VMEM cliff (VERDICT r4 weak #7).

The Pallas fine kernel needs the fine-level planes VMEM-resident
(ops/matching.FINE_PALLAS_VMEM_LIMIT). Dual 640x480 planes (~10.7 MB) fit;
any larger dual frame silently drops to the XLA gather path. This script
measures BOTH paths at the shipped dual shape on the real chip — by forcing
the fallback via the (patchable) limit — and writes DUAL_VMEM.json so the
fallback's cost is a committed number, not a surprise.
"""

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
import jax.numpy as jnp

import linemod_tpu.ops.matching as matching
from linemod_tpu.config import load_model_properties, load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.pipeline.pose_detection import PoseDetection, make_match_config
from linemod_tpu.ops.matching import build_match_state, match_templates
from linemod_tpu.pipeline.pose_detection import _pad_bank

K_REPEAT = 50


def device_time(state, color, depth):
    @jax.jit
    def run(c, d):
        def step(acc, i):
            out = match_templates(state, c + i.astype(jnp.float32), d)
            return acc + out["similarity"].sum(), None

        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K_REPEAT))[0]

    np.asarray(run(color, depth))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(color, depth))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_REPEAT


def main():
    ex = os.path.join(REPO, "example")
    cam, settings = load_settings(os.path.join(ex, "linemod_settings.yml"))
    bank = TemplateBank.load(os.path.join(ex, "banks_dual", "lagergehaeuse.npz"))
    cfg = make_match_config(cam, settings, True, bank.num_templates)
    state = build_match_state(_pad_bank(bank, cfg.template_chunk), cfg)

    color = jnp.asarray(
        cv2.imread(os.path.join(ex, "benchmark", "img0.png")).astype(np.float32)
    )
    depth = jnp.asarray(
        cv2.imread(
            os.path.join(ex, "benchmark", "depth0.png"), cv2.IMREAD_ANYDEPTH
        ).astype(np.float32)
    )

    # parity first: both paths must produce identical matches
    ref = match_templates(state, color, depth)
    t_pallas = device_time(state, color, depth)
    print(f"dual fine refine via Pallas: {t_pallas * 1e3:.2f} ms/frame")

    ref = {k: np.asarray(v) for k, v in ref.items()}
    orig_limit = matching.FINE_PALLAS_VMEM_LIMIT
    matching.FINE_PALLAS_VMEM_LIMIT = 0  # force the XLA gather fallback
    # the limit is read at TRACE time inside fine_refine, and match_templates
    # is @jax.jit with identical statics/avals — without dropping the jit
    # cache the "fallback" run would silently reuse the compiled Pallas
    # program (this exact bug shipped the first DUAL_VMEM.json: 6.803 vs
    # 6.794 ms, i.e. the same program measured twice)
    jax.clear_caches()
    try:
        state2 = build_match_state(_pad_bank(bank, cfg.template_chunk), cfg)
        got = match_templates(state2, color, depth)
        same = all(
            np.array_equal(ref[k], np.asarray(got[k]))
            for k in ("template_id", "x", "y", "similarity", "valid")
        )
        t_gather = device_time(state2, color, depth)
        print(f"dual fine refine via XLA gather fallback: "
              f"{t_gather * 1e3:.2f} ms/frame (match set identical: {same})")
    finally:
        matching.FINE_PALLAS_VMEM_LIMIT = orig_limit

    fine_planes_mb = None
    n_planes = (2 if cfg.dual_modality else 1) * 8 * cfg.t_fine ** 2 + 1
    _, _, rows, stride = state.fine_shape
    fine_planes_mb = n_planes * rows * stride / 1e6

    out = {
        "note": (
            "Dual-modality fine-refine VMEM cliff at the shipped 640x480 "
            "shape: the Pallas fine kernel requires the fine planes "
            "VMEM-resident (FINE_PALLAS_VMEM_LIMIT); larger frames drop to "
            "the XLA gather path. Both paths measured on the real chip with "
            "an identical match set, so the fallback's cost is a committed "
            "number (the whole dual frame program, not the stage alone)."
        ),
        "fine_planes_mb": round(fine_planes_mb, 2),
        "vmem_limit_mb": round(orig_limit / 1e6, 2),
        "dual_frame_ms_pallas_fine": round(t_pallas * 1e3, 3),
        "dual_frame_ms_gather_fine": round(t_gather * 1e3, 3),
        "match_set_identical": bool(same),
    }
    with open(os.path.join(REPO, "DUAL_VMEM.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote DUAL_VMEM.json")


if __name__ == "__main__":
    main()
