"""Scaling-efficiency evidence for template-bank sharding.

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so this script produces the two honest halves of the
scaling story:

1. MEASURED on the real chip: per-frame device time of the full match
   program at bank sizes 256..4096 — the per-template cost (the tp-sharded
   part) vs the fixed per-frame cost (planes precompute + top-k + fine, which
   replicate per device).
2. MODELED strong scaling at tp = 2/4/8 from those measurements plus the
   communication term: the sharded matcher's only collective is one
   all_gather of 5 arrays x top_k f32 per device (~10 KB at top_k=512),
   <10 us on ICI — negligible against the ms-scale compute.

Bit-identical correctness of the sharded matcher vs the single-device path
at tp in {2,4,8} is separately proven on the virtual 8-device CPU mesh
(tests/test_parallel.py); the real-shape program is exercised by
__graft_entry__.dryrun_multichip (2048 templates, 640x480).
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

import jax.numpy as jnp

from linemod_tpu.models.template_bank import make_synthetic_bank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates

N_FRAMES = 30
SIZES = [256, 512, 1024, 2048, 4096]


def measure(n_templates: int) -> float:
    bank = make_synthetic_bank(n_templates, bbox_wh=96, image_wh=(640, 480))
    use_pallas = jax.default_backend() == "tpu"
    cfg = MatchConfig(
        width=640,
        height=480,
        top_k=512,
        template_chunk=min(256, n_templates),
        use_pallas=use_pallas,
    )
    state = build_match_state(bank, cfg)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    np.asarray(match_templates(state, color, depth)["similarity"])  # compile
    t0 = time.perf_counter()
    outs = [match_templates(state, color, depth) for _ in range(N_FRAMES)]
    np.asarray(outs[-1]["similarity"])
    return (time.perf_counter() - t0) / N_FRAMES


def main():
    times = {}
    for n in SIZES:
        times[n] = measure(n)
        print(f"bank {n:5d} templates: {times[n] * 1e3:7.2f} ms/frame")

    # linear fit: T(N) = fixed + per_template * N
    ns = np.array(SIZES, float)
    ts = np.array([times[n] for n in SIZES])
    per_template, fixed = np.polyfit(ns, ts, 1)
    print(f"\nfit: fixed {fixed * 1e3:.2f} ms + {per_template * 1e6:.3f} us/template")

    # modeled strong scaling of the 2048-template workload
    comm = 10e-6  # one ~10 KB all_gather per frame on ICI
    t1 = fixed + per_template * 2048
    rows = []
    for tp in [1, 2, 4, 8]:
        t = fixed + per_template * 2048 / tp + (comm if tp > 1 else 0.0)
        eff = t1 / (tp * t)
        rows.append((tp, t * 1e3, 100.0 * eff))
        print(f"tp={tp}: modeled {t * 1e3:6.2f} ms/frame, efficiency {100 * eff:5.1f}%")

    out = {
        "measured_ms": {str(k): v * 1e3 for k, v in times.items()},
        "fit": {"fixed_ms": fixed * 1e3, "per_template_us": per_template * 1e6},
        "modeled_strong_scaling_2048": [
            {"tp": tp, "ms_per_frame": t, "efficiency_pct": e} for tp, t, e in rows
        ],
    }
    with open(os.path.join(REPO, "scaling_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote scaling_results.json")


if __name__ == "__main__":
    main()
