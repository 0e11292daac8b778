"""Real-TPU parity check: Pallas coarse scan vs XLA gather path.

Compiles both paths of match_templates on the actual TPU backend and asserts
bit-identical candidate sets on a synthetic bank + random frame. Run directly
or via tests/test_tpu_hw.py (gated behind LINEMOD_TPU_HW_TESTS=1 because
remote-TPU compiles are slow).
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from linemod_tpu.models.template_bank import make_synthetic_bank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    bank = make_synthetic_bank(512, bbox_wh=64)
    cfg = MatchConfig(width=640, height=480, top_k=128, template_chunk=256)
    state_g = build_match_state(bank, cfg)
    state_p = build_match_state(bank, dataclasses.replace(cfg, use_pallas=True))

    rng = np.random.default_rng(7)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))

    t0 = time.time()
    out_p = jax.tree.map(np.asarray, match_templates(state_p, color, depth))
    t_pallas_compile = time.time() - t0
    out_g = jax.tree.map(np.asarray, match_templates(state_g, color, depth))

    for k in ("template_id", "x", "y", "similarity", "valid"):
        if not np.array_equal(out_p[k], out_g[k]):
            diff = np.flatnonzero(out_p[k] != out_g[k])
            raise AssertionError(
                f"mismatch in {k} at {diff[:10]}: "
                f"pallas={out_p[k][diff[:10]]} gather={out_g[k][diff[:10]]}"
            )

    # timing (steady state, Pallas vs gather, coarse scan dominated)
    def timeit(state):
        match_templates(state, color, depth)["similarity"].block_until_ready()
        t0 = time.time()
        n = 10
        for _ in range(n):
            r = match_templates(state, color, depth)
        r["similarity"].block_until_ready()
        return (time.time() - t0) / n

    tp = timeit(state_p)
    tg = timeit(state_g)
    print(
        f"PARITY OK: 512 templates, top128 identical. "
        f"pallas {tp*1e3:.1f} ms vs gather {tg*1e3:.1f} ms "
        f"(compile {t_pallas_compile:.0f}s)"
    )


if __name__ == "__main__":
    main()
