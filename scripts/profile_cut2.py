"""In-program cut comparison: full match_templates T1 on the real chip with
flat exact / blocked exact / approx candidate cuts. Throwaway diagnostic."""

import dataclasses
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
from linemod_tpu.pipeline.pose_detection import _pad_bank

K_REPEAT = 100


def device_time(body, *examples):
    @jax.jit
    def run(*xs):
        def step(acc, i):
            return acc + body(i, *xs), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K_REPEAT))[0]

    np.asarray(run(*examples))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*examples))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_REPEAT


def main():
    use_pallas = jax.default_backend() == "tpu"
    ovh = device_time(lambda i, x: x * i.astype(jnp.float32), jnp.float32(1.0))
    print(f"overhead {ovh*1e3:.3f} ms")
    bank = _pad_bank(
        make_synthetic_bank(2048, bbox_wh=96, image_wh=(640, 480)), 256
    )
    base = MatchConfig(
        width=640, height=480, top_k=512, template_chunk=256,
        use_pallas=use_pallas,
    )
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)

    for name, cfg in [
        ("flat exact", base),
        ("blocked 256", dataclasses.replace(base, cut_block_rows=256)),
        ("blocked 64", dataclasses.replace(base, cut_block_rows=64)),
        ("blocked 16", dataclasses.replace(base, cut_block_rows=16)),
        ("approx", dataclasses.replace(base, approx_topk=True)),
    ]:
        state = build_match_state(bank, cfg)
        t = device_time(
            lambda i, c, d, _s=state: match_templates(
                _s, c + i.astype(jnp.float32), d
            )["similarity"].sum(),
            color, depth,
        ) - ovh
        print(f"T1 with {name:12s}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
