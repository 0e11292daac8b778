"""Time exact candidate-cut structures on the real chip.

The flat lax.top_k(10.5M, 512) costs ~5 ms — it dominates the frame. All
variants here are EXACT (identical result incl. tie order by global flat
index): any global top-K element is inside its block's top-K, and stable
concat-then-merge preserves (sim desc, flat idx asc). Throwaway diagnostic
feeding the production cut choice in ops/matching.py."""

import functools
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

K_REPEAT = 30
N, G = 2048, 40 * 128  # coarse grid of the 640x480 shape
K = 512


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


def flat_exact(i, sim):
    s, idx = jax.lax.top_k((sim + i.astype(jnp.float32)).reshape(-1), K)
    return s.sum() + idx.sum().astype(jnp.float32)


def blocked_exact(i, sim, rows_per_block):
    sim = sim + i.astype(jnp.float32)
    nb = N // rows_per_block
    blk = sim.reshape(nb, rows_per_block * G)
    s, idx = jax.lax.top_k(blk, K)  # [nb, K] batched exact
    gidx = idx + (jnp.arange(nb, dtype=jnp.int32) * (rows_per_block * G))[:, None]
    ms, mi = jax.lax.top_k(s.reshape(-1), K)
    return ms.sum() + gidx.reshape(-1)[mi].sum().astype(jnp.float32)


def approx(i, sim):
    s, idx = jax.lax.approx_max_k(
        (sim + i.astype(jnp.float32)).reshape(-1), K,
        recall_target=0.99, aggregate_to_topk=True,
    )
    return s.sum() + idx.sum().astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    sim = jnp.asarray(rng.uniform(-1, 100, (N, G)).astype(np.float32))
    ovh = device_time(lambda i, x: x * i.astype(jnp.float32), jnp.float32(1.0))
    print(f"overhead {ovh*1e3:.3f} ms; input {N}x{G} = {N*G/1e6:.1f}M f32")
    t = device_time(flat_exact, sim) - ovh
    print(f"flat exact top_k: {t*1e3:.3f} ms")
    for rpb in (256, 64, 16, 4):
        t = device_time(functools.partial(blocked_exact, rows_per_block=rpb), sim) - ovh
        print(f"blocked exact rows/block={rpb} ({N//rpb} blocks): {t*1e3:.3f} ms")
    t = device_time(approx, sim) - ovh
    print(f"approx_max_k (recall .99): {t*1e3:.3f} ms")

    # correctness of the blocked structure vs flat, incl tie order
    simq = jnp.asarray(
        (rng.integers(0, 50, (N, G)).astype(np.float32))  # heavy ties
    )
    fs, fi = jax.lax.top_k(simq.reshape(-1), K)
    for rpb in (256, 64, 16, 4):
        nb = N // rpb
        blk = simq.reshape(nb, rpb * G)
        s, idx = jax.lax.top_k(blk, K)
        gidx = idx + (jnp.arange(nb, dtype=jnp.int32) * (rpb * G))[:, None]
        ms, mi = jax.lax.top_k(s.reshape(-1), K)
        vals_ok = np.array_equal(np.asarray(ms), np.asarray(fs))
        idx_ok = np.array_equal(np.asarray(gidx.reshape(-1)[mi]), np.asarray(fi))
        print(f"rpb={rpb}: values == flat: {vals_ok}; tie order == flat: {idx_ok}")


if __name__ == "__main__":
    main()
