"""Probe: does Mosaic lower pltpu.roll (dynamic_rotate) on uint8 data?

If yes, the fine-refine kernel can roll BEFORE the int32 convert, cutting
its per-feature vector-op count ~3x. Run with no args on the real chip;
`--interpret` validates semantics anywhere. Throwaway diagnostic."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv


def kernel(s_ref, x_ref, o_ref):
    sy = s_ref[0]
    sx = s_ref[1]
    blk = x_ref[...]
    blk = pltpu.roll(blk, sy, axis=0)
    blk = pltpu.roll(blk, sx, axis=1)
    o_ref[...] = blk


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (16, 256), dtype=np.uint8)
    for sy, sx in [(0, 0), (3, 17), (15, 255), (8, 128)]:
        out = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, 256), jnp.uint8),
            interpret=INTERPRET,
        )(jnp.asarray([sy, sx], jnp.int32), jnp.asarray(x))
        want = np.roll(np.roll(x, sy, axis=0), sx, axis=1)
        ok = np.array_equal(np.asarray(out), want)
        print(f"shift=({sy},{sx}) uint8 roll:", "OK" if ok else "WRONG")


if __name__ == "__main__":
    main()
