"""Probe pltpu.bitcast semantics for uint8 <-> int32 (sublane packing):
shape mapping and byte order, interpret vs real chip. Throwaway diagnostic."""

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


def kernel(x_ref, o_ref, o2_ref):
    w = pltpu.bitcast(x_ref[...], jnp.int32)  # [4?, 256]
    o_ref[...] = w
    o2_ref[...] = pltpu.bitcast(w, jnp.uint8)  # round-trip


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (16, 256), dtype=np.uint8)
    out, out2 = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, 256), jnp.int32),
            jax.ShapeDtypeStruct((16, 256), jnp.uint8),
        ],
        interpret=INTERPRET,
    )(jnp.asarray(x))
    out = np.asarray(out)
    # hypothesis: word(r, c) packs rows 4r..4r+3 at column c, row 4r = LSB
    lsb = x.reshape(4, 4, 256).astype(np.uint32)
    want_lsb = (lsb[:, 0] | (lsb[:, 1] << 8) | (lsb[:, 2] << 16) | (lsb[:, 3] << 24)).astype(np.int32)
    want_msb = (lsb[:, 3] | (lsb[:, 2] << 8) | (lsb[:, 1] << 16) | (lsb[:, 0] << 24)).astype(np.int32)
    print("lsb-first (row 4r = low byte):", np.array_equal(out, want_lsb))
    print("msb-first (row 4r = high byte):", np.array_equal(out, want_msb))
    print("round-trip:", np.array_equal(np.asarray(out2), x))
    if not (np.array_equal(out, want_lsb) or np.array_equal(out, want_msb)):
        print("word[0,0]:", hex(out[0, 0] & 0xFFFFFFFF), "col0 rows:", x[:4, 0])


if __name__ == "__main__":
    main()
