"""Pallas coarse-scan kernel vs the XLA gather path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from linemod_tpu.models.template_bank import make_synthetic_bank
from linemod_tpu.ops.matching import MatchConfig, _planes_3d, build_match_state
from linemod_tpu.ops.similarity_pallas import TILE_H, TILE_W, coarse_scores_pallas


def test_pallas_matches_gather_path(rng):
    n = 32
    bank = make_synthetic_bank(n, seed=3, bbox_wh=48)
    cfg = MatchConfig(width=640, height=480, template_chunk=n)
    state = build_match_state(bank, cfg)

    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    planes = _planes_3d(
        color[::2, ::2] if False else jnp.asarray(np.asarray(color)[::2, ::2]),
        depth[::2, ::2],
        cfg.t_coarse,
        state.max_cells_coarse,
        False,
    )

    # gather reference
    ch, cw, rows, stride = state.coarse_shape
    flat = np.asarray(planes).reshape(-1)
    off = np.asarray(state.off_coarse)
    grid = (
        np.arange(ch)[:, None] * stride + np.arange(cw)[None, :]
    ).reshape(-1)
    ref = flat[off[:, :, None] + grid[None, None, :]].astype(np.int64).sum(1)

    tiles = np.asarray(
        coarse_scores_pallas(planes, state.off3_coarse, interpret=True)
    )
    got = tiles[:, :ch, :cw].reshape(n, -1)
    np.testing.assert_array_equal(got, ref)


def test_pallas_invalid_features_contribute_zero(rng):
    bank = make_synthetic_bank(4, seed=1, bbox_wh=32)
    bank.valid1[:, 10:] = False  # only 10 valid features
    cfg = MatchConfig(width=640, height=480, template_chunk=4)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (240, 320, 3)).astype(np.float32))
    depth = jnp.asarray(np.zeros((240, 320), np.float32))
    planes = _planes_3d(color, depth, cfg.t_coarse, state.max_cells_coarse, False)
    tiles = np.asarray(coarse_scores_pallas(planes, state.off3_coarse, interpret=True))
    # max possible score = 10 features * response 4
    assert tiles.max() <= 40
