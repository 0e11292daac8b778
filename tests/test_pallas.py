"""Pallas scan kernels vs the XLA gather path (interpret mode on CPU).

Real-TPU Mosaic compilation + numeric equality of the same kernels is covered
by scripts/tpu_parity.py (run via tests/test_tpu_hw.py when
LINEMOD_TPU_HW_TESTS=1, and by bench.py every round).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from linemod_tpu.models.template_bank import make_synthetic_bank
from linemod_tpu.ops.matching import MatchConfig, _planes_3d, build_match_state, match_templates
from linemod_tpu.ops.similarity_pallas import coarse_scores_pallas, fine_scores_pallas


def test_pallas_matches_gather_path(rng):
    n = 32
    bank = make_synthetic_bank(n, seed=3, bbox_wh=48)
    cfg = MatchConfig(width=640, height=480, template_chunk=n)
    state = build_match_state(bank, cfg)

    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    planes = _planes_3d(
        jnp.asarray(np.asarray(color)[::2, ::2]),
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
        coarse_scores_pallas(
            planes, state.off3_coarse, state.max_cells_coarse, interpret=True
        )
    )
    got = tiles[:, :ch, :cw].reshape(n, -1)
    np.testing.assert_array_equal(got, ref)


def test_pallas_coarse_max_matches_dense_masked_max(rng):
    """coarse_max_pallas must equal the per-template masked max of the dense
    tile path (fit bounds applied, wrap garbage excluded)."""
    from linemod_tpu.ops.similarity_pallas import coarse_max_pallas

    n = 32
    bank = make_synthetic_bank(n, seed=5, bbox_wh=48)
    cfg = MatchConfig(width=640, height=480, template_chunk=n)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)
    planes = _planes_3d(
        jnp.asarray(np.asarray(color)[::2, ::2]),
        depth[::2, ::2],
        cfg.t_coarse,
        state.max_cells_coarse,
        False,
    )
    ch, cw = state.coarse_shape[0], state.coarse_shape[1]
    tiles = np.asarray(
        coarse_scores_pallas(
            planes, state.off3_coarse, state.max_cells_coarse, interpret=True
        )
    )[:, :ch, :cw]
    lim = np.asarray(state.lim_coarse)
    fits = (np.arange(ch)[None, :, None] < lim[:, 0, None, None]) & (
        np.arange(cw)[None, None, :] < lim[:, 1, None, None]
    )
    ref = np.where(fits, tiles, -1).reshape(n, -1).max(axis=1)
    got = np.asarray(
        coarse_max_pallas(
            planes, state.off3_coarse, state.lim_coarse,
            state.max_cells_coarse, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_invalid_features_contribute_zero(rng):
    bank = make_synthetic_bank(4, seed=1, bbox_wh=32)
    bank.valid1[:, 10:] = False  # only 10 valid features
    cfg = MatchConfig(width=640, height=480, template_chunk=4)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (240, 320, 3)).astype(np.float32))
    depth = jnp.asarray(np.zeros((240, 320), np.float32))
    planes = _planes_3d(color, depth, cfg.t_coarse, state.max_cells_coarse, False)
    tiles = np.asarray(
        coarse_scores_pallas(
            planes, state.off3_coarse, state.max_cells_coarse, interpret=True
        )
    )
    # max possible score = 10 features * response 4
    assert tiles.max() <= 40


def test_pallas_coarse_dual_modality_groups(rng):
    """F=128 (dual) accumulates two packed 64-feature groups; must equal the
    gather reference (and its byte lanes must not overflow across groups)."""
    n = 8
    bank = make_synthetic_bank(n, seed=11, bbox_wh=48, dual_modality=True)
    cfg = MatchConfig(width=320, height=240, template_chunk=n, t_fine=5,
                      dual_modality=True)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (120, 160, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (120, 160)).astype(np.float32))
    planes = _planes_3d(color, depth, cfg.t_coarse, state.max_cells_coarse, True)

    ch, cw, rows, stride = state.coarse_shape
    flat = np.asarray(planes).reshape(-1)
    off = np.asarray(state.off_coarse)
    grid = (np.arange(ch)[:, None] * stride + np.arange(cw)[None, :]).reshape(-1)
    ref = flat[off[:, :, None] + grid[None, None, :]].astype(np.int64).sum(1)

    assert state.off3_coarse.shape[1] == 128
    tiles = np.asarray(
        coarse_scores_pallas(
            planes, state.off3_coarse, state.max_cells_coarse, interpret=True
        )
    )
    got = tiles[:, :ch, :cw].reshape(n, -1)
    np.testing.assert_array_equal(got, ref)


def test_pallas_fine_matches_gather_path(rng):
    """fine_scores_pallas == the XLA fine-refine gather for random candidates."""
    n = 16
    bank = make_synthetic_bank(n, seed=5, bbox_wh=48)
    cfg = MatchConfig(width=640, height=480, template_chunk=n)
    state = build_match_state(bank, cfg)
    scale = (2 * cfg.t_coarse) // cfg.t_fine
    assert scale == 8

    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    planes = _planes_3d(color, depth, cfg.t_fine, state.max_cells_fine, False)

    ch, cw, rows, stride = state.coarse_shape
    _, _, rows_f, stride_f = state.fine_shape
    k = 24
    cand_t = rng.integers(0, n, k).astype(np.int32)
    lim = np.asarray(state.lim_coarse)
    cand_gy = (rng.integers(0, 10_000, k) % lim[cand_t, 0]).astype(np.int32)
    cand_gx = (rng.integers(0, 10_000, k) % lim[cand_t, 1]).astype(np.int32)

    flat = np.asarray(planes).reshape(-1)
    off = np.asarray(state.off_fine)[cand_t]  # [K, F]
    sub = (np.arange(scale)[:, None] * stride_f + np.arange(scale)[None, :]).reshape(-1)
    base = (cand_gy * scale) * stride_f + cand_gx * scale
    ref = flat[off[:, :, None] + (base[:, None] + sub[None, :])[:, None, :]].astype(np.int64).sum(1)

    base_yx = jnp.asarray(np.stack([cand_gy * scale, cand_gx * scale], axis=1))
    tiles = np.asarray(
        fine_scores_pallas(
            planes, state.off3_fine, jnp.asarray(cand_t), base_yx, interpret=True
        )
    )
    got = tiles[:, :scale, :scale].reshape(k, -1)
    np.testing.assert_array_equal(got, ref)


def test_match_templates_pallas_path_interpret(rng, monkeypatch):
    """End-to-end match_templates with use_pallas on, forced interpret mode,
    equals the gather path."""
    from jax.experimental.pallas import tpu as pltpu

    n = 16
    bank = make_synthetic_bank(n, seed=9, bbox_wh=48)
    cfg = MatchConfig(width=640, height=480, top_k=32, template_chunk=n)
    state_g = build_match_state(bank, cfg)
    state_p = build_match_state(bank, dataclasses.replace(cfg, use_pallas=True))
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    out_g = {k: np.asarray(v) for k, v in match_templates(state_g, color, depth).items()}
    with pltpu.force_tpu_interpret_mode():
        out_p = {k: np.asarray(v) for k, v in match_templates(state_p, color, depth).items()}
    for k in out_g:
        np.testing.assert_array_equal(out_p[k], out_g[k])


def test_match_templates_pallas_dual_modality_interpret(rng):
    """Dual-modality end-to-end: use_pallas (coarse scan + win=4 fine refine
    with the combined color+normal off3_fine table) == the gather path."""
    from jax.experimental.pallas import tpu as pltpu

    n = 16
    bank = make_synthetic_bank(n, seed=11, bbox_wh=48, dual_modality=True)
    cfg = MatchConfig(
        width=640, height=480, top_k=32, template_chunk=n,
        t_fine=5, dual_modality=True,
    )
    state_g = build_match_state(bank, cfg)
    state_p = build_match_state(bank, dataclasses.replace(cfg, use_pallas=True))
    # dual mode refines over a 4 x 4 sub-cell window (ceil(16 / 5))
    assert -(-2 * cfg.t_coarse // cfg.t_fine) == 4
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(400, 900, (480, 640)).astype(np.float32))
    out_g = {k: np.asarray(v) for k, v in match_templates(state_g, color, depth).items()}
    with pltpu.force_tpu_interpret_mode():
        out_p = {k: np.asarray(v) for k, v in match_templates(state_p, color, depth).items()}
    for k in out_g:
        np.testing.assert_array_equal(out_p[k], out_g[k], err_msg=k)
