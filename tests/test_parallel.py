"""Sharded-matching tests on a virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from linemod_tpu.config import CameraParameters, ModelProperties, TemplateSettings
from linemod_tpu.models.template_bank import build_template_bank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates
from linemod_tpu.ops.rasterizer import mesh_to_arrays, render_views
from linemod_tpu.parallel.mesh import make_mesh
from linemod_tpu.parallel.sharded_match import make_sharded_matcher, shard_state
from linemod_tpu.pipeline.pose_detection import _pad_bank
from linemod_tpu.utils.geometry import quat_to_mat

from test_matching import cube_mesh


@pytest.fixture(scope="module")
def cube_bank_scene():
    cam = CameraParameters(fx=500.0, fy=500.0, cx=320, cy=240, width=640, height=480)
    settings = TemplateSettings(
        distance_start=600, distance_stop=600, subdivisions=0,
        angle_start=-45, angle_stop=45, angle_step=45,
    )
    props = ModelProperties(planes_of_symmetry=(1.0, 1.0, 1.0))
    mesh = cube_mesh()
    bank = build_template_bank(mesh, "cube", cam, settings, props)
    t = 4
    rot = quat_to_mat(bank.quat[t]).astype(np.float32)
    depth, color = render_views(
        mesh_to_arrays(mesh), rot[None], np.array([[0, 0, 600.0]], np.float32),
        cam, with_color=True,
    )
    color = np.asarray(color)[0] * 255.0
    depth = np.asarray(depth)[0]
    return bank, color, depth


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_match_equals_single(cube_bank_scene):
    bank, color, depth = cube_bank_scene
    cfg = MatchConfig(top_k=64, template_chunk=2, threshold=80.0)
    padded = _pad_bank(bank, 16)  # 16 templates over tp=8 -> 2 per shard
    state = build_match_state(padded, cfg)

    single = {k: np.asarray(v) for k, v in match_templates(
        state, jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32)
    ).items()}

    mesh = make_mesh(8, dp=1)
    sstate = shard_state(state, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(
        jnp.asarray(color[None], jnp.float32), jnp.asarray(depth[None], jnp.float32)
    )
    shard = {k: np.asarray(v)[0] for k, v in out.items()}

    sv = single["valid"]
    pv = shard["valid"]
    assert sv.sum() == pv.sum() > 0
    # bit-identical output arrays: the sharded per-shard cut + merge
    # reproduces the single-device candidate list (ties resolve by global
    # flat index in both), band-sharded planes reassemble exactly, and the
    # sliced fine refine sees the same candidates
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(single[k], shard[k], err_msg=k)


def test_band_planes_reassemble_exactly(cube_bank_scene):
    """The band-sharded planes path must tile back to the full planes."""
    from linemod_tpu.ops.gradients import quantize_color_gradients
    from linemod_tpu.ops.spread import (
        linear_plane_shape,
        linearized_response_planes,
        linearized_response_planes_band,
    )

    _, color, _ = cube_bank_scene
    quant = quantize_color_gradients(jnp.asarray(color, jnp.float32))[0]
    for t, mc in [(2, 49), (8, 7), (5, 21)]:
        h, w = quant.shape
        hp, wp = h - h % t, w - w % t
        _, _, rows, stride = linear_plane_shape(hp, wp, t, mc)
        full = np.asarray(
            linearized_response_planes(quant[:hp, :wp], t, mc)
        ).reshape(-1, rows, stride)
        for n_bands in (2, 4, 8):
            bands = [
                np.asarray(
                    linearized_response_planes_band(quant, t, mc, b, n_bands)
                ).reshape(-1, rows // n_bands, stride)
                for b in range(n_bands)
            ]
            got = np.concatenate(bands, axis=1)
            np.testing.assert_array_equal(got, full, err_msg=f"t={t} bands={n_bands}")


def test_sharded_chunk_larger_than_shard(cube_bank_scene):
    """A tp shard smaller than template_chunk must clamp, not crash
    (regression: tp=8 over a 16-template bank with template_chunk=16)."""
    bank, color, depth = cube_bank_scene
    cfg = MatchConfig(top_k=64, template_chunk=16, threshold=80.0)
    padded = _pad_bank(bank, 16)
    state = build_match_state(padded, cfg)
    single = {k: np.asarray(v) for k, v in match_templates(
        state, jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32)
    ).items()}
    mesh = make_mesh(8, dp=1)  # n_shard = 2 < template_chunk = 16
    sstate = shard_state(state, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(
        jnp.asarray(color[None], jnp.float32), jnp.asarray(depth[None], jnp.float32)
    )
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(single[k], np.asarray(out[k])[0], err_msg=k)


def test_sharded_batch_dp(cube_bank_scene):
    bank, color, depth = cube_bank_scene
    cfg = MatchConfig(top_k=64, template_chunk=2)
    padded = _pad_bank(bank, 16)
    state = build_match_state(padded, cfg)
    mesh = make_mesh(8, dp=2)  # 2-way data parallel x 4-way template parallel
    sstate = shard_state(state, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    colors = jnp.asarray(np.stack([color, np.zeros_like(color)]), jnp.float32)
    depths = jnp.asarray(np.stack([depth, np.zeros_like(depth)]), jnp.float32)
    out = {k: np.asarray(v) for k, v in matcher(colors, depths).items()}
    assert out["valid"][0].sum() > 0  # object frame has matches
    assert out["valid"][1].sum() == 0  # empty frame has none


def test_two_round_cut_fast_path_equals_single(cube_bank_scene):
    """With top_k=512 and tp=8 the sharded matcher takes the two-round cut
    (local top-256, merge, saturation proof); output must stay bit-identical
    to the single-device path. (tp=4 uses the single-round cut — measured
    faster in the fused program — so tp=8 is the two-round test point.)"""
    bank, color, depth = cube_bank_scene
    cfg = MatchConfig(top_k=512, template_chunk=2, threshold=80.0)
    padded = _pad_bank(bank, 16)
    state = build_match_state(padded, cfg)
    single = {k: np.asarray(v) for k, v in match_templates(
        state, jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32)
    ).items()}
    mesh = make_mesh(8, dp=1)
    sstate = shard_state(state, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(
        jnp.asarray(color[None], jnp.float32), jnp.asarray(depth[None], jnp.float32)
    )
    assert bool(np.asarray(out["cut_exact"]).all())  # proof passed: no retry
    shard = {k: np.asarray(v)[0] for k, v in out.items() if k != "cut_exact"}
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(single[k], shard[k], err_msg=k)


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_sharded_prefilter_cut_equals_single(rng, tp):
    """The distributed prefiltered cut (per-shard maxes -> replicated
    selection -> selected-slice rescan -> exact merge) must be bit-identical
    to the single-device dense path at every tp whenever its exactness
    proof holds."""
    import dataclasses

    from linemod_tpu.models.template_bank import make_synthetic_bank

    bank = make_synthetic_bank(64, seed=11, bbox_wh=48)
    cfg = MatchConfig(top_k=32, template_chunk=8, threshold=80.0)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)
    single = {
        k: np.asarray(v) for k, v in match_templates(state, color, depth).items()
    }

    cfg_p = dataclasses.replace(cfg, prefilter_sel=40, scan_chunk=16)
    state_p = build_match_state(bank, cfg_p)
    mesh = make_mesh(tp, dp=1)
    sstate = shard_state(state_p, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(color[None], depth[None])
    assert bool(np.asarray(out["cut_exact"]).all())
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(
            single[k], np.asarray(out[k])[0], err_msg=k
        )


def test_sharded_streaming_cut_equals_single(rng):
    """Sharded x streaming composition: when a shard's template count
    exceeds scan_chunk, the exact per-shard cut streams chunks
    (candidate_cut_streaming inside the shard_map body) and must stay
    bit-identical to the single-device dense path."""
    import dataclasses

    from linemod_tpu.models.template_bank import make_synthetic_bank

    bank = make_synthetic_bank(64, seed=11, bbox_wh=48)
    cfg = MatchConfig(top_k=32, template_chunk=8, threshold=80.0)
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)
    single = {
        k: np.asarray(v) for k, v in match_templates(state, color, depth).items()
    }
    # tp=4 -> 16-template shards; scan_chunk=8 -> 2 streamed chunks per shard
    cfg_s = dataclasses.replace(cfg, scan_chunk=8)
    mesh = make_mesh(4, dp=1)
    sstate = shard_state(build_match_state(bank, cfg_s), mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(color[None], depth[None])
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(
            single[k], np.asarray(out[k])[0], err_msg=k
        )


def test_sharded_prefilter_saturated_retry(rng):
    """Tied template maxes defeat the prefilter's selection proof; the
    exact_only retry matcher must then reproduce the single-device result
    (sharded_detect host-retry shape)."""
    import dataclasses

    from linemod_tpu.models.template_bank import make_synthetic_bank
    from linemod_tpu.parallel.sharded_match import sharded_detect

    bank = make_synthetic_bank(64, seed=11, bbox_wh=48)
    for f in ("feat0", "valid0", "feat1", "valid1"):
        arr = getattr(bank, f)
        arr[:] = arr[:1]
    cfg = MatchConfig(
        top_k=16, template_chunk=8, threshold=0.0, prefilter_sel=20,
        scan_chunk=16,
    )
    state = build_match_state(bank, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)
    single = {
        k: np.asarray(v)
        for k, v in match_templates(
            build_match_state(
                bank, dataclasses.replace(cfg, prefilter_sel=0, scan_chunk=0)
            ),
            color, depth,
        ).items()
    }
    mesh = make_mesh(4, dp=1)
    sstate = shard_state(state, mesh)
    fast = make_sharded_matcher(sstate, mesh)
    exact = make_sharded_matcher(sstate, mesh, exact_only=True)
    assert not bool(np.asarray(fast(color[None], depth[None])["cut_exact"]).all())
    out = sharded_detect(fast, exact, color[None], depth[None])
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(
            single[k], np.asarray(out[k])[0], err_msg=k
        )


def test_two_round_cut_saturated_fallback(cube_bank_scene):
    """A bank whose matches all live in ONE shard saturates that shard's
    round-1 top-m, so the exactness proof fails and the lax.cond fallback
    (full-K local cut) must produce the single-device result."""
    from linemod_tpu.models.template_bank import make_synthetic_bank

    bank, color, depth = cube_bank_scene
    # shard 0 (first eighth) holds the real cube templates; the remaining
    # templates are inert (no features -> similarity 0 everywhere)
    padded = _pad_bank(bank, 40)  # 9 real + 31 inert = 40 -> 5 per tp=8 shard
    cfg = MatchConfig(top_k=512, template_chunk=2, threshold=80.0)
    state = build_match_state(padded, cfg)
    single = {k: np.asarray(v) for k, v in match_templates(
        state, jnp.asarray(color, jnp.float32), jnp.asarray(depth, jnp.float32)
    ).items()}
    mesh = make_mesh(8, dp=1)
    sstate = shard_state(state, mesh)
    from linemod_tpu.parallel.sharded_match import sharded_detect

    fast = make_sharded_matcher(sstate, mesh)
    exact = make_sharded_matcher(sstate, mesh, exact_only=True)
    c = jnp.asarray(color[None], jnp.float32)
    d = jnp.asarray(depth[None], jnp.float32)
    # the concentrated bank must actually defeat the round-1 proof
    assert not bool(np.asarray(fast(c, d)["cut_exact"]).all())
    out = sharded_detect(fast, exact, c, d)
    shard = {k: np.asarray(v)[0] for k, v in out.items() if k != "cut_exact"}
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(single[k], shard[k], err_msg=k)
