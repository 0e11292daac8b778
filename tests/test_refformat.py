"""Reference on-disk bank format round trip (linemod_templates.yml.gz +
linemod_tempPosFile.bin — src/HighLevelLinemod.cpp:256-320): a migrating
user's bank must survive export -> import with detection-identical
behavior."""

import os

import numpy as np
import jax.numpy as jnp

from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates
from linemod_tpu.utils.refformat import export_reference_bank, import_reference_bank

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "example"
)


def _roundtrip(bank, tmp_path):
    export_reference_bank(bank, str(tmp_path))
    return import_reference_bank(str(tmp_path))


def test_fixture_bank_roundtrip_fields(tmp_path):
    bank = TemplateBank.load(os.path.join(EXAMPLE, "banks", "lagergehaeuse.npz"))
    got = _roundtrip(bank, tmp_path)
    assert got.class_id == bank.class_id
    assert got.num_templates == bank.num_templates
    np.testing.assert_array_equal(got.bbox, bank.bbox)
    np.testing.assert_array_equal(got.valid0, bank.valid0)
    np.testing.assert_array_equal(got.feat0[got.valid0], bank.feat0[bank.valid0])
    np.testing.assert_array_equal(got.feat1[got.valid1], bank.feat1[bank.valid1])
    np.testing.assert_allclose(got.z, bank.z, atol=1e-4)
    np.testing.assert_allclose(got.quat, bank.quat, atol=1e-6)
    # medianDepth is uint16 in the reference struct
    np.testing.assert_allclose(got.median_depth, np.round(bank.median_depth))
    np.testing.assert_allclose(got.hull, bank.hull)


def test_fixture_bank_roundtrip_detection_identical(tmp_path, rng):
    bank = TemplateBank.load(os.path.join(EXAMPLE, "banks", "lagergehaeuse.npz"))
    got = _roundtrip(bank, tmp_path)
    cfg = MatchConfig(top_k=64, template_chunk=256)
    s_ref = build_match_state(bank, cfg)
    s_got = build_match_state(got, cfg)
    color = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)).astype(np.float32))
    depth = jnp.zeros((480, 640), jnp.float32)
    a = match_templates(s_ref, color, depth)
    b = match_templates(s_got, color, depth)
    for k in ("template_id", "x", "y", "similarity", "valid"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_multi_class_pair_roundtrip(tmp_path):
    """The reference writes EVERY model into one pair; a 2-class pair must
    round-trip with per-class template runs intact."""
    from linemod_tpu.models.template_bank import make_synthetic_bank
    from linemod_tpu.utils.refformat import (
        export_reference_banks,
        import_reference_banks,
    )

    a = make_synthetic_bank(6, seed=1)
    a.class_id = "a.ply"
    b = make_synthetic_bank(10, seed=2, bbox_wh=32)
    b.class_id = "b.ply"
    export_reference_banks([a, b], str(tmp_path))
    got = import_reference_banks(str(tmp_path))
    assert sorted(got) == ["a.ply", "b.ply"]
    for src in (a, b):
        dst = got[src.class_id]
        assert dst.num_templates == src.num_templates
        np.testing.assert_array_equal(dst.bbox, src.bbox)
        np.testing.assert_array_equal(
            dst.feat0[dst.valid0], src.feat0[src.valid0]
        )
        np.testing.assert_allclose(dst.quat, src.quat, atol=1e-6)


def test_dual_bank_roundtrip(tmp_path):
    bank = TemplateBank.load(
        os.path.join(EXAMPLE, "banks_dual", "lagergehaeuse.npz")
    )
    got = _roundtrip(bank, tmp_path)
    assert got.dual_modality
    np.testing.assert_array_equal(got.nvalid0, bank.nvalid0)
    np.testing.assert_array_equal(
        got.nfeat0[got.nvalid0], bank.nfeat0[bank.nvalid0]
    )
    np.testing.assert_array_equal(
        got.nfeat1[got.nvalid1], bank.nfeat1[bank.nvalid1]
    )
