"""Rasterizer tests against closed-form projections (small synthetic scenes)."""

import numpy as np
import pytest

from linemod_tpu.ops.rasterizer import MeshArrays, mesh_to_arrays, render
from linemod_tpu.utils.ply import Mesh

W = H = 128
FX = FY = 128.0
CX = CY = 64.0


def square_mesh(z=600.0, half=100.0, slant=0.0):
    """Two triangles forming a square x,y in [-half, half] at depth z (+ slant*x)."""
    v = np.array(
        [
            [-half, -half, z - slant * half],
            [half, -half, z + slant * half],
            [half, half, z + slant * half],
            [-half, half, z - slant * half],
        ],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return Mesh(vertices=v, colors=colors, indices=f)


def do_render(mesh, z_r=None, t=None, **kw):
    r = np.eye(3, dtype=np.float32) if z_r is None else z_r
    t = np.zeros(3, np.float32) if t is None else t
    return render(
        mesh_to_arrays(mesh, pad_faces_to=8),
        r,
        t,
        FX,
        FY,
        CX,
        CY,
        width=W,
        height=H,
        face_block=8,
        band_rows=32,
        **kw,
    )


class TestDepth:
    def test_flat_square_depth_and_coverage(self):
        d = np.asarray(do_render(square_mesh(z=600.0, half=100.0)))
        # projected half-extent = 100 * 128 / 600 = 21.33 px around center
        assert d[64, 64] == pytest.approx(600.0, abs=0.1)
        assert d[64, 64 + 20] == pytest.approx(600.0, abs=0.1)
        assert d[64, 64 + 23] == 0.0
        assert d[0, 0] == 0.0
        # coverage area ~ (2*21.33)^2
        area = np.count_nonzero(d)
        assert abs(area - (2 * 21.333) ** 2) < 180

    def test_slanted_plane_interpolation(self):
        # depth varies linearly with x in 3D: z = 600 + 0.5 * x
        d = np.asarray(do_render(square_mesh(z=600.0, half=100.0, slant=0.5)))
        # At pixel u, ray x/z = (u-cx)/fx; plane: z = 600 + 0.5 x
        # => z = 600 / (1 - 0.5*(u-cx)/fx)
        for du in (-15, 0, 10):
            expect = 600.0 / (1.0 - 0.5 * du / FX)
            assert d[64, 64 + du] == pytest.approx(expect, rel=1e-4)

    def test_occlusion_zbuffer(self):
        near = square_mesh(z=500.0, half=30.0)
        far = square_mesh(z=800.0, half=100.0)
        both = Mesh(
            vertices=np.concatenate([near.vertices, far.vertices]),
            colors=np.concatenate([near.colors, far.colors]),
            indices=np.concatenate([near.indices, far.indices + 4]),
        )
        d = np.asarray(do_render(both))
        assert d[64, 64] == pytest.approx(500.0, abs=0.1)
        # outside the near square but inside the far one
        assert d[64, 64 + 12] == pytest.approx(800.0, abs=0.1)

    def test_backface_still_rendered(self):
        # reference has no backface culling; flip the winding
        m = square_mesh()
        m.indices = m.indices[:, ::-1].copy()
        d = np.asarray(do_render(m))
        assert d[64, 64] == pytest.approx(600.0, abs=0.1)

    def test_rotation_translation(self):
        # translate the square off-center by +60mm in x at z=600 -> +12.8px
        d = np.asarray(do_render(square_mesh(half=50.0), t=np.array([60, 0, 0], np.float32)))
        assert d[64, 64 + 13] == pytest.approx(600.0, abs=0.1)
        assert d[64, 64 - 13] == 0.0

    def test_crop_origin(self):
        full = np.asarray(do_render(square_mesh(half=100.0)))
        crop = np.asarray(do_render(square_mesh(half=100.0), origin=(32.0, 32.0)))
        np.testing.assert_allclose(crop[:96, :96], full[32:, 32:], atol=1e-3)


class TestColor:
    def test_color_interpolation(self):
        d, c = do_render(square_mesh(), with_color=True)
        c = np.asarray(c)
        # center of the square: upper-left triangle (0,1,2) blends all three
        assert c[64, 64].sum() > 0.5
        # background black
        np.testing.assert_allclose(c[0, 0], 0.0)
        # near vertex 0 (-100,-100) -> projected (64-21.3, 64-21.3): red-ish
        px = c[64 - 20, 64 - 20]
        assert px[0] > 0.6

    def test_white_mesh_renders_white(self):
        m = square_mesh()
        m.colors = np.ones_like(m.colors)
        d, c = do_render(m, with_color=True)
        c = np.asarray(c)
        mask = np.asarray(d) > 0
        np.testing.assert_allclose(c[mask], 1.0, atol=1e-4)
