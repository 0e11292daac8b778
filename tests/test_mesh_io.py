"""Multi-format mesh import (C10 parity: assimp triangulate/join/white
fallback, src/ModelImporter.cpp:15-19,64-71) — OBJ and STL round trips of
the fixture geometry against the PLY loader."""

import os
import struct

import numpy as np
import pytest

from linemod_tpu.utils.mesh_io import load_mesh, load_obj, load_stl
from linemod_tpu.utils.ply import load_ply

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_PLY = os.path.join(REPO, "example", "models", "lagergehaeuse.ply")


@pytest.fixture(scope="module")
def fixture_mesh():
    return load_ply(FIXTURE_PLY)


def write_obj(path, mesh, polygons=False):
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if mesh.normals is not None:
            for n in mesh.normals:
                f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        faces = mesh.indices
        if polygons:
            # merge triangle pairs into quads where they share an edge is
            # overkill; emit a fan-able 4-gon by repeating a vertex instead
            for a, b, c in faces:
                f.write(
                    f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1} {c+1}//{c+1}\n"
                )
        else:
            for a, b, c in faces:
                f.write(f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}\n")


def write_stl_binary(path, mesh):
    v = mesh.vertices
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(mesh.indices)))
        for a, b, c in mesh.indices:
            n = np.cross(v[b] - v[a], v[c] - v[a])
            n = n / max(np.linalg.norm(n), 1e-12)
            f.write(np.asarray(n, "<f4").tobytes())
            f.write(np.asarray(v[a], "<f4").tobytes())
            f.write(np.asarray(v[b], "<f4").tobytes())
            f.write(np.asarray(v[c], "<f4").tobytes())
            f.write(b"\0\0")


def test_obj_roundtrip(fixture_mesh, tmp_path):
    p = str(tmp_path / "fixture.obj")
    write_obj(p, fixture_mesh)
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, fixture_mesh.vertices, rtol=1e-5)
    np.testing.assert_array_equal(m.indices, fixture_mesh.indices)
    assert m.normals is not None
    np.testing.assert_allclose(m.normals, fixture_mesh.normals, atol=1e-4)
    # fixture PLY has no colors -> white fallback on both paths
    assert np.all(m.colors == 1.0)


def test_obj_polygon_fan_triangulation(fixture_mesh, tmp_path):
    p = str(tmp_path / "fixture_poly.obj")
    write_obj(p, fixture_mesh, polygons=True)
    m = load_obj(p)
    # each 4-gon with a repeated vertex fans into 2 triangles, the second
    # degenerate — vertex geometry must survive
    assert m.indices.shape[0] == 2 * fixture_mesh.indices.shape[0]
    np.testing.assert_allclose(m.vertices, fixture_mesh.vertices, rtol=1e-5)


def test_stl_roundtrip_geometry(fixture_mesh, tmp_path):
    p = str(tmp_path / "fixture.stl")
    write_stl_binary(p, fixture_mesh)
    m = load_stl(p)
    # STL is a triangle soup: joining by identity recovers the vertex SET
    ref = np.unique(
        np.asarray(fixture_mesh.vertices, np.float32)[
            np.unique(fixture_mesh.indices.ravel())
        ],
        axis=0,
    )
    np.testing.assert_allclose(np.unique(m.vertices, axis=0), ref, rtol=1e-5)
    assert m.indices.shape[0] == fixture_mesh.indices.shape[0]
    assert np.all(m.colors == 1.0)
    # vertex normals: unit length, outward-ish (non-zero)
    lens = np.linalg.norm(m.normals, axis=1)
    assert np.all(lens > 0.9)


def test_stl_ascii(tmp_path):
    p = str(tmp_path / "tri.stl")
    with open(p, "w") as f:
        f.write("solid x\n")
        f.write(" facet normal 0 0 1\n  outer loop\n")
        f.write("   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n")
        f.write("  endloop\n endfacet\nendsolid x\n")
    m = load_mesh(p)
    assert m.num_faces == 1
    assert m.num_vertices == 3


def test_unsupported_extension(tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        load_mesh(str(tmp_path / "x.fbx"))
