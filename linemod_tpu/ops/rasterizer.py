"""TPU-native triangle rasterizer: z-buffering as matmul + masked min-reduce.

Replaces the reference's OpenGL offscreen renderer (C9/C16,
src/OpenglRender.cpp, src/ModelBuffer.cpp, shader/*). Design: for a pinhole
camera, each triangle's edge functions and its perspective-correct depth
numerator/denominator are *linear functionals of the pixel ray*
(2-D homogeneous rasterization). Evaluating them for every pixel is a
`[pixels, 3] @ [3, 4*faces]` matmul that runs on the MXU; the z-buffer is a
masked min-reduction over face blocks inside nested `lax.scan`s
(pixel bands x face blocks) so no intermediate exceeds a few tens of MB.
No scatter, no data-dependent shapes, `vmap`-batchable over views.

Conventions: CV camera frame (x right, y down, z forward), mm units,
pixel = (fx*x/z + cx, fy*y/z + cy). The reference renders via GL with
`viewProj = projection * view` (its model matrix is dead code,
src/OpenglRender.cpp:88,135) and a vertical readback flip
(src/OpenglRender.cpp:33-47), which is algebraically this same projection with
fx = fy; the depth shader emits eye-space mm (shader/depth.fs:8-17). Depth
images here are f32 mm with 0 = background; near/far = 100/10000 mm
(src/OpenglRender.cpp:10-11).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEAR_MM = 100.0
FAR_MM = 10000.0


class MeshArrays(NamedTuple):
    """Static-shape device mesh buffers (the TPU analogue of C16 ModelBuffer)."""

    vertices: jax.Array  # [V, 3] f32, model frame (mm)
    faces: jax.Array  # [F, 3] i32
    colors: jax.Array  # [V, 3] f32 in [0, 1]


def mesh_to_arrays(mesh, pad_faces_to: int = 512) -> MeshArrays:
    """Upload a host Mesh, padding the face list to a block multiple."""
    faces = np.asarray(mesh.indices, dtype=np.int32)
    f = faces.shape[0]
    target = max(pad_faces_to, int(np.ceil(f / pad_faces_to)) * pad_faces_to)
    if target > f:
        # Degenerate (0,0,0) triangles have zero-determinant edges and are
        # rejected by the inside test.
        faces = np.concatenate([faces, np.zeros((target - f, 3), np.int32)], axis=0)
    return MeshArrays(
        vertices=jnp.asarray(mesh.vertices, dtype=jnp.float32),
        faces=jnp.asarray(faces),
        colors=jnp.asarray(mesh.colors, dtype=jnp.float32),
    )


def _face_functionals(p_cam: jax.Array, faces: jax.Array, fy, cy):
    """Linear functionals per face from camera-space vertices.

    Returns (M [F, 3, 3], det [F], valid [F], zlo/zhi [F], vlo/vhi [F]):
    rows of M are the edge cofactors c_i = cross(p_j, p_k), pre-scaled by
    sign(det). For a pixel ray q = ((u-cx)/fx, (v-cy)/fy, 1), lambda_i =
    c_i . q are (up to the common factor det) the *3-D* barycentric weights
    of the ray/triangle intersection, so inside = all lambda_i >= 0 (after
    the sign fold), depth = |det| / sum(lambda), and attributes interpolate
    perspective-correctly as sum_i (lambda_i/sum) a_i. vlo/vhi are the
    face's projected row range (image pixels) for band culling.
    """
    tri = p_cam[faces]  # [F, 3, 3]
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    c0 = jnp.cross(p1, p2)
    c1 = jnp.cross(p2, p0)
    c2 = jnp.cross(p0, p1)
    det = jnp.sum(c0 * p0, axis=-1)  # det[p0, p1, p2]
    z = tri[:, :, 2]  # [F, 3]
    # Reject degenerate faces and faces outside the near/far frustum slab
    # (conservative clip; all reference workloads sit far inside it).
    valid = (
        (jnp.abs(det) > 1e-6)
        & jnp.all(z > NEAR_MM, axis=-1)
        & jnp.all(z < FAR_MM, axis=-1)
    )
    # fold sign(det) into the functionals: lambda = e directly, and
    # z = |det| / sum(e) is unchanged (both scale by the same sign)
    s = jnp.sign(det)[:, None, None]
    m = jnp.stack([c0, c1, c2], axis=1) * s  # [F, 3, 3]
    vs = fy * tri[:, :, 1] / z + cy  # projected pixel rows of the 3 verts
    vlo = jnp.where(valid, jnp.min(vs, axis=-1), jnp.inf)
    vhi = jnp.where(valid, jnp.max(vs, axis=-1), -jnp.inf)
    return (
        m,
        jnp.abs(det),
        valid,
        jnp.min(z, axis=-1),
        jnp.max(z, axis=-1),
        vlo,
        vhi,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "face_block", "band_rows", "with_color"),
)
def render(
    mesh: MeshArrays,
    rotation: jax.Array,
    translation: jax.Array,
    fx,
    fy,
    cx,
    cy,
    *,
    width: int = 640,
    height: int = 480,
    face_block: int = 512,
    band_rows: int = 32,
    with_color: bool = False,
    origin=(0.0, 0.0),
):
    """Render one view. Returns depth [H, W] f32 mm (0=empty) and, when
    `with_color`, also a color image [H, W, 3] f32 in [0, 1].

    rotation [3,3] / translation [3]: object-to-camera transform in the CV
    frame (p_cam = R v + t). `origin` (dynamic) places the window's top-left
    pixel for cropped renders; `width`/`height` are the static window size.
    """
    assert height % band_rows == 0, "height must be a multiple of band_rows"
    p_cam = mesh.vertices @ rotation.T + translation  # [V, 3]
    m, det, valid, zlo, zhi, vlo, vhi = _face_functionals(
        p_cam, mesh.faces, fy, cy
    )
    nfaces = mesh.faces.shape[0]
    nblocks = nfaces // face_block
    # Sort faces by projected row so blocks have coherent row ranges; the
    # per-band face scan can then SKIP whole blocks via lax.cond (an XLA
    # conditional executes one branch when not batched, so callers that want
    # the culling win must map over views with lax.map, not vmap). A face
    # keeps its original id through `order` for the color pass.
    order = jnp.argsort(jnp.where(valid, vlo, jnp.inf)).astype(jnp.int32)
    m = m[order]
    det = det[order]
    valid = valid[order]
    zlo = zlo[order]
    zhi = zhi[order]
    vlo = vlo[order]
    vhi = vhi[order]
    blk_vlo = jnp.min(vlo.reshape(nblocks, face_block), axis=1)
    blk_vhi = jnp.max(vhi.reshape(nblocks, face_block), axis=1)
    fblocks = (
        m.reshape(nblocks, face_block, 3, 3),
        det.reshape(nblocks, face_block),
        valid.reshape(nblocks, face_block),
        zlo.reshape(nblocks, face_block),
        zhi.reshape(nblocks, face_block),
        order.reshape(nblocks, face_block),
        blk_vlo,
        blk_vhi,
    )

    ox = jnp.asarray(origin[0], jnp.float32)
    oy = jnp.asarray(origin[1], jnp.float32)
    u = (jnp.arange(width, dtype=jnp.float32) + ox - cx) / fx  # [W]
    band_px = band_rows * width
    nbands = height // band_rows
    big = jnp.float32(jnp.inf)

    def face_step(carry, blk):
        mb, db, vb, zlo_b, zhi_b, idsb, bvlo, bvhi = blk

        def work(c):
            zmin, fid, q = c
            # K=3 contraction: full f32 precision is essentially free here and
            # the TPU default (bf16 passes) costs ~0.3% depth error, which
            # would break the mm-level depth gates downstream.
            e = jnp.dot(
                q, mb.reshape(-1, 3).T, precision=jax.lax.Precision.HIGHEST
            )  # [band_px, 3B]  (MXU)
            e = e.reshape(band_px, face_block, 3)
            # Inclusive fill rule: a pixel exactly on a shared edge
            # (lambda == 0) belongs to both triangles — the edge cofactors of
            # the two triangles are exact fp negations of each other, so this
            # closes single-pixel cracks without any epsilon band (an epsilon
            # proportional to the lambda scale creates false-positive wedges
            # along edge extensions). sign(det) is folded into the
            # functionals, so lambda = e directly.
            lam_ok = jnp.all(e >= 0.0, axis=-1)
            inside = lam_ok & vb[None, :]
            den = e[..., 0] + e[..., 1] + e[..., 2]
            z = db[None, :] / jnp.where(den == 0.0, 1.0, den)
            # Clamp to the triangle's own z-range: any true interior point
            # lies within it, so this kills sliver-triangle fp artifacts.
            z_ok = (z >= zlo_b[None, :] - 1.0) & (z <= zhi_b[None, :] + 1.0)
            z = jnp.where(inside & z_ok, z, big)
            bmin = jnp.min(z, axis=1)
            barg = jnp.argmin(z, axis=1).astype(jnp.int32)
            take = bmin < zmin
            return (
                jnp.where(take, bmin, zmin),
                jnp.where(take, idsb[barg], fid),
                q,
            )

        # skip blocks whose projected row range misses this band entirely
        # (faces are row-sorted, so most blocks miss most bands)
        band_v0 = carry[3]
        overlap = (bvlo <= band_v0 + band_rows) & (bvhi >= band_v0 - 1.0)
        zmin, fid, q = jax.lax.cond(
            overlap, work, lambda c: c, (carry[0], carry[1], carry[2])
        )
        return (zmin, fid, q, band_v0), None

    def band_step(_, band_idx):
        v_img = jnp.arange(band_rows, dtype=jnp.float32) + band_idx * band_rows + oy
        v = (v_img - cy) / fy
        uu, vv = jnp.meshgrid(u, v)  # [band_rows, W]
        q = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1).reshape(band_px, 3)
        init = (
            jnp.full((band_px,), big, jnp.float32),
            jnp.full((band_px,), -1, jnp.int32),
            q,
            band_idx * band_rows + oy,  # first image row of the band
        )
        (zmin, fid, _, _), _ = jax.lax.scan(face_step, init, fblocks)
        if not with_color:
            return None, (zmin, fid)
        # perspective-correct vertex color of the winning face (banded, so the
        # per-pixel triangle gathers never materialize at full-image size)
        hit = jnp.isfinite(zmin)
        tri = mesh.faces[jnp.maximum(fid, 0)]  # [band_px, 3]
        pv = p_cam[tri]  # [band_px, 3, 3]
        c0 = jnp.cross(pv[:, 1], pv[:, 2])
        c1 = jnp.cross(pv[:, 2], pv[:, 0])
        c2 = jnp.cross(pv[:, 0], pv[:, 1])
        lam = jnp.stack(
            [jnp.sum(c0 * q, -1), jnp.sum(c1 * q, -1), jnp.sum(c2 * q, -1)],
            axis=-1,
        )
        # lambda_i are already the perspective-correct 3-D barycentric weights
        lam_sum = jnp.sum(lam, -1, keepdims=True)
        wgt = lam / jnp.where(jnp.abs(lam_sum) < 1e-12, 1.0, lam_sum)
        rgb = jnp.sum(wgt[..., None] * mesh.colors[tri], axis=1)
        rgb = jnp.where(hit[:, None], rgb, 0.0)
        return None, (zmin, fid, rgb)

    out = jax.lax.scan(band_step, None, jnp.arange(nbands, dtype=jnp.float32))[1]
    zmin = out[0].reshape(-1)
    hit = jnp.isfinite(zmin)
    depth = jnp.where(hit, zmin, 0.0).reshape(height, width)
    if not with_color:
        return depth
    rgb = out[2].reshape(height, width, 3)
    return depth, jnp.clip(rgb, 0.0, 1.0)


def render_views(mesh: MeshArrays, rotations, translations, cam, *, with_color=False):
    """vmap-batched rendering over view stacks with a centred principal point.

    Template generation, ICP verification and VSD scoring all render with the
    principal point at the image centre (the online pipeline recentres its
    input images to match, src/PoseDetection.cpp:54-59).

    rotations [N,3,3], translations [N,3] -> depth [N,H,W] (+ color [N,H,W,3]).
    """
    f = functools.partial(
        render,
        mesh,
        fx=cam.fx,
        fy=cam.fy,
        cx=cam.width / 2.0,
        cy=cam.height / 2.0,
        width=cam.width,
        height=cam.height,
        with_color=with_color,
    )
    # lax.map (sequential), NOT vmap: batching would turn the renderer's
    # band-culling lax.cond into a select and evaluate every face block
    return jax.lax.map(
        lambda rt: f(rt[0], rt[1]),
        (
            jnp.asarray(rotations, jnp.float32),
            jnp.asarray(translations, jnp.float32),
        ),
    )
