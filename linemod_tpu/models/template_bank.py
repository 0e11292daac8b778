"""Dense template bank: construction, layout, persistence.

Replaces the reference's per-template object list + OpenCV detector state
(`HighLevelLineMOD::addTemplate` / `writeLinemod` / `readLinemod`,
src/HighLevelLinemod.cpp:68-110,256-320) with dense tensors shardable across
a device mesh:

  feat_<lvl>   [N, 64, 3] int16   (x, y, ori) per feature, bbox-relative,
                                  at that pyramid level's resolution
  valid_<lvl>  [N, 64]    bool
  bbox         [N, 4]     int32   (x, y, w, h) at level 0, template-image
                                  absolute coords (object centred)
  quat         [N, 4]     f32     template rotation, CV frame
  z            [N]        f32     template camera distance (mm)
  median_depth [N]        f32     ~p20 depth over the bbox (bg = 65535)
  hull         [N, H, 2]  f32     convex hull of level-0 features (padded,
                                  for the detect-time color check)

In-plane rotation is realized by rendering each template *from its stored
pose* (camera roll), which is exactly equivalent to the reference's 2-D image
warp about the centred principal point (src/HighLevelLinemod.cpp:81-91) but
keeps pose and pixels consistent by construction.

Template ordering matches the reference's nesting: radius (outer), viewpoint,
in-plane angle (inner) (src/TemplateGenerator.cpp:47-58).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraParameters, ModelProperties, TemplateSettings
from ..ops.extract import extract_template
from ..ops.rasterizer import MeshArrays, mesh_to_arrays, render
from ..utils.geometry import quat_to_mat, template_view_pose
from .viewpoints import camera_view_points

MAX_FEATURES = 64  # 63 features padded to a lane-friendly 64
HULL_VERTS = 32
BG_DEPTH = 65535.0
CROP = 320  # template render window (object centred); must cover max extent


@dataclasses.dataclass
class TemplateBank:
    class_id: str
    feat0: np.ndarray  # [N, 64, 3] int16
    valid0: np.ndarray  # [N, 64] bool
    feat1: np.ndarray
    valid1: np.ndarray
    bbox: np.ndarray  # [N, 4] int32  (x, y, w, h) level-0
    quat: np.ndarray  # [N, 4] f32
    z: np.ndarray  # [N] f32
    median_depth: np.ndarray  # [N] f32
    hull: np.ndarray  # [N, HULL_VERTS, 2] f32 (padded by repeating last vertex)
    dual_modality: bool = False
    nfeat0: np.ndarray | None = None  # dual-modality normal features
    nvalid0: np.ndarray | None = None
    nfeat1: np.ndarray | None = None
    nvalid1: np.ndarray | None = None

    @property
    def num_templates(self) -> int:
        return int(self.bbox.shape[0])

    def save(self, path: str) -> None:
        """Sharded-array-friendly persistence (replaces writeLinemod's
        yml.gz + raw-struct bin pair with one explicit npz + json meta)."""
        arrays = {
            f: getattr(self, f)
            for f in (
                "feat0",
                "valid0",
                "feat1",
                "valid1",
                "bbox",
                "quat",
                "z",
                "median_depth",
                "hull",
            )
        }
        if self.dual_modality:
            arrays.update(
                nfeat0=self.nfeat0,
                nvalid0=self.nvalid0,
                nfeat1=self.nfeat1,
                nvalid1=self.nvalid1,
            )
        np.savez_compressed(path, **arrays)
        with open(path + ".json", "w") as f:
            json.dump(
                {"class_id": self.class_id, "dual_modality": self.dual_modality}, f
            )

    @staticmethod
    def load(path: str) -> "TemplateBank":
        with open(path + ".json") as f:
            meta = json.load(f)
        d = dict(np.load(path if path.endswith(".npz") else path + ".npz"))
        d = {k: v for k, v in d.items()}
        return TemplateBank(class_id=meta["class_id"], dual_modality=meta["dual_modality"], **d)


def make_synthetic_bank(
    n_templates: int,
    seed: int = 0,
    bbox_wh: int = 48,
    image_wh=(640, 480),
    dual_modality: bool = False,
) -> TemplateBank:
    """Random bank for compile checks / sharding dry-runs (no rendering)."""
    rng = np.random.default_rng(seed)
    w, h = image_wh

    def feats(scale):
        f = np.zeros((n_templates, MAX_FEATURES, 3), np.int16)
        f[:, :, 0] = rng.integers(0, bbox_wh // scale, (n_templates, MAX_FEATURES))
        f[:, :, 1] = rng.integers(0, bbox_wh // scale, (n_templates, MAX_FEATURES))
        f[:, :, 2] = rng.integers(0, 8, (n_templates, MAX_FEATURES))
        return f

    valid = np.zeros((n_templates, MAX_FEATURES), bool)
    valid[:, :63] = True
    bbox = np.tile(
        np.array([[(w - bbox_wh) // 2, (h - bbox_wh) // 2, bbox_wh, bbox_wh]], np.int32),
        (n_templates, 1),
    )
    quat = np.tile(np.array([[0.0, 1.0, 0.0, 0.0]], np.float32), (n_templates, 1))
    hull = np.zeros((n_templates, HULL_VERTS, 2), np.float32)
    hull[:, 0] = (0, 0)
    hull[:, 1] = (bbox_wh, 0)
    hull[:, 2:] = (bbox_wh, bbox_wh)
    kw = {}
    if dual_modality:
        kw = dict(
            nfeat0=feats(1), nvalid0=valid.copy(),
            nfeat1=feats(2), nvalid1=valid.copy(),
        )
    return TemplateBank(
        class_id="synthetic",
        feat0=feats(1),
        valid0=valid.copy(),
        feat1=feats(2),
        valid1=valid.copy(),
        bbox=bbox,
        quat=quat,
        z=np.full((n_templates,), 600.0, np.float32),
        median_depth=np.full((n_templates,), 580.0, np.float32),
        hull=hull,
        dual_modality=dual_modality,
        **kw,
    )


def concat_banks(banks: list["TemplateBank"]) -> tuple["TemplateBank", np.ndarray]:
    """Concatenate several classes' banks into one scannable super-bank.

    Multi-model orchestration scans all loaded classes against the SAME
    per-frame response planes in one device program (the reference instead
    holds all classes in one cv::linemod detector and matches the requested
    class, src/PoseDetection.cpp:3-18 + src/HighLevelLinemod.cpp:145).
    Returns (combined bank, offsets) where offsets[i] is the first global
    template id of banks[i]; global id -> class via np.searchsorted.
    """
    if not banks:
        raise ValueError("no banks")
    dual = banks[0].dual_modality
    if any(b.dual_modality != dual for b in banks):
        raise ValueError("all banks must share the modality configuration")

    def cat(field):
        parts = [getattr(b, field) for b in banks]
        if any(p is None for p in parts):
            return None
        return np.concatenate(parts, axis=0)

    fields = ["feat0", "valid0", "feat1", "valid1", "bbox", "quat", "z",
              "median_depth", "hull"]
    if dual:
        fields += ["nfeat0", "nvalid0", "nfeat1", "nvalid1"]
    combined = TemplateBank(
        class_id="+".join(b.class_id for b in banks),
        dual_modality=dual,
        **{f: cat(f) for f in fields},
    )
    offsets = np.cumsum([0] + [b.num_templates for b in banks])[:-1]
    return combined, offsets


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; points [M, 2] -> hull vertices CCW."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross2(a, b):
        return a[0] * b[1] - a[1] * b[0]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross2(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out[:-1]

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower + upper, dtype=np.float32)


def _pad_hull(hull: np.ndarray) -> np.ndarray:
    h = np.zeros((HULL_VERTS, 2), np.float32)
    n = min(len(hull), HULL_VERTS)
    h[:n] = hull[:n]
    if n > 0:
        h[n:] = hull[n - 1]
    return h


def build_template_bank(
    mesh,
    class_id: str,
    cam: CameraParameters,
    settings: TemplateSettings,
    props: ModelProperties,
    progress=None,
) -> TemplateBank:
    """Offline template generation (the TemplateGenerator::run loop,
    src/TemplateGenerator.cpp:41-62): radii x viewpoints x in-plane angles,
    each rendered from its pose and feature-extracted on device."""
    marr = mesh_to_arrays(mesh)
    dual = not settings.only_color_modality
    ox = (cam.width - CROP) / 2.0
    oy = (cam.height - CROP) / 2.0

    # Render and extraction are compiled separately: the fused program's
    # compile time is superlinear on the remote TPU compiler (the split
    # halves land in the persistent compile cache independently).
    @jax.jit
    def render_batch(rots, trans):
        def one(rt):
            return render(
                marr,
                rt[0],
                rt[1],
                cam.fx,
                cam.fy,
                cam.width / 2.0,
                cam.height / 2.0,
                width=CROP,
                height=CROP,
                with_color=True,
                origin=(ox, oy),
            )

        # sequential over views: keeps the renderer's band-culling lax.cond a
        # real conditional (vmap would lower it to a select = no culling)
        return jax.lax.map(one, (rots, trans))

    @jax.jit
    def extract_batch(colors, depths):
        feats = jax.vmap(
            lambda c, d: extract_template(c, d, dual_modality=dual)
        )(colors, depths)

        # per-view feature bbox + ~p20 bbox depth ON DEVICE: the host then
        # fetches ~25 KB of features/scalars per call instead of the 4 MB
        # depth batch (the device->host link is the generation-time
        # bottleneck on remote TPU transports)
        def stats_one(f, d):
            big = jnp.int32(10**9)

            def ext(key, scale):
                x, y, _, v = f[key]
                return (
                    jnp.where(v, x * scale, big).min(),
                    jnp.where(v, x * scale, -big).max(),
                    jnp.where(v, y * scale, big).min(),
                    jnp.where(v, y * scale, -big).max(),
                )

            keys = [("grad0", 1), ("grad1", 2)]
            if dual:
                keys += [("norm0", 1)]
            es = [ext(k, s) for k, s in keys]
            x_min = jnp.min(jnp.stack([e[0] for e in es]))
            x_max = jnp.max(jnp.stack([e[1] for e in es]))
            y_min = jnp.min(jnp.stack([e[2] for e in es]))
            y_max = jnp.max(jnp.stack([e[3] for e in es]))

            yy = jnp.arange(d.shape[0], dtype=jnp.int32)[:, None]
            xx = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]
            in_bb = (xx >= x_min) & (xx <= x_max) & (yy >= y_min) & (yy <= y_max)
            vals = jnp.where(in_bb, jnp.where(d > 0, d, BG_DEPTH), jnp.inf)
            k = ((x_max - x_min + 1) * (y_max - y_min + 1)) // 5
            p20 = jnp.take(jnp.sort(vals.ravel()), k)  # exact k-th smallest
            return p20

        p20s = jax.vmap(stats_one)(feats, depths)
        return feats, p20s

    def render_and_extract(rots, trans):
        depths, colors = render_batch(rots, trans)
        return extract_batch(colors * 255.0, depths)

    # The reference's in-plane pose angle is the negated warp angle
    # (src/HighLevelLinemod.cpp:105); enumerate the same set.
    angles = [-(a) for a in settings.in_plane_angles]

    records = {k: [] for k in ("feat0", "valid0", "feat1", "valid1", "nfeat0",
                               "nvalid0", "nfeat1", "nvalid1", "bbox", "quat",
                               "z", "median_depth", "hull")}
    total = 0

    def collect(pending):
        nonlocal total
        quats, radius, feats, p20s = pending
        f = {k: tuple(np.asarray(a) for a in v) for k, v in feats.items()}
        p20s = np.asarray(p20s)
        for i in range(len(quats)):
            rec = _assemble_template(f, p20s, i, ox, oy, dual)
            if rec is None:
                continue
            for k, v in rec.items():
                records[k].append(v)
            records["quat"].append(quats[i].astype(np.float32))
            records["z"].append(np.float32(radius))
            total += 1

    # batch several viewpoints' in-plane rotations per device call and keep
    # two calls in flight: each call's ~25 KB feature fetch costs a full
    # transport round-trip (~50 ms on the axon tunnel), so at one viewpoint
    # (10 renders) per call the RTT — not rendering — bounds generation
    # throughput; batching VP_BATCH viewpoints amortizes it. The last
    # ragged group per radius reuses one executable across radii (viewpoint
    # counts are radius-independent).
    VP_BATCH = 4
    import collections as _collections

    pending = _collections.deque()
    for radius in settings.radii:
        vps = camera_view_points(
            float(radius),
            settings.subdivisions,
            props.rotationally_symmetrical,
            props.planes_of_symmetry,
        )
        for g0 in range(0, len(vps), VP_BATCH):
            group = vps[g0 : g0 + VP_BATCH]
            quats = np.array(
                [template_view_pose(vp, a) for vp in group for a in angles],
                np.float64,
            )
            rots = np.array([quat_to_mat(q) for q in quats], np.float32)
            trans = np.tile(
                np.array([[0.0, 0.0, float(radius)]], np.float32), (len(rots), 1)
            )
            feats, p20s = render_and_extract(jnp.asarray(rots), jnp.asarray(trans))
            pending.append((quats, radius, feats, p20s))
            while len(pending) > 2:
                collect(pending.popleft())
        while pending:
            collect(pending.popleft())
        if progress is not None:
            progress(float(radius), total)

    def stack(k):
        return np.stack(records[k]) if records[k] else None

    return TemplateBank(
        class_id=class_id,
        feat0=stack("feat0"),
        valid0=stack("valid0"),
        feat1=stack("feat1"),
        valid1=stack("valid1"),
        bbox=stack("bbox"),
        quat=stack("quat"),
        z=np.asarray(records["z"], np.float32),
        median_depth=np.asarray(records["median_depth"], np.float32),
        hull=stack("hull"),
        dual_modality=dual,
        nfeat0=stack("nfeat0"),
        nvalid0=stack("nvalid0"),
        nfeat1=stack("nfeat1"),
        nvalid1=stack("nvalid1"),
    )


def _assemble_template(f, p20s, i, ox, oy, dual):
    """Combine per-level features of view i into one bank record.

    Coordinates: crop -> full template-image frame (+ox, +oy); features are
    then re-based on the level-0 bbox corner (OpenCV's cropTemplates
    semantics: per-level offsets subtract bbox_corner >> level)."""
    gx0, gy0, go0, gv0 = (a[i] for a in f["grad0"])
    gx1, gy1, go1, gv1 = (a[i] for a in f["grad1"])
    if gv0.sum() < 8 or gv1.sum() < 8:
        return None  # degenerate view (reference would fail addTemplate)
    xs0 = [gx0[gv0]]
    ys0 = [gy0[gv0]]
    if dual:
        nx0, ny0, no0, nv0 = (a[i] for a in f["norm0"])
        nx1, ny1, no1, nv1 = (a[i] for a in f["norm1"])
        xs0.append(nx0[nv0])
        ys0.append(ny0[nv0])
    # level-1 features scaled up for the global bbox (OpenCV crops over all
    # levels jointly)
    xs_all = np.concatenate(xs0 + [gx1[gv1] * 2])
    ys_all = np.concatenate(ys0 + [gy1[gv1] * 2])
    x_min, x_max = int(xs_all.min()), int(xs_all.max())
    y_min, y_max = int(ys_all.min()), int(ys_all.max())
    bbox_crop = (x_min, y_min, x_max - x_min + 1, y_max - y_min + 1)

    def rebase(x, y, o, v, lvl):
        cx = x_min >> lvl
        cy = y_min >> lvl
        arr = np.zeros((MAX_FEATURES, 3), np.int16)
        arr[: len(x), 0] = x - cx
        arr[: len(x), 1] = y - cy
        arr[: len(x), 2] = o
        val = np.zeros(MAX_FEATURES, bool)
        val[: len(x)] = True
        # clip negatives from the >>lvl rounding
        arr[:, 0] = np.maximum(arr[:, 0], 0)
        arr[:, 1] = np.maximum(arr[:, 1], 0)
        return arr, val

    rec = {}
    rec["feat0"], rec["valid0"] = rebase(gx0[gv0], gy0[gv0], go0[gv0], gv0, 0)
    rec["feat1"], rec["valid1"] = rebase(gx1[gv1], gy1[gv1], go1[gv1], gv1, 1)
    if dual:
        rec["nfeat0"], rec["nvalid0"] = rebase(nx0[nv0], ny0[nv0], no0[nv0], nv0, 0)
        rec["nfeat1"], rec["nvalid1"] = rebase(nx1[nv1], ny1[nv1], no1[nv1], nv1, 1)

    rec["bbox"] = np.array(
        [x_min + int(ox), y_min + int(oy), bbox_crop[2], bbox_crop[3]], np.int32
    )
    rec["median_depth"] = np.float32(p20s[i])  # computed on device
    pts = np.stack([gx0[gv0] - x_min, gy0[gv0] - y_min], axis=1).astype(np.float32)
    rec["hull"] = _pad_hull(_convex_hull(pts))
    return rec
