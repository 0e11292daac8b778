"""Single-program per-frame detection core.

One jitted function runs the full per-frame device work — the coarse-to-fine
pyramid match of the whole template bank — and returns one small packed
array, so the host does exactly ONE device->host fetch per frame (each fetch
has high latency through the remote TPU transport; the reference's equivalent
loop is all host-side so it never faced this).

The color/depth validation checks are NOT device work: they run host-side,
lazily per grouped candidate (ops/postprocess.py), which (a) matches the
reference's post-grouping check order exactly — no top-K truncation of which
candidates can be checked — and (b) means the depth image never crosses the
host->device link in color-only mode. On the measured axon transport the
per-call fetch round-trip (~50 ms) and the upload (~83 MB/s, ~11 ms per BGR
frame) are the frame-rate ceiling, so calls-per-frame and bytes-per-frame
are the metrics that matter: color-only detection uploads only the
640x480x3 color image and fetches one packed candidate array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .matching import MatchState, match_templates, match_templates_quant


def _pack(m):
    out = jnp.stack(
        [
            m["template_id"].astype(jnp.float32),
            m["x"].astype(jnp.float32),
            m["y"].astype(jnp.float32),
            m["similarity"],
            m["valid"].astype(jnp.float32),
        ],
        axis=1,
    )
    if "cut_exact" in m:
        # prefiltered-cut exactness proof rides as ONE extra row
        # (flag, 0, 0, 0, valid=0): host code that only reads valid rows is
        # unaffected; pose_detection checks it to retry saturated frames
        flag = jnp.zeros((1, 5), jnp.float32).at[0, 0].set(
            m["cut_exact"].astype(jnp.float32)
        )
        out = jnp.concatenate([out, flag], axis=0)
    return out


@jax.jit
def detect_frame(state: MatchState, color: jax.Array):
    """Color-only per-frame device program.

    color: [H, W, 3] uint8 BGR (already principal-point recentred).
    Returns packed [top_k, 5] f32: (template_id, x, y, similarity, valid),
    similarity-sorted.
    """
    colorf = color.astype(jnp.float32)
    depth_unused = jnp.zeros(colorf.shape[:2], jnp.float32)
    return _pack(match_templates(state, colorf, depth_unused))


@jax.jit
def detect_frame_quant(state: MatchState, quant0: jax.Array, quant1: jax.Array):
    """Host-quantize transport mode: the frame arrives as the two per-level
    quantized orientation maps (u8, 384 KB vs 921 KB of color at 640x480 —
    the upload IS the frame-rate ceiling on remote-TPU links), produced
    bit-identically to the on-device path by native/quantize.cpp."""
    return _pack(match_templates_quant(state, quant0, quant1))


@jax.jit
def detect_frame_dual(state: MatchState, color: jax.Array, depth: jax.Array):
    """Dual-modality per-frame device program (depth normals participate in
    the match, so depth does go to the device)."""
    return _pack(
        match_templates(state, color.astype(jnp.float32), depth.astype(jnp.float32))
    )


def delta_encode_host(color_bgr: np.ndarray) -> np.ndarray:
    """PNG-style horizontal predictor, host side (vectorized numpy, ~2.5 ms
    at 640x480 on 2 cores): planar [3, H, W] u8 where column 0 is absolute
    and the rest are mod-256 row deltas. The axon transport compresses
    uploads (measured: an all-zero 921 KB frame uploads in ~10 ms, a random
    one in ~39 ms, a real frame in ~22 ms), so shrinking the COMPRESSED
    size — zlib ratio 0.61 delta'd vs 0.72 raw — buys upload time that far
    exceeds the on-device decode (a cumsum fused into the frame program)."""
    planar = color_bgr.transpose(2, 0, 1)
    d = planar.astype(np.int16)
    out = np.empty_like(planar)
    out[:, :, 0] = planar[:, :, 0]
    out[:, :, 1:] = (d[:, :, 1:] - d[:, :, :-1]).astype(np.uint8)
    return out


@jax.jit
def detect_frame_delta(state: MatchState, delta: jax.Array):
    """Color-only per-frame program taking the delta-encoded planar frame
    (delta_encode_host); the mod-256 prefix sum reconstructs the exact
    image on device."""
    c = jnp.cumsum(delta.astype(jnp.int32), axis=2) & 255
    colorf = c.astype(jnp.float32).transpose(1, 2, 0)
    depth_unused = jnp.zeros(colorf.shape[:2], jnp.float32)
    return _pack(match_templates(state, colorf, depth_unused))


@jax.jit
def detect_frame_dual_delta(state: MatchState, delta: jax.Array, depth: jax.Array):
    """Dual-modality program with the color leg delta-encoded (the depth
    image already zlib-compresses ~10:1 raw on the wire, so only color
    benefits from the predictor)."""
    c = jnp.cumsum(delta.astype(jnp.int32), axis=2) & 255
    colorf = c.astype(jnp.float32).transpose(1, 2, 0)
    return _pack(match_templates(state, colorf, depth.astype(jnp.float32)))


@jax.jit
def detect_frames_batch(state: MatchState, colors: jax.Array):
    """Multi-frame color-only program: colors [B, H, W, 3] uint8 ->
    packed [B, top_k, 5].

    One device call (one upload burst, one result fetch) covers B frames —
    on high-latency transports the per-call handshake overhead is a
    significant slice of the frame budget, so amortizing it across a small
    batch raises streaming throughput at the cost of B-frame latency.
    lax.map, not vmap: the per-frame program embeds Pallas kernels whose
    batching rule would rebuild the grid; sequential device time per frame
    is unchanged and that is not the bottleneck."""
    return jax.lax.map(lambda c: detect_frame(state, c), colors)


@jax.jit
def detect_frames_batch_delta(state: MatchState, deltas: jax.Array):
    """Multi-frame color-only program over delta-encoded frames
    (deltas [B, 3, H, W] from delta_encode_host per frame)."""
    return jax.lax.map(lambda d: detect_frame_delta(state, d), deltas)
