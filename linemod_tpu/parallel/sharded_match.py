"""Template-bank-sharded matching over a device mesh.

Design (SURVEY §7): the coarse scan is embarrassingly parallel over
templates, and the fine refinement of a candidate only needs that candidate's
own template offsets plus the (replicated, frame-derived) response planes. So
each device matches its *shard* of the bank end-to-end — coarse scan, local
top-K, fine refinement — and the only communication is one `all_gather` of
K results per device followed by a replicated merge. Scaling efficiency is
bounded only by that K-sized gather (bytes ~ 5*K per device).

Frames batch over the "dp" axis with `vmap`; templates shard over "tp".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.matching import MatchState, match_templates


def shard_state(state: MatchState, mesh: Mesh) -> MatchState:
    """Place the per-template arrays of a MatchState on the tp axis."""
    spec = NamedSharding(mesh, P("tp"))

    def put(x):
        return jax.device_put(x, spec)

    return MatchState(
        cfg=state.cfg,
        n_templates=state.n_templates,
        off_fine=put(state.off_fine),
        off_coarse=put(state.off_coarse),
        nf_fine=put(state.nf_fine),
        nf_coarse=put(state.nf_coarse),
        lim_coarse=put(state.lim_coarse),
        off3_coarse=put(state.off3_coarse),
        off3_fine=put(state.off3_fine),
        fine_shape=state.fine_shape,
        coarse_shape=state.coarse_shape,
        max_cells_fine=state.max_cells_fine,
        max_cells_coarse=state.max_cells_coarse,
    )


def make_sharded_matcher(state: MatchState, mesh: Mesh):
    """Build a jitted sharded matcher: (color [B, H, W, 3], depth [B, H, W])
    -> match dict with leading batch axis. B must be a multiple of the dp
    axis size. Template ids returned are global."""
    tp = mesh.shape["tp"]
    n_shard = state.off_fine.shape[0] // tp
    cfg = state.cfg

    def local_match(off_f, off_c, nf_f, nf_c, lim, off3, off3f, color, depth):
        # reconstruct a per-shard MatchState inside the shard_map body
        local = MatchState(
            cfg=cfg,
            n_templates=n_shard,
            off_fine=off_f,
            off_coarse=off_c,
            nf_fine=nf_f,
            nf_coarse=nf_c,
            lim_coarse=lim,
            off3_coarse=off3,
            off3_fine=off3f,
            fine_shape=state.fine_shape,
            coarse_shape=state.coarse_shape,
            max_cells_fine=state.max_cells_fine,
            max_cells_coarse=state.max_cells_coarse,
        )

        def one_frame(c, d):
            m = match_templates(local, c, d)
            # globalize template ids
            shard_idx = jax.lax.axis_index("tp")
            m["template_id"] = m["template_id"] + shard_idx * n_shard
            # gather every shard's K results and merge to the global top-K
            sims = jax.lax.all_gather(
                jnp.where(m["valid"], m["similarity"], -1.0), "tp"
            ).reshape(-1)
            tids = jax.lax.all_gather(m["template_id"], "tp").reshape(-1)
            xs = jax.lax.all_gather(m["x"], "tp").reshape(-1)
            ys = jax.lax.all_gather(m["y"], "tp").reshape(-1)
            vals = jax.lax.all_gather(m["valid"], "tp").reshape(-1)
            top_sim, top_i = jax.lax.top_k(sims, cfg.top_k)
            return {
                "template_id": tids[top_i],
                "x": xs[top_i],
                "y": ys[top_i],
                "similarity": top_sim,
                "valid": vals[top_i] & (top_sim > 0),
            }

        return jax.vmap(one_frame)(color, depth)

    mapped = shard_map(
        local_match,
        mesh=mesh,
        in_specs=(P("tp"), P("tp"), P("tp"), P("tp"), P("tp"), P("tp"), P("tp"), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,  # outputs are tp-replicated after the all_gather merge
    )

    @jax.jit
    def matcher(color, depth):
        return mapped(
            state.off_fine,
            state.off_coarse,
            state.nf_fine,
            state.nf_coarse,
            state.lim_coarse,
            state.off3_coarse,
            state.off3_fine,
            color,
            depth,
        )

    return matcher
