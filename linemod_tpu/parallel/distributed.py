"""Multi-host initialization + helpers.

The reference has no distributed layer at all (SURVEY §2); this is the TPU
substitute: `jax.distributed` process bootstrap, then GSPMD sharding over a
global (dp, tp) mesh — template-bank shards ride ICI within a slice, frame
batches ride DCN across hosts. All collective traffic of a sharded detect is
one all_gather of ~5 * top_k f32 per device (parallel/sharded_match.py), so
scaling is compute-bound until the bank shard per device gets tiny.
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for a multi-host run.

    With no arguments, relies on the cluster environment (TPU pods populate
    everything automatically; elsewhere set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Safe to call once per process, before
    any backend use. No-op when already initialized or single-process."""
    # Detect prior initialization WITHOUT touching a backend-initializing API:
    # jax.process_count() would initialize the local XLA backend, after which
    # jax.distributed.initialize raises. The distributed client handle is the
    # authoritative "already initialized" signal.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-host / auto-bootstrapped TPU runtime: nothing to do unless
        # the environment provides cluster info
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # not in a cluster environment
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_detection_mesh(dp: int | None = None):
    """(dp, tp) mesh over all global devices. Default dp = number of hosts,
    so the template bank shards over the fast intra-host axis (ICI) and
    frames batch across hosts (DCN) — the layout that keeps the per-frame
    all_gather on ICI."""
    n = len(jax.devices())
    if dp is None:
        dp = jax.process_count()
    if n % dp:
        dp = 1
    return make_mesh(n, dp=dp)
