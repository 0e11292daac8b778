"""Worker process for the multi-host bootstrap test (test_multihost.py).

Runs as one of two jax.distributed processes on CPU (4 virtual devices
each), builds the global (dp=2, tp=4) detection mesh, executes one sharded
match step across processes, and verifies its addressable dp shard
bit-matches the locally-computed single-device reference. Proves
parallel/distributed.py boots a real multi-controller run (SURVEY §5
distributed-backend equivalent) — the reference has no distributed layer at
all (SURVEY §2).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])

    from linemod_tpu.parallel.distributed import (
        global_detection_mesh,
        initialize_distributed,
    )

    # must run before any backend-initializing API (the round-2 advisor bug:
    # probing jax.process_count() first would boot the local backend and make
    # this raise)
    initialize_distributed(f"localhost:{port}", 2, pid)

    import jax
    import numpy as np
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    mesh = global_detection_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"dp": 2, "tp": 4}

    from jax.sharding import PartitionSpec as P

    from linemod_tpu.models.template_bank import make_synthetic_bank
    from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates
    from linemod_tpu.parallel.sharded_match import (
        make_sharded_matcher,
        place_global,
        shard_state,
    )

    bank = make_synthetic_bank(64, seed=7, bbox_wh=48, image_wh=(320, 240))
    cfg = MatchConfig(width=320, height=240, top_k=64, template_chunk=16)
    state = build_match_state(bank, cfg)

    rng = np.random.default_rng(11)
    colors = rng.uniform(0, 255, (2, 240, 320, 3)).astype(np.float32)
    depths = rng.uniform(400, 900, (2, 240, 320)).astype(np.float32)

    sstate = shard_state(state, mesh)
    matcher = make_sharded_matcher(sstate, mesh)
    out = matcher(
        place_global(colors, mesh, P("dp")),
        place_global(depths, mesh, P("dp")),
    )

    # every process verifies its own dp shard against the local
    # single-device reference for that frame
    ref = match_templates(
        state, jnp.asarray(colors[pid]), jnp.asarray(depths[pid])
    )
    for k in ("template_id", "x", "y", "similarity", "valid"):
        shards = [
            s for s in out[k].addressable_shards if s.index[0] == slice(pid, pid + 1, None)
        ]
        assert shards, f"process {pid} holds no dp shard of {k}"
        got = np.asarray(shards[0].data)[0]
        np.testing.assert_array_equal(got, np.asarray(ref[k]), err_msg=k)

    print(f"MULTIHOST_OK process={pid}", flush=True)


if __name__ == "__main__":
    main()
