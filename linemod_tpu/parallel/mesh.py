"""Device-mesh construction for sharded detection.

The reference is a single-process program with no distributed layer
(SURVEY §2); the scale axes of this workload are the template bank
("tp" — thousands of viewpoint/scale templates score independently) and the
frame batch ("dp"). Shardings ride ICI within a slice via jax collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int = 1, devices=None) -> Mesh:
    """Mesh with axes (dp, tp). tp = n_devices/dp."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % dp == 0, "dp must divide the device count"
    arr = np.asarray(devices).reshape(dp, n_devices // dp)
    return Mesh(arr, ("dp", "tp"))
