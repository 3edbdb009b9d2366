"""Mesh construction helpers.

The reference's closest analogue is queue/device bring-up in the test
harness (ComputeFramework::createDevice, src/test/sort.cpp:107-190) — one
Vulkan queue on one GPU.  Here a device mesh is a first-class object every
distributed operator takes explicitly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
