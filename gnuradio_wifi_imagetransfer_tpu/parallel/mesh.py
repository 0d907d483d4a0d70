"""Device-mesh construction for the (channel, time) streaming topology.

The reference's parallelism is GNU Radio's thread-per-block scheduler plus
OS processes composed over UDP (SURVEY.md §2.5). The TPU-native equivalents:

  * mesh axis "channel" — independent 20 MHz channels (data parallel);
  * mesh axis "time"    — time-blocks of one channel's sample stream
    (sequence parallel), with overlap-save halo exchange over ICI.

On a pod slice, lay "time" along the fastest ICI ring (halo exchange is
neighbor-only ppermute traffic) and "channel" across the remaining axes /
DCN (channels never communicate).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(channels: int = 1, time_shards: int | None = None,
              devices=None) -> Mesh:
    """Build a (channel, time) mesh over ``devices``.

    If time_shards is None, all remaining devices go to the time axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if time_shards is None:
        if n % channels:
            raise ValueError(f"{n} devices not divisible by {channels} channels")
        time_shards = n // channels
    if channels * time_shards > n:
        raise ValueError(
            f"mesh {channels}x{time_shards} needs {channels * time_shards} "
            f"devices, have {n}"
        )
    import numpy as np

    dev = np.asarray(devices[: channels * time_shards]).reshape(channels, time_shards)
    return Mesh(dev, axis_names=("channel", "time"))
