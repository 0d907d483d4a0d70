"""CSA ("Channel-Spatial Attention") feature block.

Behavioral port of codec/models/basic_blocks/CSA.py:8-33: like AFB but
the SNR condition is fixed at construction — a scalar or a list
(multi-SNR), appended to the squeezed channel descriptor.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn


class CSAAFB(nn.Module):
    """squeeze -> concat fixed SNR(s) -> FC/ReLU/FC/sigmoid gate."""

    snr: Union[float, Sequence[float]]
    channel_size: int = 128

    @nn.compact
    def __call__(self, feature: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(feature, axis=(1, 2))                        # (B, C)
        snr = jnp.atleast_1d(jnp.asarray(self.snr, jnp.float32))
        snr = jnp.broadcast_to(snr[None, :], (x.shape[0], snr.shape[0]))
        x = jnp.concatenate([x, snr], axis=1)
        x = nn.relu(nn.Dense(self.channel_size, name="fc1")(x))
        x = jax.nn.sigmoid(nn.Dense(self.channel_size, name="fc2")(x))
        return feature * x[:, None, None, :]
