"""Attention-feature blocks: SNR/CSI/PE-conditioned channel gating.

Behavioral ports of codec/models/basic_blocks/AFB.py:6-78 to Flax/NHWC.
All three variants: squeeze (spatial mean) -> condition injection ->
FC -> ReLU -> FC -> sigmoid -> per-channel gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class AFB(nn.Module):
    """SNR-conditioned gate (AFB.py:6-23): concat scalar SNR to channel
    means."""

    channel_size: int = 128

    @nn.compact
    def __call__(self, snr: jnp.ndarray, feature: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(feature, axis=(1, 2))                        # (B, C)
        snr_col = jnp.broadcast_to(jnp.reshape(snr, (-1, 1)), (x.shape[0], 1))
        x = jnp.concatenate([x, snr_col], axis=1)
        x = nn.relu(nn.Dense(self.channel_size, name="fc1")(x))
        x = jax.nn.sigmoid(nn.Dense(self.channel_size, name="fc2")(x))
        return feature * x[:, None, None, :]


class AFBcsi(nn.Module):
    """Complex-CSI-conditioned gate (AFB.py:26-54): CSI -> 2 linear maps
    -> concat with channel means."""

    append_size: int = 1
    channel_size: int = 128

    @nn.compact
    def __call__(self, feature: jnp.ndarray, sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        x = jnp.mean(feature, axis=(1, 2))
        if sub_csi is not None:
            csi = jnp.concatenate([jnp.real(sub_csi).reshape(-1),
                                   jnp.imag(sub_csi).reshape(-1)], axis=0)
            csi = nn.Dense(2 * self.append_size, name="complex2float")(csi)
            att = nn.Dense(self.channel_size, name="irs_compress")(csi)
            att = jnp.broadcast_to(att[None, :], (x.shape[0], att.shape[0]))
            x = jnp.concatenate([x, att], axis=1)
        x = nn.relu(nn.Dense(self.channel_size, name="fc1")(x))
        x = jax.nn.sigmoid(nn.Dense(self.channel_size, name="fc2")(x))
        return feature * x[:, None, None, :]


class AFBPE(nn.Module):
    """Positional-encoding-conditioned gate (AFB.py:57-78): the first C
    entries of the user's PE label are ADDED to the channel means."""

    channel_size: int = 128

    @nn.compact
    def __call__(self, feature: jnp.ndarray, sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        x = jnp.mean(feature, axis=(1, 2))                        # (B, C)
        if sub_csi is not None:
            pe = sub_csi[: x.shape[1]]
            x = x + pe[None, :]
        x = nn.relu(nn.Dense(self.channel_size, name="fc1")(x))
        x = jax.nn.sigmoid(nn.Dense(self.channel_size, name="fc2")(x))
        return feature * x[:, None, None, :]
