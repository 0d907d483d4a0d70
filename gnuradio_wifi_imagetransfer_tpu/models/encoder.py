"""Encoders: the SOMA-DSCN live-path encoder plus the GDN-ResNet
CSI/PE variants.

Behavioral port of codec/models/module_original/encoder_dscn.py:9-44;
240x240x3 -> 30x30x128 (8x spatial downsample). NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.afb import AFBPE, AFBcsi
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RCB, RCBGDN


class Encoder(nn.Module):
    compressed_channel: int = 128
    input_channel: int = 3

    @nn.compact
    def __call__(self, r: jnp.ndarray, sub_csi: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        s = RCB(3, self.input_channel, 96, 128, stride=2, name="convBlock1")(r, train)
        s = AFBPE(128, name="attention1")(s, sub_csi)
        s = RCB(3, 128, 256, 256, stride=2, name="convBlock2")(s, train)
        s = AFBPE(256, name="attention2")(s, sub_csi)
        s = RCB(3, 256, 512, 256, stride=2, name="convBlock3")(s, train)
        s = AFBPE(256, name="attention3")(s, sub_csi)
        s = RCB(3, 256, 256, self.compressed_channel, stride=1, name="convBlock4")(s, train)
        return s


class EncoderCSI(nn.Module):
    """GDN-ResNet encoder with complex-CSI attention: 4 RCBGDN blocks +
    AFB_csi gating (module_original/encoder_seq_shared_only.py:11-29)."""

    csi_shape: int = 1
    compressed_channel: int = 128

    @nn.compact
    def __call__(self, r: jnp.ndarray,
                 sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        s = RCBGDN(3, 128, 2, name="convBlock1")(r)
        s = AFBcsi(self.csi_shape, 128, name="attention1")(s, sub_csi)
        s = RCBGDN(128, 256, 2, name="convBlock2")(s)
        s = AFBcsi(self.csi_shape, 256, name="attention2")(s, sub_csi)
        s = RCBGDN(256, 256, 2, name="convBlock3")(s)
        s = AFBcsi(self.csi_shape, 256, name="attention3")(s, sub_csi)
        s = RCBGDN(256, self.compressed_channel, 1, name="convBlock4")(s)
        return s


class EncoderPE(nn.Module):
    """GDN-ResNet encoder with PE attention: 4 RCBGDN blocks + AFB_PE
    gating (module_original/encoder_seq_shared_only.py:32-50); the
    shared encoder of SOMANet_PE.py:43-44 and the ConditionalVAE."""

    compressed_channel: int = 128
    input_channel: int = 3

    @nn.compact
    def __call__(self, r: jnp.ndarray,
                 sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        s = RCBGDN(self.input_channel, 128, 2, name="convBlock1")(r)
        s = AFBPE(128, name="attention1")(s, sub_csi)
        s = RCBGDN(128, 256, 2, name="convBlock2")(s)
        s = AFBPE(256, name="attention2")(s, sub_csi)
        s = RCBGDN(256, 256, 2, name="convBlock3")(s)
        s = AFBPE(256, name="attention3")(s, sub_csi)
        s = RCBGDN(256, self.compressed_channel, 1, name="convBlock4")(s)
        return s
