"""SOMA-DSCN decoders: 4 RTCB transposed-conv blocks with attention.

Behavioral ports of codec/models/module_original/decoder_seq_shared_only.py:
Decoder (AFB_csi variant, :10-30), Decoder_PE (:33-53, the live path), and
Decoder_SA (:55-68). 30x30x128 -> 240x240x3. NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.afb import AFBPE, AFBcsi
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RTCB


class DecoderPE(nn.Module):
    compressed_channel: int = 128
    reconstruct_channel: int = 3

    @nn.compact
    def __call__(self, s: jnp.ndarray, sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        r = RTCB(self.compressed_channel, 256, 1, name="convBlock1")(s)
        r = AFBPE(256, name="attention1")(r, sub_csi)
        r = RTCB(256, 256, 2, name="convBlock2")(r)
        r = AFBPE(256, name="attention2")(r, sub_csi)
        r = RTCB(256, 128, 2, name="convBlock3")(r)
        r = AFBPE(128, name="attention3")(r, sub_csi)
        r = RTCB(128, self.reconstruct_channel, 2, name="convBlock4")(r)
        return r


class Decoder(nn.Module):
    """AFB_csi-conditioned variant (decoder_seq_shared_only.py:10-30)."""

    csi_shape: int = 1
    compressed_channel: int = 128
    reconstruct_channel: int = 3

    @nn.compact
    def __call__(self, s: jnp.ndarray, sub_csi: jnp.ndarray | None = None) -> jnp.ndarray:
        r = RTCB(self.compressed_channel, 256, 1, name="convBlock1")(s)
        r = AFBcsi(self.csi_shape, 256, name="attention1")(r, sub_csi)
        r = RTCB(256, 256, 2, name="convBlock2")(r)
        r = AFBcsi(self.csi_shape, 256, name="attention2")(r, sub_csi)
        r = RTCB(256, 128, 2, name="convBlock3")(r)
        r = AFBcsi(self.csi_shape, 128, name="attention3")(r, sub_csi)
        r = RTCB(128, self.reconstruct_channel, 2, name="convBlock4")(r)
        return r


class DecoderSA(nn.Module):
    """Attention-free variant (decoder_seq_shared_only.py:55-68)."""

    compressed_channel: int = 128
    reconstruct_channel: int = 3

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        r = RTCB(self.compressed_channel, 256, 1, name="convBlock1")(s)
        r = RTCB(256, 256, 2, name="convBlock2")(r)
        r = RTCB(256, 128, 2, name="convBlock3")(r)
        r = RTCB(128, self.reconstruct_channel, 2, name="convBlock4")(r)
        return r
