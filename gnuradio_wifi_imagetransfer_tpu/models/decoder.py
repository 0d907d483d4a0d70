"""SOMA-DSCN decoders: 4 RTCB transposed-conv blocks with attention.

Behavioral ports of codec/models/module_original/decoder_seq_shared_only.py:
Decoder (AFB_csi variant, :10-30), Decoder_PE (:33-53, the live path), and
Decoder_SA (:55-68). 30x30x128 -> 240x240x3. NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.afb import AFB, AFBPE, AFBcsi
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RTCB, RTCBDS


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


class DecoderDSCN(nn.Module):
    """Depthwise-separable transposed decoder: 4 RTCB_DS blocks + AFB_PE
    gating (module_original/decoder_dscn.py:10-44)."""

    compressed_channel: int = 128
    reconstruct_channel: int = 3

    @nn.compact
    def __call__(self, s: jnp.ndarray, sub_csi: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        r = RTCBDS(3, self.compressed_channel, 256, 256, 2, name="convBlock1")(s, train)
        r = AFBPE(256, name="attention1")(r, sub_csi)
        r = RTCBDS(3, 256, 512, 256, 2, name="convBlock2")(r, train)
        r = AFBPE(256, name="attention2")(r, sub_csi)
        r = RTCBDS(3, 256, 256, 128, 2, name="convBlock3")(r, train)
        r = AFBPE(128, name="attention3")(r, sub_csi)
        r = RTCBDS(3, 128, 96, self.reconstruct_channel, 1, name="convBlock4")(r, train)
        return r


class DecoderOriginal(nn.Module):
    """Fixed-SNR-conditioned decoder: RTCB + AFB(SNR) stack
    (module_original/decoder_original.py:10-29)."""

    snr: float = 20.0
    compressed_channel: int = 128
    reconstruct_channel: int = 3

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        snr = jnp.asarray(self.snr, jnp.float32)
        r = RTCB(self.compressed_channel, 256, 1, name="rtcb1")(s)
        r = AFB(256, name="afb1")(snr, r)
        r = RTCB(256, 256, 2, name="rtcb2")(r)
        r = AFB(256, name="afb2")(snr, r)
        r = RTCB(256, 128, 2, name="rtcb3")(r)
        r = AFB(128, name="afb3")(snr, r)
        r = RTCB(128, self.reconstruct_channel, 2, name="rtcb4")(r)
        return r
