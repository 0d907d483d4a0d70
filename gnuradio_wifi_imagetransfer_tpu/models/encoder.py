"""SOMA-DSCN encoder: 4 RCB blocks with AFB_PE attention between them.

Behavioral port of codec/models/module_original/encoder_dscn.py:9-44;
240x240x3 -> 30x30x128 (8x spatial downsample). NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.afb import AFBPE
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RCB


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
