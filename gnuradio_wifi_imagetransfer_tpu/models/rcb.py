"""Residual conv blocks — all four reference variants:

  * RCB     — MobileNetV3-style depthwise encoder block (RCB_DS.py:20-79)
  * RTCB    — transposed-conv ResNet block with IGDN (RTCB.py:6-42)
  * RCBGDN  — conv ResNet basic block with GDN + PReLU (RCB.py:6-41)
  * RTCBDS  — MobileNetV3-style depthwise transposed block (RTCB_DS.py:20-90)

Flax/NHWC throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.layers import GDN, PReLU, SeModule, hard_swish


class RCB(nn.Module):
    """expand(1x1) -> depthwise(kxk, stride) -> pointwise(1x1), BN +
    hardswish, with the three skip variants of RCB_DS.py:44-67."""

    kernel_size: int = 3
    in_size: int = 3
    expand_size: int = 96
    out_size: int = 128
    stride: int = 1
    se: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        s = self.stride
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)

        out = nn.Conv(self.expand_size, (1, 1), use_bias=False, name="conv1")(x)
        out = hard_swish(bn("bn1")(out))
        # torch padding=1 with k=3: SAME for stride 1; for stride 2 torch
        # pads 1 on both sides -> emulate with explicit padding
        out = nn.Conv(self.expand_size, (k, k), strides=(s, s),
                      padding=[(1, 1), (1, 1)],
                      feature_group_count=self.expand_size,
                      use_bias=False, name="conv2")(out)
        out = hard_swish(bn("bn2")(out))
        if self.se:
            out = SeModule(self.expand_size, name="semodule")(out, train)
        out = nn.Conv(self.out_size, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)

        skip = x
        if s == 1 and self.in_size != self.out_size:
            skip = nn.Conv(self.out_size, (1, 1), use_bias=False, name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)
        elif s == 2 and self.in_size != self.out_size:
            skip = nn.Conv(self.in_size, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)],
                           feature_group_count=self.in_size,
                           use_bias=False, name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)
            skip = nn.Conv(self.out_size, (1, 1), use_bias=True, name="skip_conv1")(skip)
            skip = bn("skip_bn1")(skip)
        elif s == 2 and self.in_size == self.out_size:
            skip = nn.Conv(self.out_size, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)],
                           feature_group_count=self.in_size,
                           use_bias=False, name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)

        return hard_swish(out + skip)


class ConvTransposeTorch(nn.Module):
    """ConvTranspose matching torch's ConvTranspose2d(k=kernel, stride,
    padding=pad, output_padding=stride-1), i.e. output size = in * stride.

    Implemented via lax.conv_transpose with explicit padding: torch's
    transposed conv pads the dilated input with (k-1-pad) before and
    (k-1-pad+output_padding) after.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.pad
        out_pad = s - 1
        in_ch = x.shape[-1]
        # kernel layout (kh, kw, OUT, IN): with transpose_kernel=True,
        # lax.conv_transpose flips spatial axes and swaps I/O, reproducing
        # torch's gradient-of-conv ConvTranspose2d semantics exactly.
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (k, k, self.features, in_ch),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        lo = k - 1 - p
        hi = k - 1 - p + out_pad
        y = jax.lax.conv_transpose(
            x, w,
            strides=(s, s),
            padding=[(lo, hi), (lo, hi)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        return y + b


class RTCB(nn.Module):
    """ConvT(3x3, s) -> IGDN -> PReLU -> ConvT(3x3, 1) -> IGDN, plus a
    ConvT(1x1, s) + IGDN shortcut when shape changes; final PReLU
    (RTCB.py:6-42)."""

    in_channel: int
    out_channel: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ConvTransposeTorch(self.out_channel, 3, self.stride, pad=1, name="convt1")(x)
        y = GDN(self.out_channel, inverse=True, name="gdn1")(y)
        y = PReLU(self.out_channel, name="prelu1")(y)
        y = ConvTransposeTorch(self.out_channel, 3, 1, pad=1, name="convt2")(y)
        y = GDN(self.out_channel, inverse=True, name="gdn2")(y)

        z = x
        if self.stride != 1 or self.in_channel != self.out_channel:
            z = ConvTransposeTorch(self.out_channel, 1, self.stride, pad=0, name="skip_convt")(x)
            z = GDN(self.out_channel, inverse=True, name="skip_gdn")(z)

        return PReLU(self.out_channel, name="prelu_out")(y + z)


class RCBGDN(nn.Module):
    """ResNet basic block with GDN normalization (RCB.py:6-41):
    Conv(3x3, s) -> GDN -> PReLU -> Conv(3x3, 1) -> GDN, plus a
    Conv(1x1, s) + GDN shortcut when shape changes; final PReLU."""

    in_channel: int = 3
    out_channel: int = 128
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.stride
        y = nn.Conv(self.out_channel, (3, 3), strides=(s, s),
                    padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = GDN(self.out_channel, name="gdn1")(y)
        y = PReLU(self.out_channel, name="prelu1")(y)
        y = nn.Conv(self.out_channel, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        y = GDN(self.out_channel, name="gdn2")(y)

        z = x
        if s != 1 or self.in_channel != self.out_channel:
            z = nn.Conv(self.out_channel, (1, 1), strides=(s, s),
                        name="skip_conv")(x)
            z = GDN(self.out_channel, name="skip_gdn")(z)

        return PReLU(self.out_channel, name="prelu_out")(y + z)


class DepthwiseConvTransposeTorch(nn.Module):
    """Depthwise ConvTranspose2d(k, stride, padding=pad,
    output_padding=stride-1, groups=C) — each channel upsampled
    independently, matching torch semantics via an input-dilated
    depthwise convolution with the spatially flipped kernel."""

    kernel_size: int = 3
    stride: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.pad
        out_pad = s - 1
        c = x.shape[-1]
        w = self.param("kernel", nn.initializers.xavier_uniform(), (k, k, 1, c))
        lo = k - 1 - p
        hi = k - 1 - p + out_pad
        return jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class RTCBDS(nn.Module):
    """expand(1x1 convT) -> depthwise(kxk convT, stride) -> pointwise
    (1x1 convT), BN + Hardswish, with the three skip variants of
    RTCB_DS.py:46-90. 1x1 stride-1 transposed convs are mathematically
    plain 1x1 convs."""

    kernel_size: int = 3
    in_size: int = 128
    expand_size: int = 256
    out_size: int = 128
    stride: int = 1
    se: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.stride
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)

        out = nn.Conv(self.expand_size, (1, 1), use_bias=False, name="conv1")(x)
        out = hard_swish(bn("bn1")(out))
        out = DepthwiseConvTransposeTorch(self.kernel_size, s, pad=1,
                                          name="conv2")(out)
        out = hard_swish(bn("bn2")(out))
        if self.se:
            out = SeModule(self.expand_size, name="semodule")(out, train)
        out = nn.Conv(self.out_size, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)

        skip = x
        if s == 1 and self.in_size != self.out_size:
            skip = nn.Conv(self.out_size, (1, 1), use_bias=False,
                           name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)
        elif s == 2 and self.in_size != self.out_size:
            skip = DepthwiseConvTransposeTorch(3, 2, pad=1, name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)
            skip = nn.Conv(self.out_size, (1, 1), use_bias=True,
                           name="skip_conv1")(skip)
            skip = bn("skip_bn1")(skip)
        elif s == 2 and self.in_size == self.out_size:
            skip = DepthwiseConvTransposeTorch(3, 2, pad=1, name="skip_conv0")(skip)
            skip = bn("skip_bn0")(skip)

        return hard_swish(out + skip)
