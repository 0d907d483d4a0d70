"""ViT-based hierarchical codec: Swin-style patch merge/expand around
CrossAttention Transformer stages.

Behavioral port of codec/models/module_original/encoder_vit.py:11-59
(BasicLayer + Encoder) and decoder_vit.py:10-66 (BasicLayer_Up +
Decoder). Token layout (B, H*W, C); context (the PE/CSI condition) is
truncated to the stage width exactly as the reference does.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.swin import PatchExpand, PatchMerging
from gnuradio_wifi_imagetransfer_tpu.models.vit import Transformer


class BasicLayer(nn.Module):
    """Transformer stage + optional PatchMerging downsample
    (encoder_vit.py:11-40)."""

    img_size: int
    patch_dim: int
    depth: int = 6
    num_heads: int = 16
    downsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = Transformer(dim=self.patch_dim, depth=self.depth,
                        heads=self.num_heads, dim_head=64, mlp_dim=512,
                        name="blocks")(x, context)
        if self.downsample:
            x = PatchMerging((self.img_size, self.img_size), self.patch_dim,
                             name="downsample")(x)
        return x


class BasicLayerUp(nn.Module):
    """Optional PatchExpand upsample + Transformer stage
    (decoder_vit.py:10-40); the stage runs at patch_dim//2 after an
    expand, as in the reference."""

    img_size: int
    patch_dim: int
    depth: int = 6
    num_heads: int = 16
    upsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dim = self.patch_dim
        if self.upsample:
            x = PatchExpand((self.img_size, self.img_size), self.patch_dim,
                            dim_scale=2, name="upsample")(x)
            dim = self.patch_dim // 2
        return Transformer(dim=dim, depth=self.depth, heads=self.num_heads,
                           dim_head=64, mlp_dim=512, name="blocks")(x, context)


class ViTEncoder(nn.Module):
    """Stacked BasicLayers, each halving resolution (encoder_vit.py:43-59).

    NOTE: the reference stacks patch_dim*(i+1) but PatchMerging doubles
    the channel dim, so its generated stack only type-checks at
    layer_depth=2 where dim 2*patch_dim == patch_dim*(i+1)|i=1. The dims
    here follow PatchMerging's actual output (patch_dim * 2^i), which is
    equivalent at the reference's only working depth.
    """

    input_size: int
    patch_dim: int
    layer_depth: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(self.layer_depth):
            ctx = None if context is None else context[:, :, : x.shape[2]]
            x = BasicLayer(img_size=self.input_size // (2**i),
                           patch_dim=self.patch_dim * (2**i),
                           name=f"layer{i}")(x, ctx)
        return x


class ViTDecoder(nn.Module):
    """Stacked BasicLayerUps, each doubling resolution
    (decoder_vit.py:49-66); mirror of ViTEncoder."""

    input_size: int
    patch_dim: int
    layer_depth: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(self.layer_depth):
            ctx = (None if context is None
                   else context[:, :, : x.shape[2] // 2])
            x = BasicLayerUp(img_size=self.input_size * (2**i),
                             patch_dim=self.patch_dim // (2**i),
                             name=f"layer{i}")(x, ctx)
        return x
