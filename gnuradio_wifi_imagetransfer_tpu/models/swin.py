"""Swin-Transformer building blocks: windowed attention with relative
position bias, shifted windows, and the patch merge/expand resamplers.

Behavioral port of codec/models/basic_blocks/Swin_ViT.py:8-489 to Flax.
Token layout is (B, H*W, C); window partition/reverse are static
reshapes, the shifted-window mask is a precomputed numpy constant, and
the relative-position gather is a static index table — all of which XLA
folds away, leaving the attention matmuls on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from einops import rearrange


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (num_windows*B, ws, ws, C) (Swin_ViT.py:207-219)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition (Swin_ViT.py:344-358)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """Pairwise relative-position index table (Swin_ViT.py:252-263)."""
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)                                        # (wh*ww, wh*ww)


class Mlp(nn.Module):
    """fc -> GELU -> fc (Swin_ViT.py:325-341)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.gelu(nn.Dense(self.hidden_features, name="fc1")(x))
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias (Swin_ViT.py:222-322)."""

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhid,bhjd->bhij", q * scale, k)

        wh, ww = self.window_size
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads))
        rel_index = _relative_position_index(self.window_size)   # static
        bias = bias_table[rel_index.reshape(-1)].reshape(wh * ww, wh * ww, -1)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        x = jnp.einsum("bhij,bhjd->bhid", attn, v)
        x = x.transpose(0, 2, 1, 3).reshape(b_, n, c)
        x = nn.Dense(self.dim, name="proj")(x)
        return nn.Dropout(self.proj_drop)(x, deterministic=deterministic)


def _shifted_window_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """0/-100 attention mask for SW-MSA (Swin_ViT.py:404-425)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // window_size, window_size,
                          w // window_size, window_size, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size * window_size)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinTransformerBlock(nn.Module):
    """One (S)W-MSA + MLP block with cyclic shift (Swin_ViT.py:361-477)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h, w = self.input_resolution
        window_size, shift_size = self.window_size, self.shift_size
        if min(self.input_resolution) <= window_size:
            shift_size = 0
            window_size = min(self.input_resolution)
        assert 0 <= shift_size < window_size

        b, l, c = x.shape
        assert l == h * w, "input feature has wrong size"

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x).reshape(b, h, w, c)

        if shift_size > 0:
            x = jnp.roll(x, shift=(-shift_size, -shift_size), axis=(1, 2))
            mask = jnp.asarray(_shifted_window_mask(h, w, window_size, shift_size))
        else:
            mask = None

        xw = window_partition(x, window_size).reshape(-1, window_size * window_size, c)
        xw = WindowAttention(self.dim, (window_size, window_size), self.num_heads,
                             self.qkv_bias, self.qk_scale, self.attn_drop,
                             self.drop, name="attn")(xw, mask, deterministic)
        xw = xw.reshape(-1, window_size, window_size, c)
        x = window_reverse(xw, window_size, h, w)

        if shift_size > 0:
            x = jnp.roll(x, shift=(shift_size, shift_size), axis=(1, 2))
        x = x.reshape(b, h * w, c)

        x = shortcut + x
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                name="mlp")(nn.LayerNorm(name="norm2")(x), deterministic)
        return x + y


class PatchEmbed(nn.Module):
    """Image -> non-overlapping patch tokens via strided conv
    (Swin_ViT.py:160-204). Input NHWC."""

    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        assert x.shape[1] == self.img_size and x.shape[2] == self.img_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), name="proj")(x)
        x = x.reshape(x.shape[0], -1, self.embed_dim)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class PatchMerging(nn.Module):
    """Down-sample: H,W -> /2, C -> x2 via 2x2 concat + linear reduce
    (Swin_ViT.py:110-157)."""

    input_resolution: Tuple[int, int]
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c = x.shape
        assert l == h * w and h % 2 == 0 and w % 2 == 0
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class PatchExpand2X(nn.Module):
    """Up-sample x2: linear expand to 2C then pixel-shuffle, C -> C/2
    (Swin_ViT.py:9-30)."""

    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        if self.dim_scale == 2:
            x = nn.Dense(2 * self.dim, use_bias=False, name="expand")(x)
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, c)
        x = rearrange(x, "b h w (p1 p2 c) -> b (h p1) (w p2) c", p1=2, p2=2, c=c // 4)
        x = x.reshape(b, -1, c // 4)
        return nn.LayerNorm(name="norm")(x)


class PatchExpand(nn.Module):
    """Up-sample x`dim_scale`: linear expand then pixel-shuffle, output
    dim C*scale/2^scale... matches Swin_ViT.py:33-56 exactly (C//2**scale
    of the expanded dim)."""

    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        s = self.dim_scale
        x = nn.Dense(s * self.dim, use_bias=False, name="expand")(x)
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, c)
        x = rearrange(x, "b h w (p1 p2 c) -> b (h p1) (w p2) c",
                      p1=s, p2=s, c=c // 2**s)
        x = x.reshape(b, -1, c // 2**s)
        return nn.LayerNorm(name="norm")(x)


class DimReducePatchExpand(nn.Module):
    """Parameter-free pixel-shuffle upsample (Swin_ViT.py:59-81)."""

    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        s = self.dim_scale
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, c)
        x = rearrange(x, "b h w (p1 p2 c) -> b (h p1) (w p2) c",
                      p1=s, p2=s, c=c // 2**s)
        x = x.reshape(b, -1, c // 2**s)
        return nn.LayerNorm(name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """Up-sample x4 keeping dim: expand to 16C then shuffle
    (Swin_ViT.py:84-107)."""

    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        s = self.dim_scale
        x = nn.Dense(16 * self.dim, use_bias=False, name="expand")(x)
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, c)
        x = rearrange(x, "b h w (p1 p2 c) -> b (h p1) (w p2) c",
                      p1=s, p2=s, c=c // s**2)
        x = x.reshape(b, -1, self.dim)
        return nn.LayerNorm(name="norm")(x)
