"""Vision-Transformer primitives: pre-norm attention, talking-heads
cross-attention, the CrossAttention Transformer stack, and the ViT
image encoder.

Behavioral port of codec/models/basic_blocks/ViT.py:19-174 to Flax.
Everything is batch-first einsum on the MXU; dropout is disabled by
default (the reference instantiates with dropout=0.) and gated by the
`deterministic` flag when enabled.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from einops import rearrange


def pair(t):
    return t if isinstance(t, tuple) else (t, t)


class FeedForward(nn.Module):
    """LayerNorm -> Dense -> GELU -> Dense (ViT.py:19-32)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(name="norm")(x)
        x = nn.gelu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Attention(nn.Module):
    """Pre-norm multi-head self-attention (ViT.py:35-69)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=self.heads) for t in (q, k, v))

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head**-0.5
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Talking-heads cross-attention (ViT.py:72-115): queries from x,
    keys/values from [x ; context]; head-mixing matmuls before and after
    the softmax."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        h = self.heads
        inner = self.dim_head * h

        x = nn.LayerNorm(name="norm")(x)
        ctx = x if context is None else jnp.concatenate([x, context], axis=1)

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (rearrange(t, "b n (h d) -> b h n d", h=h) for t in (q, k, v))

        mix_pre = self.param("mix_heads_pre_attn", nn.initializers.normal(1.0), (h, h))
        mix_post = self.param("mix_heads_post_attn", nn.initializers.normal(1.0), (h, h))

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head**-0.5
        dots = jnp.einsum("bhij,hg->bgij", dots, mix_pre)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        attn = jnp.einsum("bhij,hg->bgij", attn, mix_post)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class Transformer(nn.Module):
    """Depth x (CrossAttention + FeedForward), with the reference's
    shared post-residual LayerNorm (ViT.py:118-134)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        norm = nn.LayerNorm(name="norm")
        for i in range(self.depth):
            attn = CrossAttention(self.dim, self.heads, self.dim_head,
                                  self.dropout, name=f"attn{i}")
            ff = FeedForward(self.dim, self.mlp_dim, self.dropout, name=f"ff{i}")
            x = norm(attn(x, context=context, deterministic=deterministic) + x)
            x = ff(x, deterministic=deterministic) + x
        return norm(x)


class ViT(nn.Module):
    """Patchify -> linear embed -> learned pos embed -> Transformer ->
    cls/mean pool (ViT.py:137-174). Input NHWC."""

    image_size: int | tuple = 224
    patch_size: int | tuple = 16
    dim: int = 512
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 1024
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, "image not divisible by patch"
        num_patches = (ih // ph) * (iw // pw)
        assert self.pool in ("cls", "mean")

        # b (h p1) (w p2) c -> b (h w) (p1 p2 c); channel-last input keeps
        # the reference's (p1 p2 c) feature ordering
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=ph, p2=pw)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)

        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, num_patches, self.dim))
        n = x.shape[1]
        x = x + pos[:, :n]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        ctx = None if context is None else context[:, :, : x.shape[2]]
        x = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, name="transformer")(
                            x, ctx, deterministic=deterministic)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return x
