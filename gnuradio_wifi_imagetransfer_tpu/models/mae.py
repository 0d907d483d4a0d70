"""Masked autoencoders: the lightweight MAE wrapper around the ViT
backbone, and the full FAIR MaskedAutoencoderViT.

Behavioral ports of codec/models/basic_blocks/MAE.py:9-187 (wrapper with
context-conditioned encode/decode) and codec/models/basic_blocks/
models_mae.py:22-251 (MaskedAutoencoderViT + the base/large/huge
factories). Per-sample random masking is argsort of uniform noise — a
static-shape gather, so the whole model jits; masking randomness comes
from the Flax "mask" RNG stream.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.pos_embed import get_2d_sincos_pos_embed
from gnuradio_wifi_imagetransfer_tpu.models.vit import Transformer, ViT, pair


# ---------------------------------------------------------------------------
# Wrapper MAE around the CrossAttention ViT (MAE.py)
# ---------------------------------------------------------------------------


class MAE(nn.Module):
    """Mask -> encode visible tokens (with optional context) -> decode all
    tokens -> reconstruct masked patches (MAE.py:53-117, encode :119-160,
    decode :162-187).

    The reference wrapper reaches into its ViT's patch-embedding and
    transformer submodules (MAE.py:29-31); here those layers are owned
    directly. The reference also keeps masking state on `self` between
    encode() and decode(); here state flows explicitly: encode returns
    (decoder_tokens, aux) and decode consumes aux — the functional
    equivalent, which keeps the module jit/vmap-safe.
    """

    image_size: int = 64
    patch_size: int = 8
    encoder_dim: int = 256
    encoder_depth: int = 4
    encoder_heads: int = 8
    decoder_dim: int = 256
    masking_ratio: float = 0.75
    decoder_depth: int = 1
    decoder_heads: int = 8
    decoder_dim_head: int = 64

    def setup(self):
        assert 0 < self.masking_ratio < 1
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        self.num_patches = (ih // ph) * (iw // pw)
        self.pixels_per_patch = ph * pw * 3

        # encoder side (the wrapped ViT's embedding + transformer)
        self.patch_norm1 = nn.LayerNorm()
        self.patch_embed = nn.Dense(self.encoder_dim)
        self.patch_norm2 = nn.LayerNorm()
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, self.num_patches, self.encoder_dim))
        self.transformer = Transformer(dim=self.encoder_dim,
                                       depth=self.encoder_depth,
                                       heads=self.encoder_heads, dim_head=64,
                                       mlp_dim=self.encoder_dim * 2)

        # decoder side (MAE.py:36-42)
        self.enc_to_dec = (nn.Dense(self.decoder_dim)
                           if self.encoder_dim != self.decoder_dim else lambda x: x)
        self.mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                     (self.decoder_dim,))
        self.decoder = Transformer(dim=self.decoder_dim, depth=self.decoder_depth,
                                   heads=self.decoder_heads,
                                   dim_head=self.decoder_dim_head,
                                   mlp_dim=self.decoder_dim * 4)
        self.decoder_pos_emb = nn.Embed(self.num_patches, self.decoder_dim)
        self.to_pixels = nn.Dense(self.pixels_per_patch)

    def _patchify(self, img: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> (B, L, p*p*3) raw patches."""
        ph, pw = pair(self.patch_size)
        b = img.shape[0]
        x = img.reshape(b, img.shape[1] // ph, ph, img.shape[2] // pw, pw, 3)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, self.num_patches, -1)

    def __call__(self, img: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Full forward: the masked-patch reconstruction loss (MAE.py:53-117)."""
        dec_tokens, aux = self.encode(img, context, rng)
        loss, _ = self.decode(dec_tokens, aux, context)
        return loss

    def encode(self, img: jnp.ndarray, context: Optional[jnp.ndarray] = None,
               rng: Optional[jax.Array] = None):
        patches = self._patchify(img)
        b = patches.shape[0]

        tokens = self.patch_norm2(self.patch_embed(self.patch_norm1(patches)))
        tokens = tokens + self.pos_embedding[:, : self.num_patches]

        if rng is None:
            rng = self.make_rng("mask")
        num_masked = int(self.masking_ratio * self.num_patches)
        noise = jax.random.uniform(rng, (b, self.num_patches))
        rand_indices = jnp.argsort(noise, axis=-1)
        masked_idx = rand_indices[:, :num_masked]
        unmasked_idx = rand_indices[:, num_masked:]
        batch_range = jnp.arange(b)[:, None]

        vis = tokens[batch_range, unmasked_idx]
        masked_patches = patches[batch_range, masked_idx]

        ctx = None if context is None else context[:, :, : vis.shape[2]]
        encoded = self.transformer(vis, ctx)
        dec_tokens = self.enc_to_dec(encoded)
        aux = dict(masked_idx=masked_idx, unmasked_idx=unmasked_idx,
                   masked_patches=masked_patches, batch=b)
        return dec_tokens, aux

    def decode(self, dec_tokens: jnp.ndarray, aux: dict,
               context: Optional[jnp.ndarray] = None):
        b = aux["batch"]
        masked_idx, unmasked_idx = aux["masked_idx"], aux["unmasked_idx"]
        batch_range = jnp.arange(b)[:, None]
        num_masked = masked_idx.shape[1]

        unmasked_dec = dec_tokens + self.decoder_pos_emb(unmasked_idx)
        mask_toks = jnp.broadcast_to(self.mask_token,
                                     (b, num_masked, self.decoder_dim))
        mask_toks = mask_toks + self.decoder_pos_emb(masked_idx)

        full = jnp.zeros((b, self.num_patches, self.decoder_dim), dec_tokens.dtype)
        full = full.at[batch_range, unmasked_idx].set(unmasked_dec)
        full = full.at[batch_range, masked_idx].set(mask_toks)
        ctx = None if context is None else context[:, :, : full.shape[2]]
        decoded = self.decoder(full, ctx)

        pred_masked = self.to_pixels(decoded[batch_range, masked_idx])
        recon_loss = jnp.mean((pred_masked - aux["masked_patches"]) ** 2)

        ph, pw = pair(self.patch_size)
        side = int((self.num_patches * self.pixels_per_patch // 3) ** 0.5)
        gh = side // ph
        full_pixels = self.to_pixels(decoded)
        recon = full_pixels.reshape(b, gh, gh, ph, pw, 3)
        recon = recon.transpose(0, 1, 3, 2, 4, 5).reshape(b, side, side, 3)
        return recon_loss, recon


# ---------------------------------------------------------------------------
# Full FAIR MaskedAutoencoderViT (models_mae.py)
# ---------------------------------------------------------------------------


class TimmBlock(nn.Module):
    """Standard pre-norm ViT block (the timm Block used at
    models_mae.py:40-42): MHSA with qkv bias + 4x MLP, residuals."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(nn.gelu(y))
        return x + y


class MaskedAutoencoderViT(nn.Module):
    """MAE with ViT backbone (models_mae.py:22-230): conv patch embed,
    fixed sin-cos pos embeds, cls token, random masking, asymmetric
    encoder/decoder, per-patch normalized-pixel loss option."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        p, d = self.patch_size, self.embed_dim
        self.patch_proj = nn.Conv(d, (p, p), strides=(p, p), name="patch_embed")
        self.cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                                    (1, 1, d))
        grid = int(self.num_patches**0.5)
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(d, grid, cls_token=True))[None]
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.decoder_embed_dim, grid, cls_token=True))[None]

        self.blocks = [TimmBlock(d, self.num_heads, self.mlp_ratio, name=f"block{i}")
                       for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6)
        self.decoder_embed = nn.Dense(self.decoder_embed_dim)
        self.mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                     (1, 1, self.decoder_embed_dim))
        self.decoder_blocks = [
            TimmBlock(self.decoder_embed_dim, self.decoder_num_heads,
                      self.mlp_ratio, name=f"dec_block{i}")
            for i in range(self.decoder_depth)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6)
        self.decoder_pred = nn.Dense(self.patch_size**2 * self.in_chans)

    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) -> (N, L, p*p*3) (models_mae.py:102-114, NHWC)."""
        p = self.patch_size
        n, hh, ww, c = imgs.shape
        h = w = hh // p
        x = imgs.reshape(n, h, p, w, p, c)
        x = jnp.einsum("nhpwqc->nhwpqc", x)
        return x.reshape(n, h * w, p * p * c)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        x = x.reshape(x.shape[0], h, w, p, p, self.in_chans)
        x = jnp.einsum("nhwpqc->nhpwqc", x)
        return x.reshape(x.shape[0], h * p, w * p, self.in_chans)

    def random_masking(self, x: jnp.ndarray, mask_ratio: float, rng: jax.Array):
        """argsort-of-noise shuffling (models_mae.py:132-158)."""
        n, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (n, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((n, l))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def forward_encoder(self, x: jnp.ndarray, mask_ratio: float, rng: jax.Array):
        x = self.patch_proj(x).reshape(x.shape[0], -1, self.embed_dim)
        x = x + self.pos_embed[:, 1:, :]
        x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        cls = self.cls_token + self.pos_embed[:, :1, :]
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x), mask, ids_restore

    def forward_decoder(self, x: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        x = self.decoder_embed(x)
        n = x.shape[0]
        n_mask = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(self.mask_token,
                                       (n, n_mask, self.decoder_embed_dim))
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        x = x + self.decoder_pos_embed
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_norm(x)
        return self.decoder_pred(x)[:, 1:, :]

    def forward_loss(self, imgs: jnp.ndarray, pred: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
        target = self.patchify(imgs)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = ((pred - target) ** 2).mean(axis=-1)
        return (loss * mask).sum() / mask.sum()

    def __call__(self, imgs: jnp.ndarray, mask_ratio: float = 0.75,
                 rng: Optional[jax.Array] = None):
        if rng is None:
            rng = self.make_rng("mask")
        latent, mask, ids_restore = self.forward_encoder(imgs, mask_ratio, rng)
        pred = self.forward_decoder(latent, ids_restore)
        loss = self.forward_loss(imgs, pred, mask)
        return loss, pred, mask


# Recommended archs (models_mae.py:233-251)
mae_vit_base_patch16 = partial(MaskedAutoencoderViT, patch_size=16,
                               embed_dim=768, depth=12, num_heads=12,
                               decoder_embed_dim=512, decoder_depth=8,
                               decoder_num_heads=16, mlp_ratio=4.0)
mae_vit_large_patch16 = partial(MaskedAutoencoderViT, patch_size=16,
                                embed_dim=1024, depth=24, num_heads=16,
                                decoder_embed_dim=512, decoder_depth=8,
                                decoder_num_heads=16, mlp_ratio=4.0)
mae_vit_huge_patch14 = partial(MaskedAutoencoderViT, patch_size=14,
                               embed_dim=1280, depth=32, num_heads=16,
                               decoder_embed_dim=512, decoder_depth=8,
                               decoder_num_heads=16, mlp_ratio=4.0)
