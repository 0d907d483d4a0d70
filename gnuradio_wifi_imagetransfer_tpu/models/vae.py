"""Conditional VAE over the GDN encoder/decoder pair.

Behavioral port of codec/models/basic_blocks/ConditionalVAE.py:15-146
(and the BaseVAE interface, BASE_VAE.py:7-31). Class-label conditioning:
the label embeds to an extra image plane on encode and concatenates to
the latent on decode.

Two reference inconsistencies are fixed rather than reproduced (the
reference class is vestigial and cannot run as written):
  * the encoder there is built for 3 input channels but receives 4
    (image-embed 3 + class plane 1, ConditionalVAE.py:30-33,94-98) —
    here the encoder takes input_channel=4;
  * decoder_input there maps latent_dim -> feature_dim but receives
    latent_dim + embedding_dim after the concat at :103 — here it takes
    the concatenated width.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderPE
from gnuradio_wifi_imagetransfer_tpu.models.encoder import EncoderPE


class ConditionalVAE(nn.Module):
    in_channels: int = 3
    embedding_dim: int = 10
    compressed_channel: int = 128
    img_size: int = 64
    feature_scale: float = 1.0

    @property
    def compressed_size(self) -> int:
        return self.img_size // 8

    @property
    def feature_dim(self) -> int:
        return self.compressed_channel * self.compressed_size**2

    @property
    def latent_dim(self) -> int:
        return int(self.feature_dim * self.feature_scale)

    def setup(self):
        self.embed_class = nn.Dense(self.img_size * self.img_size)
        self.embed_data = nn.Conv(3, (1, 1))
        self.encoder = EncoderPE(compressed_channel=self.compressed_channel,
                                 input_channel=4)
        self.fc_mu = nn.Dense(self.latent_dim)
        self.fc_var = nn.Dense(self.latent_dim)
        self.decoder_input = nn.Dense(self.feature_dim)
        self.decoder = DecoderPE(compressed_channel=self.compressed_channel,
                                 reconstruct_channel=3)
        # final BN -> LeakyReLU -> Conv3x3 -> Tanh (ConditionalVAE.py:44-52)
        self.final_bn = nn.BatchNorm(use_running_average=True)
        self.final_conv = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)])

    def encode(self, x: jnp.ndarray, sub_csi: Optional[jnp.ndarray] = None):
        """-> [mu, log_var] (ConditionalVAE.py:54-69). x is NHWC."""
        result = self.encoder(x, sub_csi)
        result = result.reshape(result.shape[0], -1)
        return self.fc_mu(result), self.fc_var(result)

    def decode(self, z: jnp.ndarray, sub_csi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        result = self.decoder_input(z)
        result = result.reshape(-1, self.compressed_size, self.compressed_size,
                                self.compressed_channel)
        result = self.decoder(result, sub_csi)
        result = nn.leaky_relu(self.final_bn(result), 0.01)
        return nn.tanh(self.final_conv(result))

    def reparameterize(self, mu: jnp.ndarray, logvar: jnp.ndarray,
                       rng: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape)
        return eps * std + mu

    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray,
                 sub_csi: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        """-> [reconstruction, input, mu, log_var] (ConditionalVAE.py:91-103)."""
        if rng is None:
            rng = self.make_rng("latent")
        embedded_class = self.embed_class(labels)
        embedded_class = embedded_class.reshape(-1, self.img_size, self.img_size, 1)
        embedded_input = self.embed_data(x)

        xin = jnp.concatenate([embedded_input, embedded_class], axis=-1)
        mu, log_var = self.encode(xin, sub_csi)
        z = self.reparameterize(mu, log_var, rng)
        z = jnp.concatenate([z, labels], axis=1)
        return self.decode(z, sub_csi), x, mu, log_var

    def sample(self, num_samples: int, labels: jnp.ndarray,
               rng: jax.Array, sub_csi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Decode latents drawn from the prior (ConditionalVAE.py:121-140)."""
        z = jax.random.normal(rng, (num_samples, self.latent_dim))
        z = jnp.concatenate([z, labels.astype(jnp.float32)], axis=1)
        return self.decode(z, sub_csi)

    def generate(self, x: jnp.ndarray, labels: jnp.ndarray,
                 sub_csi: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        return self(x, labels, sub_csi, rng)[0]


def vae_loss(recons: jnp.ndarray, x: jnp.ndarray, mu: jnp.ndarray,
             log_var: jnp.ndarray, kld_weight: float) -> dict:
    """MSE + weighted KLD (ConditionalVAE.py:105-119)."""
    recons_loss = jnp.mean((recons - x) ** 2)
    kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=1))
    return {"loss": recons_loss + kld_weight * kld,
            "Reconstruction_Loss": recons_loss, "KLD": -kld}
