"""JSCE facade: image <-> superposed latent feature map.

Behavioral port of codec/jsce_codec.py:61-144 (the Mode-1 live inference
path): SOMA-DSCN encoder/decoder pair, 2-D sin/cos positional-encoding
table indexed by each user's complex "CSI" key "re-im" clamped to
+-CSI_bound, ImageNet normalization, mean superposition of per-user
latents in img2msg, and L2 channel normalization + denormalize + clamp in
msg2img.

Checkpoints: the reference's .pth files are stripped from its repo
(.MISSING_LARGE_BLOBS), so weights load through models/convert.py (torch
state dict -> flax) when a .pth is supplied, or initialize randomly /
from an orbax checkpoint produced by utils/trainer.py.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderPE
from gnuradio_wifi_imagetransfer_tpu.models.encoder import Encoder

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def positionalencoding2d(d_model: int, height: int, width: int) -> np.ndarray:
    """2-D sin/cos positional encoding (jsce_codec.py:34-57): channels
    [0:d/2] encode the width coordinate, [d/2:] the height coordinate.
    Returns (d_model, height, width) float32."""
    if d_model % 4 != 0:
        raise ValueError(f"d_model must be divisible by 4, got {d_model}")
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div).T[:, :, None].repeat(width, axis=2)
    return pe


def denormalize(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization; img (..., H, W, C) NHWC."""
    return img * IMAGENET_STD + IMAGENET_MEAN


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8/float [0,1] HWC -> ImageNet-normalized float32."""
    img = np.asarray(img, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


class JSCE:
    """Inference facade with the reference's API surface
    (img2msg / msg2img, jsce_codec.py:102-144)."""

    @classmethod
    def packaged(cls, **overrides) -> "JSCE":
        """The facade around the TRAINED packaged checkpoint
        (assets/jsce_soma_dscn.npz, produced by make_weights.py; geometry
        from its metadata) — the analogue of the reference's default
        checkpoint load at upload_featuremap_udp.py:78-82. Raises
        FileNotFoundError if the asset is absent (override the location
        with GWT_JSCE_WEIGHTS)."""
        from gnuradio_wifi_imagetransfer_tpu.models import weights as wt

        path = wt.default_checkpoint()
        if path is None:
            raise FileNotFoundError(
                "no packaged JSCE checkpoint; run make_weights.py or set "
                "GWT_JSCE_WEIGHTS")
        _, meta = wt.load_soma_npz(path)
        size = int(meta.get("img_size", 80))
        kwargs = dict(
            weight_path=path, img_size=(size, size),
            compressed_channel=int(meta.get("compressed_channel", 64)))
        kwargs.update(overrides)
        return cls(**kwargs)

    def __init__(
        self,
        weight_path: Optional[str] = None,
        img_size: tuple[int, int] = (240, 240),
        compressed_channel: int = 128,
        csi_bound: int = 30,
        codec: str = "SOMA-DSCN",
        params=None,
        rng_seed: int = 0,
    ):
        if codec != "SOMA-DSCN":
            raise NotImplementedError(
                "the reference's live path instantiates codec='SOMA-DSCN' "
                "(upload_featuremap_udp.py:78-82); other codec strings load "
                "encoder_seq_shared_only which its repo ships broken"
            )
        self.img_size = img_size
        self.c = compressed_channel
        self.csi_bound = csi_bound
        self.encoder = Encoder(compressed_channel=compressed_channel)
        self.decoder = DecoderPE(compressed_channel=compressed_channel,
                                 reconstruct_channel=3)
        # PE table (256, 2*bound, 2*bound), indexed [channel, w, h]
        self.pe = positionalencoding2d(256, 2 * csi_bound, 2 * csi_bound)

        if params is not None:
            self.enc_vars, self.dec_vars = params
        elif weight_path is not None and weight_path.endswith(".npz"):
            # native checkpoint trained by make_weights.py (the reference's
            # .pth files are stripped from its repo)
            from gnuradio_wifi_imagetransfer_tpu.models import weights as wt

            variables, meta = wt.load_soma_npz(weight_path)
            if meta.get("compressed_channel", compressed_channel) != compressed_channel:
                raise ValueError(
                    f"checkpoint has compressed_channel="
                    f"{meta['compressed_channel']}, facade asked for "
                    f"{compressed_channel}")
            self.enc_vars, self.dec_vars = wt.split_soma(variables)
        elif weight_path is not None:
            from gnuradio_wifi_imagetransfer_tpu.models import convert

            self.enc_vars, self.dec_vars = convert.load_torch_checkpoint(
                weight_path, compressed_channel)
        else:
            k1, k2 = jax.random.split(jax.random.key(rng_seed))
            dummy_img = jnp.zeros((1, img_size[0], img_size[1], 3))
            dummy_lat = jnp.zeros((1, img_size[0] // 8, img_size[1] // 8, compressed_channel))
            label = jnp.zeros((256,))
            # jitted init: the tunneled TPU backend rejects some of flax's
            # eager per-op init dispatches (see utils/trainer.py)
            self.enc_vars = jax.jit(self.encoder.init)(k1, dummy_img, label)
            self.dec_vars = jax.jit(self.decoder.init)(k2, dummy_lat, label)

        self._enc_apply = jax.jit(
            lambda v, x, l: self.encoder.apply(v, x, l))
        self._dec_apply = jax.jit(
            lambda v, x, l: self.decoder.apply(v, x, l))

    # -- reference API ----------------------------------------------------

    def get_csi(self, key: str) -> complex:
        """'re-im' -> complex (jsce_codec.py:98-100)."""
        real, imag = key.split("-")
        return complex(float(real), float(imag))

    def _label(self, user_key: str) -> jnp.ndarray:
        csi = self.get_csi(user_key)
        b = self.csi_bound
        w = int(np.clip(round(csi.real) + b, 0, 2 * b - 1))
        h = int(np.clip(round(csi.imag) + b, 0, 2 * b - 1))
        return jnp.asarray(self.pe[:, w, h])

    def _preprocess(self, img) -> np.ndarray:
        """Resize + ImageNet normalize. (The reference also applies
        RandomGrayscale(p=0.1) at inference — a training-transform quirk we
        deliberately drop for deterministic inference.)"""
        try:
            from PIL import Image

            if isinstance(img, Image.Image):
                img = img.convert("RGB").resize((self.img_size[1], self.img_size[0]))
                img = np.asarray(img)
        except ImportError:
            pass
        img = np.asarray(img)
        if img.shape[:2] != tuple(self.img_size):
            raise ValueError(f"expected {self.img_size} image, got {img.shape}")
        return normalize_image(img)

    def img2msg(self, image_dict: dict) -> np.ndarray:
        """{user_key: image} -> (w, h, c) float32 mean-superposed latent
        (jsce_codec.py:102-121)."""
        latents = []
        for key, img in image_dict.items():
            label = self._label(key)
            x = jnp.asarray(self._preprocess(img))[None]          # (1, H, W, 3)
            lat = self._enc_apply(self.enc_vars, x, label)        # (1, h, w, c)
            latents.append(lat[0])
        return np.asarray(jnp.mean(jnp.stack(latents), axis=0), dtype=np.float32)

    def msg2img(self, latent: np.ndarray, user_id: str):
        """(w, h, c) latent -> reconstructed PIL image
        (jsce_codec.py:123-144): L2-normalize the channel dim, decode with
        the user's PE label, denormalize, clamp."""
        label = self._label(user_id)
        x = jnp.asarray(latent, dtype=jnp.float32)[None]          # (1, h, w, c)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.maximum(norm, 1e-12)
        rec = self._dec_apply(self.dec_vars, x, label)[0]         # (H, W, 3)
        rec = np.clip(denormalize(np.asarray(rec)), 0.0, 1.0)
        arr = (rec * 255.0 + 0.5).astype(np.uint8)
        try:
            from PIL import Image

            return Image.fromarray(arr)
        except ImportError:
            return arr
