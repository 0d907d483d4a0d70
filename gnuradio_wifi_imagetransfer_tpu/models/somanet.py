"""SOMANet: end-to-end multi-user semantic superposition model.

Behavioral port of codec/models/SOMANet_DSCN.py DMANet (:33-214): a shared
DSCN encoder and PE decoder around a physical superposition channel, with
learnable IRS phase shifts `shared_phi`.

Two forward paths, as in the reference:
  * __call__ — the "simple" path (SOMANet_DSCN.py:97-144): encode each
    user, flatten + complexify (first half real / second half imag),
    SUM-superpose, power-normalize, then per-user decode of the shared
    signal (semantic multiplexing is resolved by the PE labels).
  * forward_physics — the full IRS physics path (_forward_old :146-214):
    per-user power-normalized complex symbols propagate through
    H = env_rx^T diag(Psi) env_tx, sum at the IRS, reflect, receive, add
    AWGN, zero-force with CSI^-1, then decode.

JAX-native: users are a leading batch axis (vmap), not a Python loop;
channels enter as arrays; randomness is explicit via PRNG keys.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderPE
from gnuradio_wifi_imagetransfer_tpu.models.encoder import Encoder
from gnuradio_wifi_imagetransfer_tpu.models.jsce import positionalencoding2d


def power_norm(feature: jnp.ndarray, p: float = 1.0) -> jnp.ndarray:
    """The reference's powerNorm (SOMANet_DSCN.py:68-74): divide by the
    total per-sample power (not its square root — kept verbatim) and scale
    by sqrt(P * n)."""
    mod = jnp.sum(jnp.abs(feature) ** 2, axis=1, keepdims=True)
    mod = jnp.where(mod == 0, 1e-6, mod).astype(jnp.float32)
    weight = jnp.sqrt(jnp.float32(p * feature.shape[1]))
    return weight * feature / mod


def complexify(flat: jnp.ndarray) -> jnp.ndarray:
    """(B, 2n) real -> (B, n) complex: first half = real, second = imag
    (SOMANet_DSCN.py:112-114)."""
    n = flat.shape[-1] // 2
    return flat[..., :n] + 1j * flat[..., n:]


def decomplexify(z: jnp.ndarray) -> jnp.ndarray:
    """(B, n) complex -> (B, 2n) real (SOMANet_DSCN.py:135-137)."""
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)


class SOMANet(nn.Module):
    """Multi-user joint source-channel model with shared encoder/decoder.

    Inputs are batched per user: images (U, B, H, W, 3) and PE labels
    (U, 256) (one label per user, from each user's CSI coordinate).
    """

    compressed_channel: int = 128
    img_size: int = 240
    n_irs: int = 16          # IRS element count (envs[k].shape[0])
    p: float = 1.0

    def setup(self):
        self.shared_encoder = Encoder(compressed_channel=self.compressed_channel)
        self.shared_decoder = DecoderPE(compressed_channel=self.compressed_channel,
                                        reconstruct_channel=3)
        # learnable IRS phases (SOMANet_DSCN.py:54-56)
        self.shared_phi = self.param(
            "shared_phi", lambda k: 2 * 3.14 * jax.random.uniform(k, (self.n_irs,)))

    def psi(self) -> jnp.ndarray:
        return jnp.cos(self.shared_phi) + 1j * jnp.sin(self.shared_phi)

    def get_chnl(self, env_tx: jnp.ndarray, env_rx: jnp.ndarray) -> jnp.ndarray:
        """CSI = env_rx^T diag(Psi) env_tx (SOMANet_DSCN.py getChnl :81-86)."""
        return env_rx.T @ (self.psi()[:, None] * env_tx)

    def _encode_users(self, images: jnp.ndarray, labels: jnp.ndarray,
                      train: bool = False) -> jnp.ndarray:
        def enc_one(img_u, label_u):
            return self.shared_encoder(img_u, label_u, train)

        feats = [enc_one(images[u], labels[u]) for u in range(images.shape[0])]
        return jnp.stack(feats)                                   # (U, B, h, w, c)

    def _decode_users(self, recv: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        outs = [self.shared_decoder(recv[u] if recv.ndim == 5 else recv, labels[u])
                for u in range(labels.shape[0])]
        return jnp.stack(outs)                                    # (U, B, H, W, 3)

    def __call__(self, images: jnp.ndarray, labels: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """Simple superposition forward (SOMANet_DSCN.py:97-144)."""
        u, b = images.shape[:2]
        feats = self._encode_users(images, labels, train)         # (U, B, h, w, c)
        h, w, c = feats.shape[2:]
        flat = feats.reshape(u, b, -1)
        z = complexify(flat)                                      # (U, B, n)
        mssv = power_norm(jnp.sum(z, axis=0), self.p)             # (B, n)
        recv = decomplexify(mssv).reshape(b, h, w, c)
        norm = jnp.linalg.norm(recv, axis=-1, keepdims=True)
        recv = recv / jnp.maximum(norm, 1e-12)
        return self._decode_users(recv, labels)

    def forward_physics(
        self,
        images: jnp.ndarray,
        labels: jnp.ndarray,
        envs_tx: jnp.ndarray,        # (U, N, 1) per-user uplink channels
        envs_rx: jnp.ndarray,        # (U, N, 1) per-user downlink channels
        key: Optional[jax.Array] = None,
        snr_db: float = 20.0,
        train: bool = False,
    ) -> jnp.ndarray:
        """Full IRS propagation forward (_forward_old :146-214)."""
        u, b = images.shape[:2]
        feats = self._encode_users(images, labels, train)
        h, w, c = feats.shape[2:]
        flat = feats.reshape(u, b, -1)
        z = complexify(flat)                                      # (U, B, n)
        s = jax.vmap(lambda f: power_norm(f, self.p))(z)          # (U, B, n)

        psi = self.psi()
        # uplink: env_tx[u] (N, 1) x s[u] (B, n) summed over users -> (N, B, n)
        up = jnp.einsum("un,ubm->nbm", envs_tx[..., 0], s)
        reflected = psi[:, None, None] * up                       # diag(Psi) @ .

        outs = []
        for ui in range(u):
            g_rx = envs_rx[ui, :, 0]                              # (N,)
            recv = jnp.einsum("n,nbm->bm", g_rx, reflected)       # (B, n)
            if key is not None:
                kr, ki, key = jax.random.split(jax.random.fold_in(key, ui), 3)
                sigma = 10.0 ** (-snr_db / 10.0) * self.p
                noise = (jax.random.normal(kr, recv.shape)
                         + 1j * jax.random.normal(ki, recv.shape)) * (sigma / np.sqrt(2))
                recv = recv + noise
            csi = self.get_chnl(envs_tx[ui], envs_rx[ui])[0, 0]
            recv = recv / csi                                     # zero-forcing (1x1 CSI)
            r = decomplexify(recv).reshape(b, h, w, c)
            norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
            r = r / jnp.maximum(norm, 1e-12)
            outs.append(self.shared_decoder(r, labels[ui]))
        return jnp.stack(outs)


def pe_labels(csi_keys: list[str], csi_bound: int = 30) -> np.ndarray:
    """PE labels (U, 256) from 're-im' CSI keys (SOMANet_DSCN.py:105-111)."""
    pe = positionalencoding2d(256, 2 * csi_bound, 2 * csi_bound)
    out = []
    for k in csi_keys:
        re, im = k.split("-")
        w = int(np.clip(round(float(re)) + csi_bound, 0, 2 * csi_bound - 1))
        h = int(np.clip(round(float(im)) + csi_bound, 0, 2 * csi_bound - 1))
        out.append(pe[:, w, h])
    return np.stack(out)


class SOMANetPE(nn.Module):
    """SOMANet_PE variant (codec/models/SOMANet_PE.py DMANet :33-156):
    GDN-ResNet Encoder_PE/Decoder_PE around the always-on IRS physics
    path. Users are scheduled as (tx, rx) channel-index pairs into a
    bank of K environment vectors; each pair's PE label is looked up
    from the CSI that the pair's own channels produce.

    Deviation from the reference, by intent: the reflection applies
    diag(Psi) to the IRS-summed signal (the physics), where the
    reference's generated code broadcasts Psi row-wise
    (SOMANet_PE.py:126-128), an expand/diag_embed slip that collapses
    all IRS elements onto every row.
    """

    compressed_channel: int = 128
    img_size: int = 240
    n_irs: int = 16
    p: float = 1.0
    csi_bound: int = 30
    snr_db: float = 20.0

    def setup(self):
        from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderPE
        from gnuradio_wifi_imagetransfer_tpu.models.encoder import EncoderPE

        self.shared_encoder = EncoderPE(compressed_channel=self.compressed_channel)
        self.shared_decoder = DecoderPE(compressed_channel=self.compressed_channel,
                                        reconstruct_channel=3)
        self.shared_phi = self.param(
            "shared_phi", lambda k: 2 * 3.14 * jax.random.uniform(k, (self.n_irs,)))
        self.pe_table = jnp.asarray(
            positionalencoding2d(256, 2 * self.csi_bound, 2 * self.csi_bound))

    def psi(self) -> jnp.ndarray:
        return jnp.cos(self.shared_phi) + 1j * jnp.sin(self.shared_phi)

    def get_chnl(self, env_tx: jnp.ndarray, env_rx: jnp.ndarray) -> jnp.ndarray:
        """CSI = env_tx^T diag(Psi) env_rx (SOMANet_PE.py:80-85)."""
        return env_tx.T @ (self.psi()[:, None] * env_rx)

    def _pe_label(self, csi: jnp.ndarray) -> jnp.ndarray:
        """PE[:, w, h] with w/h = clip(round(Re/Im CSI) + bound)
        (SOMANet_PE.py:105-107). Gradients do not flow through the index
        (the reference detaches)."""
        b = self.csi_bound
        w = jnp.clip(jnp.round(jax.lax.stop_gradient(jnp.real(csi))) + b,
                     0, 2 * b - 1).astype(jnp.int32)
        h = jnp.clip(jnp.round(jax.lax.stop_gradient(jnp.imag(csi))) + b,
                     0, 2 * b - 1).astype(jnp.int32)
        return self.pe_table[:, w, h]

    def __call__(self, images: jnp.ndarray, pairs: jnp.ndarray,
                 envs: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """images (U, B, H, W, 3); pairs (U, 2) int indices into envs
        (K, N, 1); returns per-user reconstructions (U, B, H, W, 3)
        (SOMANet_PE.py:88-156)."""
        u, b = images.shape[:2]
        psi = self.psi()

        signals, labels = [], []
        for ui in range(u):
            tx, rx = pairs[ui, 0], pairs[ui, 1]
            csi = self.get_chnl(envs[tx], envs[rx])[0, 0]
            label = self._pe_label(csi)
            labels.append(label)
            feature = self.shared_encoder(images[ui], label)
            flat = feature.reshape(b, -1)
            s = power_norm(complexify(flat), self.p)              # (B, n)
            signals.append(s)

        # merge & propagate: sum_u env_tx[u] x s_u at the IRS, reflect
        env_tx = jnp.stack([envs[pairs[ui, 0], :, 0] for ui in range(u)])  # (U, N)
        mssv = jnp.einsum("un,ubm->nbm", env_tx, jnp.stack(signals))
        reflected = psi[:, None, None] * mssv                      # diag(Psi) @ .

        hs = self.img_size // 8
        outs = []
        for ui in range(u):
            tx, rx = pairs[ui, 0], pairs[ui, 1]
            g_rx = envs[rx, :, 0]
            recv = jnp.einsum("n,nbm->bm", g_rx, reflected)        # (B, n)
            if key is not None:
                kr, ki = jax.random.split(jax.random.fold_in(key, ui))
                sigma = 10.0 ** (-self.snr_db / 10.0) * self.p
                recv = recv + (jax.random.normal(kr, recv.shape)
                               + 1j * jax.random.normal(ki, recv.shape)
                               ) * (sigma / np.sqrt(2))
            csi = self.get_chnl(envs[tx], envs[rx])[0, 0]
            recv = recv / csi                                      # ZF (1x1 CSI inverse)
            r = decomplexify(recv).reshape(b, hs, hs, self.compressed_channel)
            norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
            r = r / jnp.maximum(norm, 1e-12)
            outs.append(self.shared_decoder(r, labels[ui]))
        return jnp.stack(outs)
