"""IRS (intelligent reflecting surface) steering-vector channels.

JAX port of the reference's utils/channel.py: the ``Channel`` class
(channel.py:43-132 — LoS via 3-D Kronecker steering vectors with carrier
phase e^{-jkd}, Rayleigh NLoS, aggregate IRS channel H = H_B2R diag(psi)
H_R2U + H_B2U, MMSE pilot channel estimation) and ``clustered_SV_channel``
(channel.py:135-281 — IRS element groups, Rician mixing, and the
phase-gradient reflection codebooks genPhase_nograd / genIncidencePhase).

These feed the SOMANet multi-user physics (models/somanet.py) exactly the
way the torch training stack consumed the numpy originals.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.channel.sv import steering_vec

C_LIGHT = 3e8


def channel_mdl(pos_a, pos_b, at_scale_a, at_scale_b, f: float = 5e9) -> jnp.ndarray:
    """LoS channel with carrier phase: sv_A sv_B^H * e^{-j k d}
    (channel.py:60-78; the e^{-jkd} term is what distinguishes this from
    the SV_channel.py variant)."""
    pos_a = jnp.asarray(pos_a, dtype=jnp.float32)
    pos_b = jnp.asarray(pos_b, dtype=jnp.float32)
    k = 2.0 * jnp.pi * f / C_LIGHT
    d = jnp.linalg.norm(pos_a - pos_b)
    n_ab = (pos_a - pos_b) / d

    def sv(scales):
        v = steering_vec(n_ab[0], scales[0])
        v = jnp.kron(v, steering_vec(n_ab[1], scales[1]))
        return jnp.kron(v, steering_vec(n_ab[2], scales[2]))

    return sv(at_scale_a) @ jnp.conj(sv(at_scale_b)).T * jnp.exp(-1j * k * d)


def dft_matrix(n: int) -> jnp.ndarray:
    """Unitary DFT matrix (channel.py DFT_matrix :124-127)."""
    i, j = jnp.meshgrid(jnp.arange(n), jnp.arange(n))
    return jnp.exp(-2j * jnp.pi * i * j / n) / jnp.sqrt(jnp.float32(n))


@dataclasses.dataclass(frozen=True)
class IRSChannel:
    """Functional port of utils/channel.py Channel (channel.py:43-132)."""

    user_num: int
    antenna_num: int
    irs_units: int

    @property
    def scale(self) -> int:
        return int(self.irs_units ** 0.5)

    def noise(self, key: jax.Array, sigma: float) -> jnp.ndarray:
        kr, ki = jax.random.split(key)
        shape = (self.antenna_num, self.user_num)
        return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)) * (
            jnp.asarray(sigma) / jnp.sqrt(2.0)
        )

    def gen_los(self, pos_ap, pos_irs, pos_users):
        """(H_B2U, H_B2R, H_R2U) LoS matrices (channel.py:101-116)."""
        at_user = (1, 1, 1)
        at_ap = (self.antenna_num, 1, 1)
        at_irs = (self.scale, self.scale, 1)
        pos_users = jnp.asarray(pos_users)
        h_b2u = jnp.stack(
            [channel_mdl(pos_ap, pos_users[u], at_ap, at_user).reshape(-1)
             for u in range(self.user_num)], axis=1)
        h_r2u = jnp.stack(
            [channel_mdl(pos_irs, pos_users[u], at_irs, at_user).reshape(-1)
             for u in range(self.user_num)], axis=1)
        h_b2r = channel_mdl(pos_ap, pos_irs, at_ap, at_irs)
        return h_b2u, h_b2r, h_r2u

    def gen_nonlos(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)

        def cn(k, shape):
            kr, ki = jax.random.split(k)
            return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)) / jnp.sqrt(2.0)

        return (
            cn(k1, (self.antenna_num, self.user_num)),
            cn(k2, (self.antenna_num, self.irs_units)),
            cn(k3, (self.irs_units, self.user_num)),
        )

    @staticmethod
    def get_chnl(h_b2u, h_b2r, h_r2u, psi) -> jnp.ndarray:
        """Aggregate channel H = H_B2R diag(psi) H_R2U + H_B2U
        (channel.py getChnl :118-121)."""
        return h_b2r @ (psi.reshape(-1)[:, None] * h_r2u) + h_b2u

    def propagation(self, key: jax.Array, signal, h, sigma) -> jnp.ndarray:
        """y = H s + n (channel.py propagation :80-83)."""
        return h @ signal + self.noise(key, sigma)

    @staticmethod
    def ch_est(y_rx, sigma2, pilot) -> jnp.ndarray:
        """MMSE channel estimate H_est = y pilot^H / (1 + sigma2)
        (channel.py CH_est :129-132)."""
        return y_rx @ (jnp.conj(pilot).T / (1.0 + sigma2))


@dataclasses.dataclass(frozen=True)
class ClusteredIRSChannel:
    """Port of clustered_SV_channel (channel.py:135-281): the IRS is tiled
    into group_scale^2 clusters of cluster_scale^2 elements; channels are
    defined per cluster; reflection phases come from geometric codebooks."""

    irs_unit_gap: float
    irs_scale: int
    irs_pos: tuple[float, float, float]
    ap_pos: tuple[float, float, float]
    cluster_scale: int
    user_num: int
    ap_num: int
    freq: float = 5e9

    @property
    def group_scale(self) -> int:
        return self.irs_scale // self.cluster_scale

    @property
    def group_num(self) -> int:
        return self.group_scale ** 2

    def _unit_positions(self) -> np.ndarray:
        """(3, G, G) cluster-anchor coordinates (channel.py:152-158):
        x advances with the row index, y with the column index."""
        g = self.group_scale
        y = np.tile(np.arange(g), (g, 1))
        x = y.T
        return np.stack([
            self.irs_pos[0] + x * self.irs_unit_gap,
            self.irs_pos[1] + y * self.irs_unit_gap,
            np.full((g, g), self.irs_pos[2]),
        ])

    def gen_los(self, pos_users):
        """(H_U2B, H_R2B, H_U2R) LoS entries per cluster
        (channel.py genLoS :172-190): scalar [0][0] of each cluster's
        steering product."""
        at_point = (1, 1, 1)
        at_group = (self.cluster_scale, self.cluster_scale, 1)
        pos_users = jnp.asarray(pos_users)
        pos = self._unit_positions()
        g = self.group_scale

        h_u2b = jnp.stack(
            [channel_mdl(jnp.asarray(self.ap_pos), pos_users[u], at_point, at_point,
                         self.freq)[0, 0] for u in range(self.user_num)]
        )[None, :]                                                     # (1, U)

        u2r, r2b = [], []
        for i in range(g):
            for j in range(g):
                unit = jnp.asarray(pos[:, i, j])
                u2r.append(jnp.stack(
                    [channel_mdl(pos_users[u], unit, at_point, at_group, self.freq)[0, 0]
                     for u in range(self.user_num)]))
                r2b.append(channel_mdl(jnp.asarray(self.ap_pos), unit, at_point,
                                       at_group, self.freq)[0, 0])
        h_u2r = jnp.stack(u2r)                                         # (G^2, U)
        h_r2b = jnp.stack(r2b)[None, :]                                # (1, G^2)
        h_u2b = jnp.broadcast_to(h_u2b, (self.ap_num, self.user_num))
        h_r2b = jnp.broadcast_to(h_r2b, (self.ap_num, self.group_num))
        return h_u2b, h_r2b, h_u2r

    def gen_chnl(self, key: jax.Array, los, k_factor: float = 10.0):
        """Rician-refresh all three matrices (channel.py genChnl :202-211).

        los: the (H_U2B, H_R2B, H_U2R) tuple from gen_los.
        Returns (H_R2B, H_U2R, H_d).
        """
        h_u2b_los, h_r2b_los, h_u2r_los = los
        k1, k2, k3 = jax.random.split(key, 3)

        def cn(k, shape):
            kr, ki = jax.random.split(k)
            return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)) / jnp.sqrt(2.0)

        a = jnp.sqrt(k_factor / (k_factor + 1.0))
        b = jnp.sqrt(1.0 / (k_factor + 1.0))
        h_d = a * h_u2b_los + b * cn(k1, h_u2b_los.shape)
        h_r2b = a * h_r2b_los + b * cn(k2, h_r2b_los.shape)
        h_u2r = a * h_u2r_los + b * cn(k3, h_u2r_los.shape)
        return h_r2b, h_u2r, h_d

    def gen_chnl_ideal(self, los, psi) -> jnp.ndarray:
        """Cascaded LoS-only IRS channel H_r = H_R2B diag(psi) H_U2R
        (channel.py genChnl_ideal :228-233)."""
        _, h_r2b, h_u2r = los
        return h_r2b @ (psi.reshape(-1)[:, None] * h_u2r)

    def gen_phase_nograd(self, theta: float, phi: float) -> jnp.ndarray:
        """Reflection phase codebook steering towards (theta, phi)
        (channel.py genPhase_nograd :248-268). Returns (G, G) complex
        unit phasors. Note the reference's theta==0 special case."""
        k = 2.0 * np.pi * self.freq / C_LIGHT
        pos = self._unit_positions()
        d = np.sqrt(((pos - np.asarray(self.ap_pos)[:, None, None]) ** 2).sum(0))
        if theta != 0:
            d1 = np.sin(theta) * np.cos(phi) * pos[1]
            d2 = np.sin(theta) * np.sin(phi) * pos[0]
        else:
            d1 = np.sin(phi) * np.cos(theta) * pos[0]
            d2 = np.zeros_like(d)
        return jnp.exp(1j * k * (d - d1 - d2))

    def gen_incidence_phase(self) -> jnp.ndarray:
        """Incident-path phase wrapped to [-pi, pi]
        (channel.py genIncidencePhase :270-281)."""
        k = 2.0 * np.pi * self.freq / C_LIGHT
        pos = self._unit_positions()
        d = np.sqrt(((pos - np.asarray(self.ap_pos)[:, None, None]) ** 2).sum(0))
        return jnp.angle(jnp.exp(1j * k * d))
