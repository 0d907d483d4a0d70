"""Saleh-Valenzuela geometry channel (JAX port of utils/SV_channel.py).

Reimplements the reference's Saleh_Valenzuela_Channel behavior
(SV_channel.py:11-102): 3-D Kronecker steering vectors, LoS matrices
AP<->IRS/user, i.i.d. Rayleigh NLoS, Rician mixing with factor K, and the
AWGN-only degenerate channel — as pure functions over a geometry dataclass
with explicit PRNG keys (the reference seeds global numpy RNG instead).

Additionally provides a tapped-delay-line fading generator
(``sv_impulse_response``) so the waveform path can run 64-QAM 3/4 over
frequency-selective SV fading (BASELINE.json config[2]): classic SV
cluster/ray double-exponential power decay with Rayleigh ray gains.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def steering_vec(angle, n: int) -> jnp.ndarray:
    """exp(j*angle*pi*[0..n)) column vector (SV_channel.py:24-31)."""
    return jnp.exp(1j * angle * jnp.pi * jnp.arange(n))[:, None]


def channel_mdl(pos_a, pos_b, at_scale_a, at_scale_b) -> jnp.ndarray:
    """LoS channel between two uniform (possibly planar) arrays.

    Direction cosines of the A->B unit vector index 3-D steering vectors
    which Kronecker-combine per array axis; H = sv_A sv_B^H
    (SV_channel.py:33-49).
    """
    pos_a = jnp.asarray(pos_a, dtype=jnp.float32)
    pos_b = jnp.asarray(pos_b, dtype=jnp.float32)
    d = jnp.linalg.norm(pos_a - pos_b)
    n_ab = (pos_a - pos_b) / d
    def sv(scales):
        v = steering_vec(n_ab[0], scales[0])
        v = jnp.kron(v, steering_vec(n_ab[1], scales[1]))
        return jnp.kron(v, steering_vec(n_ab[2], scales[2]))
    sv_a, sv_b = sv(at_scale_a), sv(at_scale_b)
    return sv_a @ jnp.conj(sv_b).T


@dataclasses.dataclass(frozen=True)
class SVChannel:
    """Geometry container mirroring Saleh_Valenzuela_Channel.__init__
    (SV_channel.py:12-22)."""

    irs_scale: int
    irs_pos: tuple[float, float, float]
    ap_pos: tuple[float, float, float]
    user_num: int
    antenna_num: int

    @property
    def n_units(self) -> int:
        return self.irs_scale ** 2

    def gen_los(self, pos_users) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(H_B2R, H_R2U, H_B2U) LoS matrices (SV_channel.py:58-72)."""
        at_user = (1, 1, 1)
        at_ap = (self.antenna_num, 1, 1)
        at_irs = (self.irs_scale, self.irs_scale, 1)
        ap = jnp.asarray(self.ap_pos)
        irs = jnp.asarray(self.irs_pos)
        pos_users = jnp.asarray(pos_users)

        h_b2u = jnp.stack(
            [channel_mdl(ap, pos_users[u], at_ap, at_user).reshape(-1)
             for u in range(self.user_num)], axis=1)                     # (ant, U)
        h_r2u = jnp.stack(
            [channel_mdl(irs, pos_users[u], at_irs, at_user).reshape(-1)
             for u in range(self.user_num)], axis=1)                     # (N, U)
        h_b2r = channel_mdl(ap, irs, at_ap, at_irs)                      # (ant, N)
        return h_b2r, h_r2u, h_b2u

    def gen_nonlos(self, key: jax.Array):
        """i.i.d. CN(0,1) Rayleigh matrices (SV_channel.py:52-56)."""
        k1, k2, k3 = jax.random.split(key, 3)
        def cn(k, shape):
            kr, ki = jax.random.split(k)
            return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)) / jnp.sqrt(2.0)
        return (
            cn(k1, (self.antenna_num, self.n_units)),
            cn(k2, (self.n_units, self.user_num)),
            cn(k3, (self.antenna_num, self.user_num)),
        )

    def gen_rician(self, key: jax.Array, pos_users, k_factor: float = 10.0):
        """Rician mix sqrt(K/(K+1))*LoS + sqrt(1/(K+1))*NLoS
        (SV_channel.py:73-79)."""
        h_b2r_los, h_r2u_los, h_b2u_los = self.gen_los(pos_users)
        n_b2r, n_r2u, n_b2u = self.gen_nonlos(key)
        a = jnp.sqrt(k_factor / (k_factor + 1.0))
        b = jnp.sqrt(1.0 / (k_factor + 1.0))
        return (a * h_b2r_los + b * n_b2r,
                a * h_r2u_los + b * n_r2u,
                a * h_b2u_los + b * n_b2u)

    def gen_rayleigh(self, pos_users):
        """Pure LoS matrices (the reference's genRayleigh just returns LoS,
        SV_channel.py:86-88)."""
        return self.gen_los(pos_users)

    def gen_awgn(self):
        """Degenerate direct channel: zeros via IRS, ones AP->user
        (SV_channel.py:92-95)."""
        return (
            jnp.zeros((self.antenna_num, self.n_units), jnp.complex64),
            jnp.zeros((self.n_units, self.user_num), jnp.complex64),
            jnp.ones((self.antenna_num, self.user_num), jnp.complex64),
        )

    def aggregate(self, h_b2r, h_r2u, h_b2u, psi) -> jnp.ndarray:
        """H = H_B2R diag(psi) H_R2U + H_B2U (SV_channel.py __main__:126)."""
        return h_b2r @ (psi.reshape(-1)[:, None] * h_r2u) + h_b2u


def sv_impulse_response(
    key: jax.Array,
    n_taps: int = 8,
    cluster_rate: float = 0.25,
    ray_decay: float = 2.0,
    normalize: bool = True,
) -> jnp.ndarray:
    """Tapped-delay-line SV fading: exponentially decaying Rayleigh taps.

    Power profile p[k] ~ exp(-k/ray_decay) with a Poisson-ish cluster
    mask; returns (n_taps,) complex64 taps (unit total power when
    ``normalize``). Keeps delay spread within the 16-sample CP so the
    802.11a equalizer operates in its design regime.
    """
    kg, km = jax.random.split(key)
    kr, ki = jax.random.split(kg)
    gains = (jax.random.normal(kr, (n_taps,)) + 1j * jax.random.normal(ki, (n_taps,))) / jnp.sqrt(2.0)
    profile = jnp.exp(-jnp.arange(n_taps) / ray_decay)
    mask = jax.random.bernoulli(km, jnp.minimum(1.0, cluster_rate + profile), (n_taps,))
    taps = gains * jnp.sqrt(profile) * mask
    taps = taps.at[0].set(jnp.where(jnp.abs(taps[0]) < 1e-6, 1.0 + 0j, taps[0]))
    if normalize:
        taps = taps / jnp.linalg.norm(taps)
    return taps.astype(jnp.complex64)
