"""PropagNet: IRS propagation layer with learnable phase shifts.

Behavioral port of codec/models/basic_blocks/PropagNet.py:5-73: given an
environment (H_B2R, H_R2U, Hd), propagate a transmit signal through
every user path H_p = H_B2R @ diag(Psi) @ H_R2U[:, p] + Hd[:, p] with
Psi = exp(j*phi) and phi learnable (or zeroed when withIRS=False).

JAX-native: the per-path Python loop becomes one einsum over all paths,
and refresh_Psi takes an explicit PRNG seed instead of mutating module
state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class PropagNet(nn.Module):
    """env = (H_B2R (M, N), H_R2U (N, P), Hd (M, P)) complex arrays."""

    env: Tuple
    with_irs: bool = True

    def setup(self):
        self.h_b2r = jnp.asarray(self.env[0], jnp.complex64)
        self.h_r2u = jnp.asarray(self.env[1], jnp.complex64)
        self.hd = jnp.asarray(self.env[2], jnp.complex64)
        n = self.h_b2r.shape[1]
        if self.with_irs:
            self.phi = self.param(
                "phi", lambda k: 2 * 3.14 * jax.random.uniform(k, (n,)))
        else:
            self.phi = None

    def psi(self) -> jnp.ndarray:
        if self.phi is None:
            # withIRS=False zeroes the reflection coefficients
            # (PropagNet.py:19-21: psi_real = psi_imag = 0)
            n = self.h_b2r.shape[1]
            return jnp.zeros((n,), jnp.complex64)
        return jnp.cos(self.phi) + 1j * jnp.sin(self.phi)

    def get_csi(self, index: int = 0, psi: jnp.ndarray | None = None) -> jnp.ndarray:
        """H = H_B2R diag(Psi) H_R2U[:, index] + Hd[:, index]
        (PropagNet.py:36-43)."""
        if psi is None:
            psi = self.psi()
        return self.h_b2r @ (psi * self.h_r2u[:, index]) + self.hd[:, index]

    def __call__(self, x: jnp.ndarray):
        """Propagate x through every path; returns (Y (P, ...), CSI (P, M))
        (PropagNet.py:59-73)."""
        psi = self.psi()
        # all paths at once: csi[p] = H_B2R @ (psi * H_R2U[:, p]) + Hd[:, p]
        csi = jnp.einsum("mn,np->mp", self.h_b2r,
                         psi[:, None] * self.h_r2u) + self.hd     # (M, P)
        csi = csi.T                                               # (P, M)
        y = csi * x                                               # broadcast per path
        return y, csi


def refresh_psi(n: int, seed: int) -> jnp.ndarray:
    """Fresh random phases from an explicit seed (PropagNet.py:45-48)."""
    return 2 * 3.14 * jax.random.uniform(jax.random.PRNGKey(seed), (n,))
