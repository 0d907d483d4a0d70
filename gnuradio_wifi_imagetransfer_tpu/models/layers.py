"""Primitive layers for the JSCE codec: GDN, SE, per-channel PReLU.

Behavioral ports of the reference's basic blocks to Flax/NHWC:
  - GDN/IGDN with the LowerBound-clamped reparameterization
    (codec/models/basic_blocks/GDN.py:7-92)
  - SeModule squeeze-excitation (RCB_DS.py:3-17)
  - per-channel PReLU (torch nn.PReLU(num_parameters=C))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    """max(x, bound) with the reference's gradient rule: gradients pass
    when x >= bound OR when they push x upward (GDN.py LowerBound:7-23)."""
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = jnp.logical_or(x >= bound, g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


class GDN(nn.Module):
    """Generalized divisive normalization y = x / sqrt(beta + x^2 @ gamma)
    (inverse: multiply). NHWC. Parameters are stored in the reference's
    reparameterized sqrt form so torch checkpoints convert 1:1."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2.0 ** -18

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.channels
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta = self.param(
            "beta", lambda k: jnp.sqrt(jnp.ones(ch) + pedestal))
        gamma = self.param(
            "gamma",
            lambda k: jnp.sqrt(self.gamma_init * jnp.eye(ch) + pedestal))

        beta_r = lower_bound(beta, beta_bound) ** 2 - pedestal
        gamma_r = lower_bound(gamma, gamma_bound) ** 2 - pedestal
        # torch applies conv2d(x^2, gamma.view(ch,ch,1,1)): out_c = sum_in
        # gamma[out, in] * x^2_in + beta[out]
        norm = jnp.sqrt(jnp.einsum("...i,oi->...o", x * x, gamma_r) + beta_r)
        return x * norm if self.inverse else x / norm


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", lambda k: jnp.full(self.channels, 0.25))
        return jnp.where(x >= 0, x, a * x)


class SeModule(nn.Module):
    """Squeeze-excitation: GAP -> 1x1 conv -> BN -> ReLU -> 1x1 conv ->
    hardsigmoid gate (RCB_DS.py:3-17)."""

    in_size: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        expand = max(self.in_size // self.reduction, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(expand, (1, 1), use_bias=False, name="conv1")(s)
        s = nn.BatchNorm(use_running_average=not train, name="bn1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.in_size, (1, 1), use_bias=False, name="conv2")(s)
        s = jax.nn.hard_sigmoid(s)
        return x * s


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.hard_swish(x)
