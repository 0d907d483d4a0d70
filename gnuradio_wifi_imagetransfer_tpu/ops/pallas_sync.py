"""Pallas TPU kernel: the fused 802.11 sync front-end statistics.

The reference computes the STF detector with a graph of six streaming
blocks — delay(16) -> conjugate -> multiply -> moving_average_cc(48),
|x|^2 -> moving_average_ff(64), divide (IRS_AP.py:276-285,294-316).
SURVEY §2.3 prescribes "one fused windowed-correlation kernel"; this is
it. Every stage becomes a static banded-matrix matmul on 128-sample row
tiles (the machinery of ops/pallas_fir.py):

    shift-by-16      y = x_cur @ A16 + x_prev @ B16      (delta FIR)
    m = x * conj(x>>16)                                   (VPU)
    a = movsum48(m)  = m_cur @ A48 + m_prev @ B48
    p = movsum64(|x|^2)
    c = |a| / p

One kernel pass produces (a_re, a_im, p, c) for 128x128 samples with 14
MXU matmuls — no cumsum chains, no gathers, and bit-compatible zero
history at the stream start (matching phy/sync.sync_stats' zero padding).
phy/sync.sync_stats is the XLA oracle; after on-hardware validation
(v5e, 2026-08-20: 1.5e-6 rel parity, 580 vs 373 Msps) this kernel is the
DEFAULT on TPU backends — override with GWT_PALLAS_SYNC=0/1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnuradio_wifi_imagetransfer_tpu.ops.pallas_fir import _fir_mats

_HI = jax.lax.Precision.HIGHEST


@functools.cache
def _mats():
    # NOTE: cached as NUMPY, not jnp — jnp.asarray inside a jit trace
    # yields tracers, and caching those leaks them across traces (same
    # pitfall documented at phy/viterbi.py _tables). Callers convert;
    # the conversion folds to constants under jit.
    h16 = np.zeros(17, np.float32)
    h16[16] = 1.0
    a16, b16 = _fir_mats(h16.tobytes(), 17)
    a48, b48 = _fir_mats(np.ones(48, np.float32).tobytes(), 48)
    a64, b64 = _fir_mats(np.ones(64, np.float32).tobytes(), 64)
    return (a16, b16, a48, b48, a64, b64)


def _kernel(xr0, xr1, xr2, xi0, xi1, xi2, a16, b16, a48, b48, a64, b64,
            ar_ref, ai_ref, p_ref, c_ref):
    def dot(x, m):
        return jnp.dot(x[:], m[:], preferred_element_type=jnp.float32,
                       precision=_HI)

    # delayed signal for the current and previous tiles
    xs0_r = dot(xr0, a16) + dot(xr1, b16)
    xs0_i = dot(xi0, a16) + dot(xi1, b16)
    xs1_r = dot(xr1, a16) + dot(xr2, b16)
    xs1_i = dot(xi1, a16) + dot(xi2, b16)
    # m = x * conj(x >> 16)
    m0_r = xr0[:] * xs0_r + xi0[:] * xs0_i
    m0_i = xi0[:] * xs0_r - xr0[:] * xs0_i
    m1_r = xr1[:] * xs1_r + xi1[:] * xs1_i
    m1_i = xi1[:] * xs1_r - xr1[:] * xs1_i
    ar = dot(m0_r, a48) + dot(m1_r, b48)
    ai = dot(m0_i, a48) + dot(m1_i, b48)
    e0 = xr0[:] * xr0[:] + xi0[:] * xi0[:]
    e1 = xr1[:] * xr1[:] + xi1[:] * xi1[:]
    p = dot(e0, a64) + dot(e1, b64)
    ar_ref[:] = ar
    ai_ref[:] = ai
    p_ref[:] = p
    c_ref[:] = jnp.sqrt(ar * ar + ai * ai) / jnp.maximum(p, 1e-12)


_RB = 128          # row tile: full (128, 128) MXU operands


def _stats_1d(x: jnp.ndarray, interpret: bool):
    """x: (N,) complex64 -> (a, p, c) as in phy/sync.sync_stats."""
    n = x.shape[-1]
    n_pad = -(-n // (128 * _RB)) * (128 * _RB)
    xr = jnp.pad(jnp.real(x).astype(jnp.float32), (0, n_pad - n)).reshape(-1, 128)
    xi = jnp.pad(jnp.imag(x).astype(jnp.float32), (0, n_pad - n)).reshape(-1, 128)
    rows = xr.shape[0]
    # two zero history rows ahead of the stream (the kernel reads r-1, r-2)
    xr2 = jnp.pad(xr, ((2, 0), (0, 0)))
    xi2 = jnp.pad(xi, ((2, 0), (0, 0)))
    mats = tuple(jnp.asarray(m) for m in _mats())

    grid = (rows // _RB,)
    cur = pl.BlockSpec((_RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    # the kernel needs rows r, r-1, r-2: three row-shifted views of the
    # zero-history-padded array, all tiled with the same block spec
    x_r0, x_r1, x_r2 = xr2[2:], xr2[1:-1], xr2[:-2]
    y_i0, y_i1, y_i2 = xi2[2:], xi2[1:-1], xi2[:-2]

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[cur] * 6 + [mat] * 6,
        out_specs=tuple([cur] * 4),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, 128), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
    )(x_r0, x_r1, x_r2, y_i0, y_i1, y_i2, *mats)
    ar, ai, p, c = (o.reshape(-1)[:n] for o in outs)
    a = (ar + 1j * ai).astype(jnp.complex64)
    return a, p, c


def sync_stats(x: jnp.ndarray, interpret: bool = False):
    """Drop-in for phy.sync.sync_stats: (..., N) complex -> (a, p, c)."""
    lead = x.shape[:-1]
    flat = x.reshape((-1, x.shape[-1]))
    outs = [_stats_1d(flat[i], interpret) for i in range(flat.shape[0])]
    a = jnp.stack([o[0] for o in outs]).reshape(lead + (x.shape[-1],))
    p = jnp.stack([o[1] for o in outs]).reshape(lead + (x.shape[-1],))
    c = jnp.stack([o[2] for o in outs]).reshape(lead + (x.shape[-1],))
    return a, p, c
