"""Pallas TPU kernels: dense FIR and polyphase rational resampling as
static banded-matrix matmuls on the MXU.

GNU Radio streams FIRs through per-sample C++ work loops (the sync
front-end's moving averages, IRS_AP.py:294-316) and has no resampler at
all (rate matching is configured in SDR hardware, IRS_AP.py:88-91); the
north star demands a polyphase resampling front-end. XLA expresses these
as windowed gathers (ops/resampler.py — the correctness oracle); gathers
lower poorly on TPU. Here convolution becomes matmuls against STATIC
banded Toeplitz matrices built from the taps at trace time:

  fir_filter   y_tile = x_tile @ A + x_prev_tile @ B
      A[i, j] = h[j - i], B[i, j] = h[128 + j - i] — two (128, 128)
      matmuls per 128 outputs, zero dynamic indexing, taps <= 129.

  polyphase_resample   output phase p (j = p + L*t) is a stride-M FIR
      y_p[t] = sum_k h_p[k] x[b0_p + M t - k]; with outputs tiled
      t = 128 u + dt and the input pre-staged as RT[q, u] =
      x_pad[128 M u + q], each (dt, u)-tile is sum_c G[p,c] @ RT_c —
      (M+2) static (128, 128) MXU matmuls per 16384 outputs, output
      tiles riding the 128-lane axis.

Oracles: ops/resampler.fir_filter / polyphase_resample; parity is locked
by tests/test_pallas_fir.py in interpret mode and the resampler module
dispatches here on TPU backends (GWT_PALLAS_FIR=0/1 overrides).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RB = 8            # sublane rows per FIR grid step (f32 min tile)


# ----------------------------------------------------------------------
# dense causal FIR
# ----------------------------------------------------------------------

@functools.cache
def _fir_mats(taps_key: bytes, n_taps: int) -> tuple[np.ndarray, np.ndarray]:
    h = np.frombuffer(taps_key, dtype=np.float32)
    assert h.size == n_taps <= 129, "banded-Toeplitz FIR supports <= 129 taps"
    i = np.arange(128)[:, None]
    j = np.arange(128)[None, :]
    d_cur = j - i                   # tap index hit by current-tile sample i
    d_prev = j + 128 - i            # ... by previous-tile sample i
    a = np.where((d_cur >= 0) & (d_cur < n_taps), h[np.clip(d_cur, 0, n_taps - 1)], 0)
    b = np.where((d_prev >= 0) & (d_prev < n_taps), h[np.clip(d_prev, 0, n_taps - 1)], 0)
    return a.astype(np.float32), b.astype(np.float32)


def _fir_kernel(xc_ref, xp_ref, a_ref, b_ref, y_ref):
    y_ref[:] = (
        jnp.dot(xc_ref[:], a_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(xp_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )


def _fir_real(x: jnp.ndarray, taps: np.ndarray, interpret: bool) -> jnp.ndarray:
    """x: (B, N) float32 -> causal FIR along the last axis."""
    bsz, n = x.shape
    n_pad = -(-n // 128) * 128
    xm = jnp.pad(x, ((0, 0), (0, n_pad - n))).reshape(bsz, n_pad // 128, 128)
    # previous-tile view; the zero first row keeps batches independent
    xs = jnp.pad(xm, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    rows = bsz * (n_pad // 128)
    xc = xm.reshape(rows, 128)
    xp = xs.reshape(rows, 128)
    rows_pad = -(-rows // _RB) * _RB
    if rows_pad != rows:
        xc = jnp.pad(xc, ((0, rows_pad - rows), (0, 0)))
        xp = jnp.pad(xp, ((0, rows_pad - rows), (0, 0)))
    a, b = _fir_mats(np.asarray(taps, np.float32).tobytes(), len(taps))

    y = pl.pallas_call(
        _fir_kernel,
        grid=(rows_pad // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32),
        interpret=interpret,
    )(xc, xp, jnp.asarray(a), jnp.asarray(b))
    return y[:rows].reshape(bsz, n_pad)[:, :n]


def fir_filter(x: jnp.ndarray, taps: np.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Causal FIR along the last axis; drop-in for resampler.fir_filter."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    if jnp.iscomplexobj(x):
        stacked = jnp.concatenate(
            [jnp.real(flat), jnp.imag(flat)]).astype(jnp.float32)
        y = _fir_real(stacked, taps, interpret)
        b = flat.shape[0]
        out = (y[:b] + 1j * y[b:]).astype(jnp.complex64)
    else:
        out = _fir_real(flat.astype(jnp.float32), taps, interpret)
    return out.reshape(lead + (n,))


# ----------------------------------------------------------------------
# polyphase rational resampler
# ----------------------------------------------------------------------

_PAD = 128          # left zero-pad rows ahead of x (covers h's group delay)


@functools.cache
def _resample_g(taps_key: bytes, n_taps: int, interp: int,
                decim: int) -> np.ndarray:
    """Static G: (L, M+1, 128, 128); G[p, c][dt, i] multiplies
    RT[128 c + i, u] into output t = 128 u + dt of phase p."""
    h = np.frombuffer(taps_key, dtype=np.float32)
    assert h.size == n_taps
    l, m = interp, decim
    center = (n_taps - 1) // 2
    k_pp = (n_taps + l - 1) // l
    # staging rows q = _PAD + b0 + m*dt - k span < 128*(m+2) when
    # b0 (< m + center/l) stays below ~120 extra samples
    assert (center // l) + m <= 120, "decim too large for this kernel"
    g = np.zeros((l, m + 2, 128, 128), np.float32)
    dt = np.arange(128)
    for p in range(l):
        t0 = (p * m + center) % l
        b0 = (p * m + center - t0) // l
        for k in range(k_pp):
            tap = t0 + k * l
            if tap >= n_taps:
                continue
            q = _PAD + b0 + m * dt - k          # row in the RT staging view
            c, i = q // 128, q % 128
            g[p, c, dt, i] += h[tap]
    return g


def _resample_kernel(rt_ref, g_ref, y_ref):
    m1 = g_ref.shape[1]
    acc = jnp.zeros((128, 128), jnp.float32)
    for c in range(m1):                          # static unroll, M+1 matmuls
        acc += jnp.dot(g_ref[0, c], rt_ref[pl.ds(c * 128, 128), :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    y_ref[0] = acc


def _resample_real(x: jnp.ndarray, interp: int, decim: int,
                   taps: np.ndarray, n_out: int, interpret: bool) -> jnp.ndarray:
    """x: (N,) float32 -> (n_out,) resampled at rate L/M."""
    l, m = interp, decim
    n = x.shape[-1]
    t_total = -(-n_out // l)                     # outputs per phase
    u = -(-t_total // 128)                       # 128-output tiles per phase
    u_pad = -(-u // 128) * 128                   # lane-dim padding
    # staging view: RT[q, u] = x_pad[128 M u + q]
    need = 128 * m * (u_pad - 1) + 128 * (m + 2)
    x_pad = jnp.pad(x, (_PAD, max(0, need - (_PAD + n))))
    q = jnp.arange(128 * (m + 2))
    uu = jnp.arange(u_pad)
    rt = x_pad[128 * m * uu[None, :] + q[:, None]]          # ((M+1)128, U)
    g = _resample_g(np.asarray(taps, np.float32).tobytes(), len(taps), l, m)

    y = pl.pallas_call(
        _resample_kernel,
        grid=(l, u_pad // 128),
        in_specs=[
            pl.BlockSpec((128 * (m + 2), 128), lambda p, r: (0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m + 2, 128, 128), lambda p, r: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda p, r: (p, 0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, 128, u_pad), jnp.float32),
        interpret=interpret,
    )(rt, jnp.asarray(g))
    # y[p, dt, u] -> y_p[t = 128 u + dt] -> out[j = p + L t]
    per_phase = jnp.swapaxes(y, 1, 2).reshape(l, 128 * u_pad)[:, :t_total]
    return per_phase.T.reshape(-1)[:n_out]


def polyphase_resample(x: jnp.ndarray, interp: int, decim: int,
                       taps: np.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Rational L/M resampling along the last axis; drop-in for
    resampler.polyphase_resample (same Kaiser-sinc timing/centering)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    n_out = int(math.ceil(n * interp / decim))
    flat = x.reshape(-1, n)
    parts = []
    for row in range(flat.shape[0]):
        xi = flat[row]
        if jnp.iscomplexobj(x):
            re = _resample_real(jnp.real(xi).astype(jnp.float32),
                                interp, decim, taps, n_out, interpret)
            im = _resample_real(jnp.imag(xi).astype(jnp.float32),
                                interp, decim, taps, n_out, interpret)
            parts.append((re + 1j * im).astype(jnp.complex64))
        else:
            parts.append(_resample_real(xi.astype(jnp.float32),
                                        interp, decim, taps, n_out, interpret))
    out = jnp.stack(parts)
    return out.reshape(lead + (n_out,))
