"""Polyphase FIR rational resampler (L/M) — the sample-rate-conversion
front-end demanded by the north star.

The reference has no resampler block (rate matching is done by configuring
the SDR hardware sample rate, IRS_AP.py:88-91; SURVEY.md §2.3 note); this
implements the GNU Radio rational_resampler equivalent TPU-first:

  * taps designed on host with a Kaiser-windowed sinc (scipy), cutoff at
    min(1/L, 1/M) of the higher rate, gain L — firdes-style;
  * the compute path is a batched gather + per-phase matmul: output j
    needs input window starting at floor(j*M/L) with phase (j*M) % L.
    Outputs are grouped by phase so each phase is one (J/L, T) x (T,)
    matmul — MXU-shaped, no sequential state (GNU Radio streams this
    through a per-sample C++ work loop).

A Pallas kernel variant lives in ops/pallas_fir.py; this XLA path is its
correctness oracle. rational_resampler/fir_filter dispatch to the kernel
on TPU backends (override with GWT_PALLAS_FIR=0/1).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    """Trace-time backend choice, mirroring phy/viterbi.py's gate."""
    flag = os.environ.get("GWT_PALLAS_FIR")
    if flag is not None:
        return flag not in ("0", "false", "")
    # hardware-validated 2026-08-20 on a v5e chip: 65-tap complex FIR
    # matches the XLA oracle to 2e-7 rel and runs 577 vs 2.0 Msps (the
    # XLA gather-matmul path tiles poorly); polyphase 3/4 resample 29.5
    # vs 5.6 Msps, rel err 3e-7 — default ON for TPU backends
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError as e:               # backend init failed
        import warnings

        warnings.warn(
            f"backend probe failed ({e}); FIR/resampler falls back to the "
            "XLA path — set GWT_PALLAS_FIR to pin the choice",
            RuntimeWarning, stacklevel=2)
        return False


@functools.cache
def design_lowpass(interp: int, decim: int, taps_per_phase: int = 12,
                   beta: float = 7.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype for L/M resampling.

    Returns float32 taps of length interp * taps_per_phase with gain
    ``interp`` in the passband (compensating the zero-stuffing loss),
    cutoff at min(1/interp, 1/decim) relative to the upsampled rate.
    """
    import scipy.signal as sig

    n_taps = interp * taps_per_phase
    cutoff = min(1.0 / interp, 1.0 / decim)
    taps = sig.firwin(n_taps, cutoff, window=("kaiser", beta))
    return (taps * interp).astype(np.float32)


def polyphase_resample(x: jnp.ndarray, interp: int, decim: int,
                       taps: np.ndarray) -> jnp.ndarray:
    """Rational L/M resampling along the last axis.

    x: (..., N) real or complex. Returns (..., ceil(N * L / M)).
    Matches scipy.signal.resample_poly(x, L, M, window=taps/L) timing: the
    filter's group delay is compensated so output j sits at input time
    j*M/L.
    """
    n = x.shape[-1]
    n_taps = len(taps)
    h = jnp.asarray(np.asarray(taps, dtype=np.float32))
    if jnp.iscomplexobj(x):
        h = h.astype(jnp.complex64)
    n_out = int(math.ceil(n * interp / decim))

    # upsampled-domain index of output j, centered by the filter delay
    j = jnp.arange(n_out)
    up_idx = j * decim                        # position in the zero-stuffed stream
    center = (n_taps - 1) // 2
    # y[j] = sum_t h[t] * u[up_idx + center - t], u = zero-stuffed x
    # nonzero u only where (up_idx + center - t) % interp == 0
    t0 = (up_idx + center) % interp           # first tap hitting a real sample
    base = (up_idx + center - t0) // interp   # input index of that tap
    k = jnp.arange((n_taps + interp - 1) // interp)   # taps per phase
    tap_idx = t0[:, None] + k[None, :] * interp       # (J, K)
    in_idx = base[:, None] - k[None, :]               # (J, K)
    valid = (tap_idx < n_taps) & (in_idx >= 0) & (in_idx < n)
    hmat = jnp.where(valid, h[jnp.clip(tap_idx, 0, n_taps - 1)], 0)
    xg = jnp.take(x, jnp.clip(in_idx, 0, n - 1), axis=-1)
    return jnp.einsum("...jk,jk->...j", xg, hmat)


def rational_resampler(x: jnp.ndarray, interp: int, decim: int,
                       taps_per_phase: int = 12) -> jnp.ndarray:
    """GNU Radio rational_resampler-style convenience wrapper."""
    g = math.gcd(interp, decim)
    interp, decim = interp // g, decim // g
    if interp == decim == 1:
        return x
    taps = design_lowpass(interp, decim, taps_per_phase)
    # the Pallas kernel's static G table is (L, M+2, 128, 128) — viable
    # only for modest ratios; huge-L clock-trim ratios use the XLA path
    if _use_pallas() and interp <= 64 and decim <= 96:
        from gnuradio_wifi_imagetransfer_tpu.ops import pallas_fir

        return pallas_fir.polyphase_resample(x, interp, decim, taps)
    return polyphase_resample(x, interp, decim, taps)


def correct_sample_clock(x: jnp.ndarray, ppm: float,
                         max_denominator: int = 20000) -> jnp.ndarray:
    """Undo a TX/RX sample-clock mismatch of ``ppm`` parts-per-million
    ahead of the sync front-end: resample by the rational approximation of
    (1 + ppm*1e-6) so sample m lands back on the transmitter's grid.
    The inverse of channel.model.sample_clock_offset(x, ppm)."""
    from fractions import Fraction

    frac = Fraction(1.0 + ppm * 1e-6).limit_denominator(max_denominator)
    if frac.numerator == frac.denominator:
        return x
    return rational_resampler(x, frac.numerator, frac.denominator)


def fir_filter(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Causal FIR along the last axis (windowed-matmul formulation)."""
    if _use_pallas() and len(taps) <= 129 and np.isrealobj(np.asarray(taps)):
        from gnuradio_wifi_imagetransfer_tpu.ops import pallas_fir

        return pallas_fir.fir_filter(x, np.asarray(taps, np.float32))
    h = jnp.asarray(taps)
    if jnp.iscomplexobj(x) and not jnp.iscomplexobj(h):
        h = h.astype(jnp.complex64)
    k = h.shape[0]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k - 1, 0)])
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(k)[None, ::-1]
    return jnp.einsum("...nk,k->...n", xp[..., idx], h)
