"""Waveform-level channel impairments: AWGN + CFO + multipath.

JAX equivalent of GNU Radio's channels.channel_model as configured in the
reference loopback harness (IRS_tranceiver.py:282-288: noise_voltage=1,
frequency_offset=epsilon*freq/10e6, taps=[1.0]) together with the SNR
pre-scaling multiply_const(10^(snr/20)) (IRS_tranceiver.py:294).

All functions are pure (PRNG key in, samples out) and batch over leading
axes, so impairment sweeps vmap across frames/SNRs/channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(key: jax.Array, x: jnp.ndarray, noise_voltage: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Add complex white Gaussian noise with per-component std
    noise_voltage/sqrt(2) (total noise power = noise_voltage^2), matching
    channel_model's noise_voltage convention."""
    kr, ki = jax.random.split(key)
    nv = jnp.asarray(noise_voltage)
    std = nv / jnp.sqrt(2.0)
    n = std * (jax.random.normal(kr, x.shape) + 1j * jax.random.normal(ki, x.shape))
    return (x + n).astype(jnp.complex64)


def apply_cfo(x: jnp.ndarray, frequency_offset: float | jnp.ndarray) -> jnp.ndarray:
    """Carrier frequency offset. ``frequency_offset`` is normalized to the
    sample rate (cycles/sample), the channel_model convention."""
    n = jnp.arange(x.shape[-1])
    rot = jnp.exp(2j * jnp.pi * jnp.asarray(frequency_offset)[..., None] * n)
    return (x * rot).astype(jnp.complex64)


def multipath(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """FIR multipath: y[n] = sum_k taps[k] x[n-k] (causal, same length)."""
    taps = jnp.asarray(taps, dtype=jnp.complex64)
    k = taps.shape[-1]
    if k == 1:
        return (x * taps[..., 0]).astype(jnp.complex64)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k - 1, 0)])
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(k)[None, ::-1]
    # windows (..., N, K) @ taps (K,) — batched matmul keeps it MXU-friendly
    win = xp[..., idx]
    return jnp.einsum("...nk,k->...n", win, taps).astype(jnp.complex64)


def sample_clock_offset(x: jnp.ndarray, ppm: float, n_taps: int = 16) -> jnp.ndarray:
    """Sample-clock (timing) offset: resample x at rate (1 + ppm*1e-6).

    Models GNU Radio channel_model's epsilon parameter (the TX/RX ADC
    clock mismatch the reference leaves at 1.0, IRS_tranceiver.py:286) as
    windowed-sinc fractional interpolation: y[m] = x(m * (1 + delta)).
    Output is slightly shorter than the input when delta > 0.
    """
    delta = ppm * 1e-6
    n = x.shape[-1]
    n_out = int(n / max(1.0 + delta, 1e-9)) - n_taps
    t = jnp.arange(n_out) * (1.0 + delta)
    base = jnp.floor(t).astype(jnp.int32)
    frac = (t - base).astype(jnp.float32)
    k = jnp.arange(-(n_taps // 2 - 1), n_taps // 2 + 1)          # (K,)
    idx = jnp.clip(base[:, None] + k[None, :], 0, n - 1)         # (M, K)
    arg = k[None, :] - frac[:, None]
    # windowed sinc, Hann window evaluated continuously over the tap span
    w = jnp.sinc(arg) * (0.5 + 0.5 * jnp.cos(jnp.pi * arg / (n_taps // 2 + 1)))
    w = (w / jnp.sum(w, axis=-1, keepdims=True)).astype(jnp.float32)
    y = jnp.einsum("...mk,mk->...m", x[..., idx], w.astype(x.dtype))
    return y.astype(jnp.complex64)


def channel_model(
    key: jax.Array,
    x: jnp.ndarray,
    noise_voltage: float | jnp.ndarray = 1.0,
    frequency_offset: float | jnp.ndarray = 0.0,
    taps=(1.0,),
    snr_db: float | jnp.ndarray | None = None,
    clock_ppm: float = 0.0,
) -> jnp.ndarray:
    """Full loopback channel.

    Mirrors the reference chain TX -> multiply_const(10^(snr/20)) ->
    channel_model(noise_voltage=1, freq_offset, taps) -> RX
    (IRS_tranceiver.py:282-294). If ``snr_db`` is given, the signal is
    pre-scaled by 10^(snr/20) exactly as the loopback slider does;
    otherwise the caller owns scaling.
    """
    if snr_db is not None:
        x = x * jnp.asarray(10.0, dtype=jnp.float32) ** (jnp.asarray(snr_db) / 20.0)
    y = multipath(x, jnp.asarray(taps))
    y = apply_cfo(y, frequency_offset)
    if clock_ppm:
        y = sample_clock_offset(y, clock_ppm)
    return awgn(key, y, noise_voltage)


def epsilon_to_frequency_offset(epsilon: float, carrier_hz: float = 5e9) -> float:
    """Convert the reference GUI's epsilon slider (raw fractional offset in
    [-20e-6, 20e-6], IRS_tranceiver.py:121) to the channel_model's
    normalized cycles/sample value using the flowgraph's exact expression
    epsilon * freq / 10e6 (IRS_tranceiver.py:284 — note the hardcoded 10e6
    denominator, independent of samp_rate)."""
    return epsilon * carrier_hz / 10e6
