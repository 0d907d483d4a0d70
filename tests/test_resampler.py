"""Polyphase resampler tests vs the scipy oracle + RX-chain integration
(the BASELINE config[2] "with resampler" requirement)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sig

from gnuradio_wifi_imagetransfer_tpu.ops import resampler as rs
from gnuradio_wifi_imagetransfer_tpu.phy import sync, tx


@pytest.mark.parametrize("interp,decim", [(2, 1), (1, 2), (3, 2), (2, 3), (5, 4)])
def test_matches_scipy_resample_poly(interp, decim):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    taps = rs.design_lowpass(interp, decim)
    got = np.asarray(rs.polyphase_resample(jnp.asarray(x), interp, decim, taps))
    ref = sig.resample_poly(x, interp, decim, window=np.asarray(taps) / interp)
    n = min(len(got), len(ref))
    # ignore filter edge transients
    edge = len(taps) // decim + 2
    np.testing.assert_allclose(got[edge : n - edge], ref[edge : n - edge],
                               atol=2e-4, rtol=1e-3)


def test_tone_frequency_scaling():
    """A tone at f0 of the input rate lands at f0*M/L of the output rate."""
    n = 4096
    f0 = 0.1
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    y = np.asarray(rs.rational_resampler(jnp.asarray(x), 2, 1))
    spec = np.abs(np.fft.fft(y[200:-200]))
    peak = np.argmax(spec) / len(spec)
    assert abs(peak - f0 / 2) < 1e-3


def test_identity_when_ratio_one():
    x = jnp.arange(32.0)
    assert np.array_equal(np.asarray(rs.rational_resampler(x, 3, 3)), np.asarray(x))


def test_fir_filter_matches_numpy():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(np.complex64)
    taps = rng.standard_normal(21).astype(np.float32)
    got = np.asarray(rs.fir_filter(jnp.asarray(x), taps))
    ref = np.convolve(x, taps)[: len(x)]
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.slow
def test_rx_after_2x_oversampled_capture():
    """Front-end rate matching: a 2x-oversampled capture is decimated by
    the polyphase resampler back to the symbol rate and decodes bit-exact
    (the SDR-hardware rate knob of IRS_AP.py:88-91, done in software)."""
    rng = np.random.default_rng(2)
    L = 50
    mcs = 2
    frames = rng.integers(0, 256, (2, L), dtype=np.uint8)
    bursts = tx.transmit(jnp.asarray(frames), mcs)
    stream = np.asarray(tx.pad_burst(bursts, 200, 400).reshape(-1))
    # emulate a 2x-rate capture (interpolate), then decimate 1/2 in RX
    captured = np.asarray(rs.rational_resampler(jnp.asarray(stream), 2, 1, taps_per_phase=16))
    recovered = rs.rational_resampler(jnp.asarray(captured), 1, 2, taps_per_phase=16)
    res, cand = sync.receive(recovered.astype(jnp.complex64), tx.tx_plan(mcs, L), max_frames=4)
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
    got = {tuple(r) for r in np.array(res.psdu)[ok]}
    assert all(tuple(f) in got for f in frames)
