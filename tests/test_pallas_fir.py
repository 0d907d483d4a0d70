"""Pallas FIR / polyphase-resampler kernels vs the ops/resampler.py XLA
oracles (interpret mode on CPU) — VERDICT r1 item 5."""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.ops import pallas_fir, resampler


def _rand(shape, seed, cplx):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape)
    if cplx:
        x = x + 1j * rng.standard_normal(shape)
        return x.astype(np.complex64)
    return x.astype(np.float32)


@pytest.mark.parametrize("n_taps", [5, 48, 129])
@pytest.mark.parametrize("cplx", [False, True])
def test_fir_matches_oracle(n_taps, cplx):
    rng = np.random.default_rng(n_taps)
    taps = rng.standard_normal(n_taps).astype(np.float32)
    x = _rand((2, 300), 7, cplx)
    got = np.asarray(pallas_fir.fir_filter(jnp.asarray(x), taps, interpret=True))
    want = np.asarray(resampler.fir_filter(jnp.asarray(x), taps))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fir_batch_isolation():
    """The previous-tile view must not leak samples across batch rows."""
    taps = np.ones(64, np.float32)
    x = np.zeros((2, 256), np.float32)
    x[0, 250] = 1.0            # near the end of batch 0
    got = np.asarray(pallas_fir.fir_filter(jnp.asarray(x), taps, interpret=True))
    assert got[1].max() == 0.0


@pytest.mark.parametrize("interp,decim", [(1, 2), (2, 1), (3, 4), (4, 3), (5, 2)])
@pytest.mark.parametrize("cplx", [False, True])
def test_polyphase_matches_oracle(interp, decim, cplx):
    taps = resampler.design_lowpass(interp, decim)
    x = _rand((600,), interp * 10 + decim, cplx)
    got = np.asarray(pallas_fir.polyphase_resample(
        jnp.asarray(x), interp, decim, taps, interpret=True))
    want = np.asarray(resampler.polyphase_resample(
        jnp.asarray(x), interp, decim, taps))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_polyphase_batched():
    taps = resampler.design_lowpass(2, 3)
    x = _rand((2, 4, 90), 9, True)
    got = np.asarray(pallas_fir.polyphase_resample(
        jnp.asarray(x), 2, 3, taps, interpret=True))
    want = np.asarray(resampler.polyphase_resample(jnp.asarray(x), 2, 3, taps))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
