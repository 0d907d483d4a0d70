"""Pallas 64-pt FFT kernel vs the jnp.fft oracle (interpret mode on CPU).

The oracle is phy/ofdm.py's jnp.fft formulation (forced via
GWT_PALLAS_FFT=0 semantics — called directly here), per VERDICT r1 item 5:
kernels must bit-match their XLA oracles.
"""

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.ops import pallas_fft
from gnuradio_wifi_imagetransfer_tpu.phy import params


def _oracle_fft(x):
    return (jnp.fft.fftshift(jnp.fft.fft(x, axis=-1), axes=-1)
            / params.IFFT_SCALE).astype(jnp.complex64)


def _oracle_ifft(x):
    return (jnp.fft.ifft(jnp.fft.ifftshift(x, axes=-1), axis=-1)
            * params.IFFT_SCALE).astype(jnp.complex64)


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)


def test_fft64_matches_oracle():
    x = _rand((7, 3, 64), 0)
    got = np.asarray(pallas_fft.fft64(jnp.asarray(x), interpret=True))
    want = np.asarray(_oracle_fft(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ifft64_matches_oracle():
    x = _rand((5, 64), 1)
    got = np.asarray(pallas_fft.ifft64(jnp.asarray(x), interpret=True))
    want = np.asarray(_oracle_ifft(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roundtrip_and_odd_batch():
    # batch sizes that straddle the 512-row tile padding
    for b, seed in [(1, 2), (513, 3)]:
        x = _rand((b, 64), seed)
        spec = pallas_fft.fft64(jnp.asarray(x), interpret=True)
        back = pallas_fft.ifft64(spec, interpret=True)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)
