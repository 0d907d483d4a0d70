"""End-to-end aligned loopback: TX -> (impairment) -> RX, bit-exact.

This is the BASELINE.json config[0] correctness gate ("Single 802.11a frame
CPU loopback ... TX->RX bit-exact") plus AWGN robustness at the reference's
operating SNR band (20-30 dB, IRS_tranceiver.py:98).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
from gnuradio_wifi_imagetransfer_tpu.phy import rx, tx


@pytest.mark.parametrize("mcs", range(8))
def test_ideal_loopback_bit_exact(mcs):
    rng = np.random.default_rng(42 + mcs)
    L = 50   # reference default pdu_length (IRS_user.py:104)
    psdu = rng.integers(0, 256, (3, L), dtype=np.uint8)
    burst = tx.transmit(jnp.asarray(psdu), mcs, scrambler_seed=jnp.asarray([1, 55, 127]))
    plan = tx.tx_plan(mcs, L)
    assert burst.shape == (3, plan.n_samples)
    res = rx.decode_aligned(burst, plan, start=0)
    assert np.array_equal(np.array(res.psdu), psdu)
    assert np.all(np.array(res.sig["rate_idx"]) == mcs)
    assert np.all(np.array(res.sig["length"]) == L)
    assert np.all(np.array(res.sig["parity_ok"]))


@pytest.mark.parametrize("mcs,snr_db", [(0, 10), (2, 15), (3, 20), (5, 22), (7, 28)])
def test_awgn_loopback(mcs, snr_db):
    rng = np.random.default_rng(mcs * 100 + snr_db)
    L = 50
    psdu = rng.integers(0, 256, (4, L), dtype=np.uint8)
    burst = np.array(tx.transmit(jnp.asarray(psdu), mcs))
    sig_pow = np.mean(np.abs(burst) ** 2)
    noise_std = np.sqrt(sig_pow / (10 ** (snr_db / 10)) / 2)
    noise = noise_std * (rng.standard_normal(burst.shape) + 1j * rng.standard_normal(burst.shape))
    plan = tx.tx_plan(mcs, L)
    res = rx.decode_aligned(jnp.asarray(burst + noise), plan, start=0)
    assert np.array_equal(np.array(res.psdu), psdu), f"mcs={mcs} snr={snr_db}"


def test_flat_fading_phase_rotation():
    """A complex channel gain must be absorbed by the LS estimate."""
    rng = np.random.default_rng(9)
    L = 100
    mcs = 4
    psdu = rng.integers(0, 256, (2, L), dtype=np.uint8)
    burst = tx.transmit(jnp.asarray(psdu), mcs)
    h = 0.6 * np.exp(1j * 2.1)
    res = rx.decode_aligned(burst * h, tx.tx_plan(mcs, L), start=0)
    assert np.array_equal(np.array(res.psdu), psdu)


def test_nonzero_start_offset():
    rng = np.random.default_rng(10)
    L = 40
    mcs = 2
    psdu = rng.integers(0, 256, (2, L), dtype=np.uint8)
    burst = np.array(tx.transmit(jnp.asarray(psdu), mcs))
    padded = np.concatenate(
        [np.zeros((2, 137), np.complex64), burst, np.zeros((2, 60), np.complex64)], axis=1
    )
    res = rx.decode_aligned(jnp.asarray(padded), tx.tx_plan(mcs, L), start=137)
    assert np.array_equal(np.array(res.psdu), psdu)
    # dynamic (traced) start indices as the sync front-end produces them
    res2 = rx.decode_aligned(
        jnp.asarray(padded), tx.tx_plan(mcs, L), start=jnp.asarray([137, 137])
    )
    assert np.array_equal(np.array(res2.psdu), psdu)


@pytest.mark.parametrize("algo", [ChannelEstimator.LS, ChannelEstimator.COMB,
                                  ChannelEstimator.LMS, ChannelEstimator.STA])
def test_equalizer_algorithms(algo):
    """All four frame_equalizer algorithms (IRS_AP.py:139-141) decode a
    clean frame bit-exactly."""
    rng = np.random.default_rng(11)
    L = 60
    mcs = 3
    psdu = rng.integers(0, 256, (2, L), dtype=np.uint8)
    burst = tx.transmit(jnp.asarray(psdu), mcs)
    res = rx.decode_aligned(burst, tx.tx_plan(mcs, L), start=0, algo=algo)
    assert np.array_equal(np.array(res.psdu), psdu), algo


def test_multipath_two_tap():
    """Short two-tap multipath within the CP must be equalized by LS."""
    rng = np.random.default_rng(12)
    L = 50
    mcs = 2
    psdu = rng.integers(0, 256, (2, L), dtype=np.uint8)
    burst = np.array(tx.transmit(jnp.asarray(psdu), mcs))
    taps = np.array([1.0, 0.0, 0.25 + 0.15j], dtype=np.complex64)
    faded = np.stack([np.convolve(b, taps)[: burst.shape[1]] for b in burst])
    res = rx.decode_aligned(jnp.asarray(faded), tx.tx_plan(mcs, L), start=0)
    assert np.array_equal(np.array(res.psdu), psdu)
