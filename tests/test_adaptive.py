"""Adaptive-MCS reception: SIGNAL-steered per-frame decode
(parallel/adaptive.py), mirroring frame_equalizer + decode_mac's
runtime rate/length handling."""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.parallel import AdaptiveReceiver
from gnuradio_wifi_imagetransfer_tpu.phy import tx


def _stream_with(frames_by_mcs, n, seed=0, noise=0.004, gap=9000, pos0=500):
    """frames_by_mcs: list of (mcs, psdu ndarray). Returns (stream, truth)."""
    rng = np.random.default_rng(seed)
    x = np.zeros(n, np.complex64)
    truth = []
    pos = pos0
    for mcs, psdu in frames_by_mcs:
        burst = np.asarray(tx.transmit(jnp.asarray(psdu[None]), mcs))[0]
        x[pos:pos + burst.size] += 0.5 * burst
        truth.append((pos, mcs, psdu))
        pos += gap
    x += noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    return x, truth


def test_mixed_mcs_stream():
    rng = np.random.default_rng(1)
    jobs = [(0, rng.integers(0, 256, 40, dtype=np.uint8)),
            (2, rng.integers(0, 256, 100, dtype=np.uint8)),
            (5, rng.integers(0, 256, 64, dtype=np.uint8))]
    x, truth = _stream_with(jobs, 1 << 15)
    rx = AdaptiveReceiver(max_psdu=256, max_frames=4)
    frames = rx.receive(x)
    assert len(frames) == 3
    for f, (pos, mcs, psdu) in zip(frames, truth):
        assert f.rate_idx == mcs
        assert f.length == psdu.size
        np.testing.assert_array_equal(f.psdu, psdu)
        assert abs(f.start - pos) < 200


def test_repeated_length_uses_one_bucket():
    rng = np.random.default_rng(2)
    psdus = [rng.integers(0, 256, 50, dtype=np.uint8) for _ in range(3)]
    x, truth = _stream_with([(3, p) for p in psdus], 1 << 15)
    rx = AdaptiveReceiver(max_psdu=128, max_frames=4)
    frames = rx.receive(x)
    assert len(frames) == 3
    for f, (_, _, psdu) in zip(frames, truth):
        np.testing.assert_array_equal(f.psdu, psdu)


def test_noise_only_stream_yields_nothing():
    rng = np.random.default_rng(3)
    n = 1 << 14
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    rx = AdaptiveReceiver(max_psdu=128, max_frames=4)
    assert rx.receive(x) == []


def test_short_stream_padded():
    rng = np.random.default_rng(4)
    psdu = rng.integers(0, 256, 30, dtype=np.uint8)
    burst = np.asarray(tx.transmit(jnp.asarray(psdu[None]), 1))[0]
    x = np.zeros(burst.size + 400, np.complex64)
    x[200:200 + burst.size] = 0.4 * burst
    x += 0.003 * (rng.standard_normal(x.size)
                  + 1j * rng.standard_normal(x.size)).astype(np.complex64)
    rx = AdaptiveReceiver(max_psdu=256, max_frames=2)
    frames = rx.receive(x)
    assert len(frames) == 1 and frames[0].rate_idx == 1
    np.testing.assert_array_equal(frames[0].psdu, psdu)
