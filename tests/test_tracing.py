"""Observability: per-stage counters, SNR probes, executor integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.phy import params, tx
from gnuradio_wifi_imagetransfer_tpu.utils import tracing


def test_tracer_counts_and_summary():
    tr = tracing.Tracer()
    with tr.stage("demod", samples=1000, frames=2):
        pass
    tr.count("demod", samples=500)
    rep = tr.report()
    assert rep["demod"].samples == 1500
    assert rep["demod"].frames == 2
    assert rep["demod"].calls == 2
    assert "demod" in tr.summary()
    tr.reset()
    assert tr.report() == {}


def test_evm_snr_db_tracks_noise():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (4, 6, 48)).astype(np.float32)
    from gnuradio_wifi_imagetransfer_tpu.phy import mapping
    clean = mapping.map_bits(jnp.asarray(bits.reshape(4, -1)), 0).reshape(4, 6, 48)
    for snr_db in (10.0, 25.0):
        sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
        noise = sigma * (rng.standard_normal(clean.shape)
                         + 1j * rng.standard_normal(clean.shape))
        est = np.asarray(tracing.evm_snr_db(clean + noise, 0))
        assert est.shape == (4,)
        assert np.all(np.abs(est - snr_db) < 2.0), (snr_db, est)


def test_snr_probe_m2m4():
    rng = np.random.default_rng(1)
    probe = tracing.SnrProbe(alpha=0.05)
    # QPSK-like unit-modulus symbols + 15 dB AWGN
    snr_db = 15.0
    sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
    est = float("nan")
    for _ in range(200):
        s = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, 256)))
        s = s + sigma * (rng.standard_normal(256) + 1j * rng.standard_normal(256))
        est = probe.update(s)
    assert abs(est - snr_db) < 2.0, est


def test_profile_noop():
    with tracing.profile(None):
        pass


def test_executor_reports_stages_and_snr():
    from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
    from gnuradio_wifi_imagetransfer_tpu.parallel import StreamExecutor

    mcs, psdu_len = 0, 40
    plan = tx.tx_plan(mcs, psdu_len)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, psdu_len), dtype=np.uint8)
    bursts = np.asarray(tx.transmit(jnp.asarray(frames), mcs))
    n = 16384
    x = np.zeros(n, np.complex64)
    for i, b in enumerate(bursts):
        x[500 + i * 6000 : 500 + i * 6000 + b.size] = 0.5 * b
    x += 0.003 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    tr = tracing.Tracer()
    ex = StreamExecutor(plan, exec_cfg=ExecutorConfig(
        block_size=8192, time_shards=2, max_frames_per_block=2), tracer=tr)
    recs = [r for r in ex.run(x) if r.parity_ok]
    assert len(recs) == 2
    for r in recs:
        assert np.isfinite(r.snr_db) and r.snr_db > 10.0
    rep = tr.report()
    assert rep["device_step"].samples == n
    assert rep["collect"].frames == 2
    assert rep["device_step"].seconds > 0


def test_constellation_probe_ring():
    from gnuradio_wifi_imagetransfer_tpu.utils.tracing import ConstellationProbe

    p = ConstellationProbe(capacity=8)
    p.push(np.arange(5) + 1j * np.arange(5))
    assert p.points().shape == (5, 2)
    p.push(np.arange(5, 11) + 0j)          # wraps: 11 total, keeps last 8
    pts = p.points()
    assert pts.shape == (8, 2)
    np.testing.assert_allclose(pts[:, 0], np.arange(3, 11))
    assert p.points(3).shape == (3, 2)
    np.testing.assert_allclose(p.points(3)[:, 0], np.arange(8, 11))


def test_spectrum_probe_tone_peak():
    from gnuradio_wifi_imagetransfer_tpu.utils.tracing import SpectrumProbe

    p = SpectrumProbe(nfft=256, alpha=1.0)
    assert np.all(p.psd_db() <= -199)      # empty floor
    n = np.arange(4096)
    tone = np.exp(2j * np.pi * 0.125 * n).astype(np.complex64)  # +fs/8
    p.update(tone)
    psd = p.psd_db()
    # fftshifted: +fs/8 lands at bin nfft/2 + nfft/8
    assert int(np.argmax(psd)) == 256 // 2 + 256 // 8
