"""Channel model tests + the BASELINE config[2] workload
(64-QAM 3/4 over Saleh-Valenzuela fading with pilot tracking)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.channel import (
    ClusteredIRSChannel, IRSChannel, SVChannel, apply_cfo, awgn, channel_model,
)
from gnuradio_wifi_imagetransfer_tpu.channel import model as chmodel
from gnuradio_wifi_imagetransfer_tpu.channel.sv import sv_impulse_response
from gnuradio_wifi_imagetransfer_tpu.phy import rx, sync, tx


def test_awgn_power():
    key = jax.random.key(0)
    x = jnp.zeros(200_000, jnp.complex64)
    y = awgn(key, x, noise_voltage=0.5)
    assert np.isclose(np.mean(np.abs(np.array(y)) ** 2), 0.25, rtol=0.05)


def test_cfo_pure_rotation():
    x = jnp.ones(1000, jnp.complex64)
    y = np.array(apply_cfo(x, 0.01))
    np.testing.assert_allclose(np.angle(y[100] * np.conj(y[99])), 2 * np.pi * 0.01, atol=1e-5)
    assert np.allclose(np.abs(y), 1.0, atol=1e-5)


def test_multipath_matches_numpy_convolve():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(np.complex64)
    taps = np.array([0.8, 0.1 - 0.2j, 0.05j], np.complex64)
    y = np.array(chmodel.multipath(jnp.asarray(x), jnp.asarray(taps)))
    ref = np.convolve(x, taps)[: x.size]
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_epsilon_conversion_matches_flowgraph_expression():
    # IRS_tranceiver.py:284: frequency_offset = epsilon * freq / 10e6
    assert np.isclose(chmodel.epsilon_to_frequency_offset(20e-6, 5e9), 0.01)


def test_reference_loopback_settings_decode():
    """TX -> 10^(snr/20) -> channel_model(noise_voltage=1, cfo, [1.0]) -> RX,
    the exact IRS_tranceiver configuration at snr=22 dB, epsilon=10e-6."""
    rng = np.random.default_rng(3)
    L = 50
    mcs = 3  # loopback default QPSK 3/4 (IRS_tranceiver.py:91)
    frames = rng.integers(0, 256, (3, L), dtype=np.uint8)
    bursts = tx.transmit(jnp.asarray(frames), mcs)
    stream = tx.pad_burst(bursts, pad_front=100, pad_tail=400, scale=0.6).reshape(-1)
    foff = chmodel.epsilon_to_frequency_offset(10e-6, 5e9)
    y = channel_model(jax.random.key(1), stream, noise_voltage=1.0,
                      frequency_offset=foff, snr_db=22.0)
    res, cand = sync.receive(y, tx.tx_plan(mcs, L), max_frames=6)
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
    got = {tuple(r) for r in np.array(res.psdu)[ok]}
    assert all(tuple(f) in got for f in frames)


def test_sv_fading_64qam34_pilot_tracking():
    """BASELINE config[2]: 64-QAM 3/4 over SV tapped-delay fading."""
    rng = np.random.default_rng(7)
    L = 100
    mcs = 7
    frames = rng.integers(0, 256, (2, L), dtype=np.uint8)
    bursts = tx.transmit(jnp.asarray(frames), mcs)
    stream = tx.pad_burst(bursts, pad_front=150, pad_tail=300).reshape(-1)
    decoded = 0
    for trial in range(6):
        taps = sv_impulse_response(jax.random.key(trial), n_taps=6, ray_decay=1.5)
        y = channel_model(jax.random.key(100 + trial), stream, noise_voltage=0.5 * 10 ** (-30 / 20),
                          frequency_offset=2e-3, taps=taps)
        res, cand = sync.receive(y, tx.tx_plan(mcs, L), max_frames=4)
        ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
        got = {tuple(r) for r in np.array(res.psdu)[ok]}
        decoded += sum(tuple(f) in got for f in frames)
    # deep fades can kill 64-QAM on some draws; most realizations must decode
    assert decoded >= 8, f"only {decoded}/12 frames decoded over SV fading"


def test_sv_channel_geometry():
    ch = SVChannel(irs_scale=4, irs_pos=(0.015, 0.015, 0.0),
                   ap_pos=(0.24, 0.24, 4.5), user_num=2, antenna_num=3)
    users = np.array([[0.3, 0.2, 1.0], [0.1, 0.4, 1.5]])
    b2r, r2u, b2u = ch.gen_los(users)
    assert b2r.shape == (3, 16) and r2u.shape == (16, 2) and b2u.shape == (3, 2)
    # LoS entries are unit-modulus steering products
    assert np.allclose(np.abs(np.array(b2r)), 1.0, atol=1e-5)
    # Rician K -> huge reduces to LoS
    b2r_k, _, _ = ch.gen_rician(jax.random.key(0), users, k_factor=1e9)
    np.testing.assert_allclose(np.array(b2r_k), np.array(b2r), atol=1e-3)
    # aggregate formula against a numpy oracle
    psi = np.exp(1j * np.linspace(0, np.pi, 16))
    h = np.array(ch.aggregate(b2r, r2u, b2u, jnp.asarray(psi)))
    ref = np.array(b2r) @ np.diag(psi) @ np.array(r2u) + np.array(b2u)
    np.testing.assert_allclose(h, ref, atol=1e-4)


def test_irs_channel_mmse_and_aggregate():
    ch = IRSChannel(user_num=2, antenna_num=2, irs_units=16)
    b2u, b2r, r2u = ch.gen_los((0.24, 0.24, 4.5), (0.015, 0.015, 0.0),
                               np.array([[0.3, 0.2, 1.0], [0.1, 0.4, 1.5]]))
    psi = jnp.exp(1j * jnp.arange(16.0))
    h = np.array(IRSChannel.get_chnl(b2u, b2r, r2u, psi))
    ref = np.array(b2r) @ np.diag(np.array(psi)) @ np.array(r2u) + np.array(b2u)
    np.testing.assert_allclose(h, ref, atol=1e-4)
    # MMSE estimate with identity pilot and no noise recovers H/(1+s2)
    pilot = jnp.eye(2, dtype=jnp.complex64)
    est = np.array(IRSChannel.ch_est(jnp.asarray(h), 0.0, pilot))
    np.testing.assert_allclose(est, h, atol=1e-5)
    # carrier phase term present: channel_mdl includes e^{-jkd}
    from gnuradio_wifi_imagetransfer_tpu.channel.irs import channel_mdl
    h11 = channel_mdl((0, 0, 0), (1, 0, 0), (1, 1, 1), (1, 1, 1), f=5e9)
    k = 2 * np.pi * 5e9 / 3e8
    assert np.isclose(np.angle(np.array(h11)[0, 0]), np.angle(np.exp(-1j * k)), atol=1e-3)


def test_clustered_irs_channel():
    ch = ClusteredIRSChannel(irs_unit_gap=0.03, irs_scale=8, cluster_scale=2,
                             irs_pos=(0.015, 0.015, 0.0), ap_pos=(0.12, 0.12, 4.5),
                             user_num=2, ap_num=1)
    assert ch.group_scale == 4 and ch.group_num == 16
    users = np.array([[0.3, 0.2, 1.0], [0.1, 0.4, 1.5]])
    los = ch.gen_los(users)
    h_u2b, h_r2b, h_u2r = los
    assert h_u2b.shape == (1, 2) and h_r2b.shape == (1, 16) and h_u2r.shape == (16, 2)
    h_r = ch.gen_chnl_ideal(los, jnp.ones(16, jnp.complex64))
    assert h_r.shape == (1, 2)
    h_r2b_r, h_u2r_r, h_d = ch.gen_chnl(jax.random.key(0), los, k_factor=10.0)
    assert h_d.shape == (1, 2)
    phases = ch.gen_phase_nograd(0.3, 0.1)
    assert phases.shape == (4, 4)
    assert np.allclose(np.abs(np.array(phases)), 1.0, atol=1e-5)
    inc = np.array(ch.gen_incidence_phase())
    assert inc.shape == (4, 4) and np.all(np.abs(inc) <= np.pi + 1e-6)


def test_sample_clock_offset_tone_rate():
    """A resampled tone's frequency scales by exactly (1 + ppm*1e-6)."""
    from gnuradio_wifi_imagetransfer_tpu.channel import model

    n = 20000
    f = 0.11                                 # cycles/sample
    x = np.exp(2j * np.pi * f * np.arange(n)).astype(np.complex64)
    ppm = 150.0
    y = np.asarray(model.sample_clock_offset(jnp.asarray(x), ppm))
    assert y.size < n
    # instantaneous frequency from the mean phase increment
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    f_meas = np.mean(dphi[100:-100]) / (2 * np.pi)
    np.testing.assert_allclose(f_meas, f * (1 + ppm * 1e-6), rtol=1e-6)


def test_clock_offset_breaks_decode_resampler_repairs_it():
    """VERDICT r1 item 9's done condition: a 100-ppm sample-clock
    mismatch at 64-QAM 3/4 defeats the RX; ops.resampler.
    correct_sample_clock ahead of sync repairs it bit-exact."""
    from gnuradio_wifi_imagetransfer_tpu.channel import model
    from gnuradio_wifi_imagetransfer_tpu.ops import resampler
    from gnuradio_wifi_imagetransfer_tpu.phy import sync, tx

    rng = np.random.default_rng(0)
    mcs, length, ppm = 7, 400, 100.0
    psdu = rng.integers(0, 256, (2, length), dtype=np.uint8)
    bursts = tx.transmit(jnp.asarray(psdu), mcs, scrambler_seed=jnp.arange(1, 3))
    stream = np.asarray(tx.pad_burst(bursts, 200, 1200).reshape(-1))
    y = np.asarray(model.sample_clock_offset(jnp.asarray(stream), ppm))
    noise = 0.5 * 10 ** (-30 / 20) / np.sqrt(2)
    y = (y + noise * (rng.standard_normal(y.size)
                      + 1j * rng.standard_normal(y.size))).astype(np.complex64)

    def n_good(z):
        res, cand = sync.receive(jnp.asarray(z), tx.tx_plan(mcs, length),
                                 max_frames=4)
        ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
        return sum(1 for row in np.array(res.psdu)[ok]
                   if any((row == p).all() for p in psdu))

    assert n_good(y) == 0, "uncorrected 100-ppm stream should not decode"
    z = np.asarray(resampler.correct_sample_clock(jnp.asarray(y), ppm))
    assert n_good(z.astype(np.complex64)) == 2
