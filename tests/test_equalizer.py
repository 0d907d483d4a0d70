"""Equalizer algorithm differentiation (VERDICT r1 weak #2).

Clean-frame decode for all four algorithms is covered by
tests/test_loopback.py; these tests build channels that SEPARATE them:

  * per-carrier time-varying fading: static LS degrades, decision-directed
    LMS and STA track;
  * per-symbol gain ramp + linear phase tilt: pilot-phase-only LS fails,
    COMB's per-symbol pilot interpolation tracks;
  * integration: a frame through a time-varying two-tap channel decodes
    bit-exact with LMS but not with LS.
"""

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
from gnuradio_wifi_imagetransfer_tpu.phy import equalizer, mapping, ofdm, params, rx, tx

MCS = 2        # QPSK 1/2
S = 40         # symbols per synthetic run


def _synthetic_run(seed=0):
    """Known QPSK data symbols on a proper 802.11a carrier grid."""
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (S, 48 * 2), dtype=np.uint8)
    data = np.asarray(mapping.map_bits(jnp.asarray(bits), MCS))    # (S, 48)
    spectra = np.asarray(ofdm.allocate_carriers(jnp.asarray(data),
                                                symbol_index0=1))  # (S, 64)
    return data, spectra


def _h0(seed=1):
    rng = np.random.default_rng(seed)
    mag = 0.8 + 0.4 * rng.random(52)
    ph = 0.5 * rng.standard_normal(52)
    return (mag * np.exp(1j * ph)).astype(np.complex64)


def _ser(eq, data):
    dec = np.asarray(mapping.decide(jnp.asarray(eq), MCS))
    return float(np.mean(np.abs(dec - data) > 1e-3))


def _apply(spectra, h_used_t, snr_db=30, seed=2):
    """Y[t, k] = H_t[k] X[t, k] + noise on the used bins."""
    rng = np.random.default_rng(seed)
    used = np.asarray(params.USED_BINS)
    y = spectra.copy()
    y[:, used] = y[:, used] * h_used_t
    sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
    y = y + sigma * (rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape))
    return y.astype(np.complex64)


def _run(algo, y, h0):
    eq, _ = equalizer.equalize(jnp.asarray(y), jnp.asarray(h0),
                               symbol_index0=1, algo=algo, mcs=MCS)
    return np.asarray(eq)


def test_lms_and_sta_track_per_carrier_fading():
    data, spectra = _synthetic_run()
    rng = np.random.default_rng(3)
    t = np.arange(S)[:, None]
    # physical time-varying channel: 3 taps whose gains wander smoothly in
    # time -> H_t[k] smooth across carriers (so frequency averaging is
    # meaningful) but drifting across symbols
    used = np.asarray(params.USED_BINS) - 32                  # carrier freqs
    delays = np.array([0, 3, 7])
    g0 = np.array([1.0, 0.45, 0.3]) * np.exp(1j * 2 * np.pi * rng.random(3))
    # slow wander (period >= the frame) — the regime trackers are for;
    # see the sweep note: sub-20-symbol fading defeats all algorithms
    wobble = np.exp(1j * (2 * np.pi * t / np.array([40.0, 51.2, 64.4])
                          + 2 * np.pi * rng.random(3)))
    gains = g0 * (1 + 0.65 * (wobble - wobble[0]))            # (S, 3), H(0)=H0
    h_t = np.einsum("st,tk->sk", gains,
                    np.exp(-2j * np.pi * np.outer(delays, used) / 64))
    h0 = h_t[0].astype(np.complex64)
    y = _apply(spectra, h_t)

    ser_ls = _ser(_run(ChannelEstimator.LS, y, h0), data)
    ser_lms = _ser(_run(ChannelEstimator.LMS, y, h0), data)
    ser_sta = _ser(_run(ChannelEstimator.STA, y, h0), data)
    assert ser_ls > 0.05, f"LS unexpectedly tracked: {ser_ls}"
    assert ser_lms < ser_ls / 5, (ser_lms, ser_ls)
    assert ser_sta < ser_ls / 5, (ser_sta, ser_ls)


def test_comb_tracks_per_symbol_tilt():
    data, spectra = _synthetic_run(seed=5)
    h0 = _h0(seed=6)
    t = np.arange(S)[:, None]
    k = np.arange(52)[None, :]
    # per-symbol common gain ramp + growing linear phase tilt across
    # carriers (sample-clock-drift signature); zero at t=0
    gain = 1.0 + 0.012 * t
    tilt = np.exp(1j * (0.0035 * t) * (k - 25.5))
    y = _apply(spectra, h0 * gain * tilt)

    ser_ls = _ser(_run(ChannelEstimator.LS, y, h0), data)
    ser_comb = _ser(_run(ChannelEstimator.COMB, y, h0), data)
    assert ser_ls > 0.05, f"LS unexpectedly tracked: {ser_ls}"
    assert ser_comb < ser_ls / 5, (ser_comb, ser_ls)


def test_clean_channel_all_algorithms_equal_ls():
    data, spectra = _synthetic_run(seed=7)
    h0 = _h0(seed=8)
    y = _apply(spectra, np.broadcast_to(h0, (S, 52)), snr_db=35)
    for algo in ChannelEstimator:
        ser = _ser(_run(algo, y, h0), data)
        assert ser == 0.0, (algo, ser)


def test_integration_lms_decodes_where_ls_fails():
    """Full-frame decode through a two-tap channel whose echo grows over
    the frame (frequency-selective fade developing in time). 64-QAM 3/4:
    at rate-1/2 QPSK the Viterbi masks even severe equalizer error."""
    rng = np.random.default_rng(9)
    psdu = rng.integers(0, 256, (1, 400), dtype=np.uint8)
    plan = tx.tx_plan(7, 400)                         # 15 data symbols
    burst = np.asarray(tx.transmit(jnp.asarray(psdu), 7))[0]
    n = burst.size
    a = np.linspace(0.0, 0.4, n)                      # echo ramps up...
    rot = np.exp(2j * np.pi * np.arange(n) / 6000.0)  # ...and rotates
    echo = np.zeros(n, np.complex64)
    echo[8:] = burst[:-8]
    y = burst + (a * rot * echo).astype(np.complex64)
    y = y + (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
             ).astype(np.complex64)
    y = jnp.asarray(y[None])

    res_ls = rx.decode_aligned(y, plan, start=0, algo=ChannelEstimator.LS)
    res_lms = rx.decode_aligned(y, plan, start=0, algo=ChannelEstimator.LMS)
    errs_ls = int((np.asarray(res_ls.psdu)[0] != psdu[0]).sum())
    errs_lms = int((np.asarray(res_lms.psdu)[0] != psdu[0]).sum())
    assert errs_lms == 0, f"LMS should decode bit-exact, {errs_lms} byte errors"
    assert errs_ls > 50, f"LS should fail hard here, got {errs_ls} byte errors"


def test_tracker_gain_defaults_single_source_of_truth():
    """The tuned PhyConfig gains ARE the function defaults everywhere:
    a direct STA caller must get the data-backed sta_beta=0.125, not a
    stale hard-coded 0.5 (VERDICT r4 item 7)."""
    import inspect

    from gnuradio_wifi_imagetransfer_tpu.config import PhyConfig
    from gnuradio_wifi_imagetransfer_tpu.phy import equalizer as eqmod
    from gnuradio_wifi_imagetransfer_tpu.phy import rx as rxmod

    cfg = PhyConfig()
    for fn in (eqmod.equalize, rxmod.decode_aligned, rxmod.decode_spectra,
               rxmod.jitted_decode_aligned):
        sig = inspect.signature(fn)
        assert sig.parameters["lms_mu"].default == cfg.lms_mu, fn
        assert sig.parameters["sta_alpha"].default == cfg.sta_alpha, fn
        assert sig.parameters["sta_beta"].default == cfg.sta_beta, fn

    from gnuradio_wifi_imagetransfer_tpu.parallel import executor as exmod

    assert exmod._EQ_DEFAULTS == (cfg.lms_mu, cfg.sta_alpha, cfg.sta_beta)
