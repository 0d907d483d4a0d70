"""Packet-error-rate waterfall sanity across SNR and MCS.

Loopback tests prove bit-exactness at high SNR; this locks the modem's
ERROR behavior: PER falls monotonically with SNR, each rate is perfect
in its design regime, and the rate ladder orders correctly (64-QAM 3/4
fails where BPSK 1/2 still decodes) — the behavior the reference's
SNR slider demonstrates interactively (IRS_tranceiver.py:98-104).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.channel import model
from gnuradio_wifi_imagetransfer_tpu.phy import rx, tx

N_FRAMES = 16
PSDU = 100


def _per(mcs: int, snr_db: float, seed: int = 0) -> float:
    """Packet error rate over an AWGN channel, genie-aligned."""
    rng = np.random.default_rng(seed)
    psdu = rng.integers(0, 256, (N_FRAMES, PSDU), dtype=np.uint8)
    plan = tx.tx_plan(mcs, PSDU)
    bursts = tx.transmit(jnp.asarray(psdu), mcs,
                         scrambler_seed=jnp.arange(1, N_FRAMES + 1))
    # unit-signal-power scaling: burst samples average ~1; noise_voltage
    # sets total noise power, so SNR = -20 log10(nv)
    y = model.awgn(jax.random.key(seed), bursts,
                   noise_voltage=10 ** (-snr_db / 20))
    res = rx.decode_aligned(y, plan, start=0)
    errs = (np.asarray(res.psdu) != psdu).any(axis=1)
    return float(errs.mean())


@pytest.mark.parametrize("mcs,ok_snr,fail_snr", [
    (0, 8.0, -2.0),     # BPSK 1/2: fine at 8 dB, dead at -2 dB
    (3, 14.0, 4.0),     # QPSK 3/4
    (7, 26.0, 14.0),    # 64-QAM 3/4: needs ~10 dB more than QPSK 3/4
])
def test_per_regimes(mcs, ok_snr, fail_snr):
    assert _per(mcs, ok_snr) == 0.0, f"MCS{mcs} should be clean at {ok_snr} dB"
    assert _per(mcs, fail_snr) > 0.5, f"MCS{mcs} should fail at {fail_snr} dB"


def test_rate_ladder_orders():
    """At 10 dB: BPSK 1/2 decodes everything, 64-QAM 3/4 nothing."""
    assert _per(0, 10.0) == 0.0
    assert _per(7, 10.0) == 1.0


def test_per_monotone_in_snr():
    snrs = [2.0, 6.0, 10.0, 14.0, 18.0]
    pers = [_per(3, s) for s in snrs]
    assert all(a >= b - 0.07 for a, b in zip(pers, pers[1:])), pers
    assert pers[0] > 0.5 and pers[-1] == 0.0, pers


def _fading_burst(burst: np.ndarray, rng: np.random.Generator,
                  wander: float = 0.5) -> np.ndarray:
    """Apply a slowly-time-varying 3-tap channel per sample: tap gains
    wander smoothly with periods ~80-130 symbols (the regime the LMS/STA
    trackers exist for; see tests/test_equalizer.py)."""
    n = burst.size
    delays = np.array([0, 3, 7])
    g0 = np.array([1.0, 0.45, 0.3]) * np.exp(2j * np.pi * rng.random(3))
    periods = np.array([80.0, 102.4, 128.8]) * 80.0        # symbols -> samples
    t = np.arange(n)[:, None]
    wob = np.exp(1j * (2 * np.pi * t / periods + 2 * np.pi * rng.random(3)))
    gains = g0 * (1 + wander * (wob - wob[0]))             # (n, 3); H(0)=H0
    y = np.zeros(n, dtype=np.complex128)
    for d, gd in zip(delays, gains.T):
        y[d:] += gd[d:] * burst[: n - d]
    return y.astype(np.complex64)


@pytest.mark.slow
def test_equalizer_algorithm_waterfall_over_fading():
    """Per-algorithm PER-vs-SNR over the slowly-fading channel — records
    each frame_equalizer algorithm's operating region (the reference
    exposes the same choice as a GUI dropdown, IRS_AP.py:139-141).

    Measured table (16 frames of 400-B 16-QAM 3/4, 3-tap fading with
    wander 0.5 over ~80-130-symbol periods, per-frame random channels,
    CPU jit, seed 0):

        SNR(dB)   LS     LMS    COMB   STA
          15     0.88   0.44   0.75   0.31
          25     0.69   0.25   0.62   0.31
          35     0.69   0.25   0.62   0.31

    LS equalizes the whole frame with the preamble estimate, so fading
    leaves an error FLOOR no SNR fixes; decision-directed LMS and STA
    track the wander and roughly halve the floor (their residual is the
    frames whose fade is too deep to track through 16-QAM decisions);
    COMB corrects only per-symbol pilot phase/tilt, which cannot repair
    per-carrier fading (its region is clock-drift tilt,
    tests/test_equalizer.py:89)."""
    from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator

    n_frames, psdu_l, mcs = 16, 400, 5
    rng = np.random.default_rng(0)
    psdu = rng.integers(0, 256, (n_frames, psdu_l), dtype=np.uint8)
    plan = tx.tx_plan(mcs, psdu_l)
    bursts = np.array(tx.transmit(jnp.asarray(psdu), mcs,
                                  scrambler_seed=jnp.arange(1, n_frames + 1)))
    faded = np.stack([_fading_burst(b, np.random.default_rng(100 + i))
                      for i, b in enumerate(bursts)])

    def per(algo, snr_db):
        y = model.awgn(jax.random.key(7), jnp.asarray(faded),
                       noise_voltage=10 ** (-snr_db / 20))
        res = rx.decode_aligned(y, plan, start=0, algo=algo)
        return float((np.asarray(res.psdu) != psdu).any(axis=1).mean())

    table = {a.name: {s: per(a, s) for s in (15.0, 25.0, 35.0)}
             for a in (ChannelEstimator.LS, ChannelEstimator.LMS,
                       ChannelEstimator.COMB, ChannelEstimator.STA)}
    # LS: an error floor no SNR fixes
    assert table["LS"][35.0] >= 0.5, table
    # trackers: well under the LS floor at high SNR
    assert table["LMS"][35.0] <= table["LS"][35.0] - 0.3, table
    assert table["STA"][35.0] <= table["LS"][35.0] - 0.25, table
    # COMB's region is per-symbol tilt, not per-carrier fading
    assert table["COMB"][35.0] >= table["LS"][35.0] - 0.15, table
    # more SNR never hurts the trackers here
    assert table["LMS"][35.0] <= table["LMS"][15.0], table
