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
