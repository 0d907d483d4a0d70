"""Sync front-end tests: raw stream -> detected, CFO-corrected, decoded.

Mirrors the reference's de-facto integration harness (IRS_tranceiver.grc,
SURVEY.md §4.1): TX bursts with padding into a continuous stream, software
channel impairments (AWGN 20-30 dB, CFO up to +-20 ppm of 5.89 GHz ~= 0.074
rad/sample at 10 MS/s), then the full RX chain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import params, rx, sync, tx


def _make_stream(frames, mcs, gaps, scale=0.5, cfo=0.0, snr_db=None, seed=0):
    """Concatenate TX bursts with leading zero gaps; apply impairments."""
    rng = np.random.default_rng(seed)
    bursts = np.array(tx.transmit(jnp.asarray(frames), mcs,
                                  scrambler_seed=jnp.asarray(np.arange(len(frames)) % 127 + 1)))
    pieces = []
    starts = []
    pos = 0
    for burst, gap in zip(bursts, gaps):
        pieces.append(np.zeros(gap, np.complex64))
        pos += gap
        starts.append(pos)
        pieces.append(scale * burst)
        pos += burst.size
    pieces.append(np.zeros(500, np.complex64))
    x = np.concatenate(pieces)
    if cfo:
        x = x * np.exp(1j * cfo * np.arange(x.size))
    if snr_db is not None:
        sig_pow = scale ** 2  # bursts are ~unit power
        noise_std = np.sqrt(sig_pow / (10 ** (snr_db / 10)) / 2)
        x = x + noise_std * (rng.standard_normal(x.size) + 1j * rng.standard_normal(x.size))
    return x.astype(np.complex64), np.array(starts)


def test_detect_clean_single_frame():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (1, 50), dtype=np.uint8)
    x, starts = _make_stream(frames, 0, gaps=[300])
    cand = sync.detect(jnp.asarray(x), max_frames=4)
    v = np.array(cand.valid)
    assert v[0]
    # trigger must fall inside the frame's STF
    t = int(np.array(cand.starts)[0])
    assert starts[0] <= t <= starts[0] + 160
    # no spurious extra detections on a clean stream
    assert v.sum() == 1


@pytest.mark.parametrize("mcs,snr_db,cfo", [
    (0, 20, 0.0),
    (2, 20, 0.074),     # +20 ppm of 5.89 GHz at 10 MS/s
    (3, 25, -0.074),
    (5, 25, 0.02),
    (7, 30, -0.05),
])
def test_stream_receive_impaired(mcs, snr_db, cfo):
    rng = np.random.default_rng(mcs)
    L = 50
    frames = rng.integers(0, 256, (3, L), dtype=np.uint8)
    x, starts = _make_stream(frames, mcs, gaps=[400, 350, 500],
                             cfo=cfo, snr_db=snr_db, seed=mcs)
    plan = tx.tx_plan(mcs, L)
    res, cand = sync.receive(jnp.asarray(x), plan, max_frames=6)
    valid = np.array(cand.valid)
    psdu = np.array(res.psdu)
    parity = np.array(res.sig["parity_ok"])
    good = [tuple(psdu[i]) for i in range(len(valid)) if valid[i] and parity[i]]
    for f in frames:
        assert tuple(f) in good, f"frame missing (mcs={mcs}, snr={snr_db}, cfo={cfo})"


def test_noise_only_stream_no_false_decodes():
    rng = np.random.default_rng(99)
    x = (0.1 * (rng.standard_normal(20000) + 1j * rng.standard_normal(20000))).astype(np.complex64)
    plan = tx.tx_plan(0, 50)
    res, cand = sync.receive(jnp.asarray(x), plan, max_frames=4)
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"]) & \
        (np.array(res.sig["rate_idx"]) == 0) & (np.array(res.sig["length"]) == 50)
    assert not ok.any(), "noise stream must not yield validated frames"


def test_search_range_excludes_halo():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 30), dtype=np.uint8)
    x, starts = _make_stream(frames, 2, gaps=[300, 400])
    cand = sync.detect(jnp.asarray(x), max_frames=4, search_lo=int(starts[1]) - 200)
    v = np.array(cand.valid)
    t = np.array(cand.starts)[v]
    # only the second frame's edge lies in range
    assert len(t) == 1 and starts[1] <= t[0] <= starts[1] + 160


def test_amplitude_robustness():
    """Detection ratio c(n) is scale-free: tiny and large bursts both sync."""
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (2, 50), dtype=np.uint8)
    for scale in (0.02, 0.6, 3.0):
        x, _ = _make_stream(frames, 2, gaps=[250, 300], scale=scale)
        plan = tx.tx_plan(2, 50)
        res, cand = sync.receive(jnp.asarray(x), plan, max_frames=4)
        psdu = np.array(res.psdu)[np.array(cand.valid) & np.array(res.sig["parity_ok"])]
        got = {tuple(r) for r in psdu}
        assert all(tuple(f) in got for f in frames), scale
