"""Sweep the LMS/STA equalizer tracker gains over the fading waterfall.

VERDICT r3 item 6: the defaults lms_mu = sta_alpha = sta_beta = 0.5 were
invented (PARITY.md §2.3 marks them "ours"); gr-ieee802-11's C++ behavior
was never characterized. This sweep grounds the defaults in data: PER of
each (gain) setting over the same slowly-fading 3-tap channel the
waterfall test locks regions with (tests/test_waterfall.py:63-80), at
two wander depths, plus a static-multipath control so a tracking gain
that wins on fading doesn't regress the time-invariant case.

Scenario (matches test_waterfall): 16-QAM 3/4 (MCS 5), 400-B PSDUs,
3-tap delays (0, 3, 7), tap wander periods ~80-130 symbols, AWGN at 25
dB SNR, genie-aligned decode (isolates equalization from sync).

Usage: python tune_equalizer.py [--frames 32] [--out /tmp/eq_sweep.json]
Results land in docs/equalizer_tuning.md (run of 2026-08-21 committed).
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.channel import model
from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
from gnuradio_wifi_imagetransfer_tpu.phy import rx, tx

MCS = 5
PSDU_L = 400
SNR_DB = 25.0


def fading_burst(burst: np.ndarray, rng: np.random.Generator,
                 wander: float) -> np.ndarray:
    """The waterfall test's slowly-time-varying 3-tap channel
    (tests/test_waterfall.py:63-80)."""
    n = burst.size
    delays = np.array([0, 3, 7])
    g0 = np.array([1.0, 0.45, 0.3]) * np.exp(2j * np.pi * rng.random(3))
    periods = np.array([80.0, 102.4, 128.8]) * 80.0
    t = np.arange(n)[:, None]
    wob = np.exp(1j * (2 * np.pi * t / periods + 2 * np.pi * rng.random(3)))
    gains = g0 * (1 + wander * (wob - wob[0]))
    y = np.zeros(n, dtype=np.complex128)
    for d, gd in zip(delays, gains.T):
        y[d:] += gd[d:] * burst[: n - d]
    return y.astype(np.complex64)


def static_burst(burst: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Time-invariant 3-tap control channel."""
    return fading_burst(burst, rng, wander=0.0)


def build_scenarios(n_frames: int):
    rng = np.random.default_rng(0)
    psdu = rng.integers(0, 256, (n_frames, PSDU_L), dtype=np.uint8)
    bursts = np.array(tx.transmit(
        jnp.asarray(psdu), MCS,
        scrambler_seed=jnp.arange(n_frames) % 127 + 1))
    scen = {}
    for name, wander in (("fade_deep", 0.5), ("fade_mild", 0.25),
                         ("static", 0.0)):
        faded = np.stack([
            fading_burst(b, np.random.default_rng(100 + i), wander)
            for i, b in enumerate(bursts)])
        y = np.asarray(model.awgn(jax.random.key(7), jnp.asarray(faded),
                                  noise_voltage=10 ** (-SNR_DB / 20)))
        scen[name] = y
    return psdu, scen


def per(y, psdu, algo, **gains) -> float:
    plan = tx.tx_plan(MCS, PSDU_L)
    res = rx.decode_aligned(jnp.asarray(y), plan, start=0, algo=algo, **gains)
    return float((np.asarray(res.psdu) != psdu).any(axis=1).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--out", default="/tmp/eq_sweep.json")
    args = ap.parse_args()

    psdu, scen = build_scenarios(args.frames)
    results = {"lms": [], "sta": [], "frames": args.frames, "snr_db": SNR_DB}

    t0 = time.time()
    for mu in (0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9):
        row = {"lms_mu": mu}
        for name, y in scen.items():
            row[name] = per(y, psdu, ChannelEstimator.LMS, lms_mu=mu)
        results["lms"].append(row)
        print(f"[{time.time()-t0:6.0f}s] LMS mu={mu}: {row}", flush=True)

    for alpha in (0.125, 0.25, 0.5, 0.75):
        for beta in (0.125, 0.25, 0.5, 0.75):
            row = {"sta_alpha": alpha, "sta_beta": beta}
            for name, y in scen.items():
                row[name] = per(y, psdu, ChannelEstimator.STA,
                                sta_alpha=alpha, sta_beta=beta)
            results["sta"].append(row)
            print(f"[{time.time()-t0:6.0f}s] STA a={alpha} b={beta}: {row}",
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
