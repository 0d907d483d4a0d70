"""802.11a RX chain: aligned sample burst -> decoded PSDU bytes.

Implements the back half of the reference RX call stack (SURVEY.md §3.2):
stream_to_vector(64) + fft_vcc(64, fwd) (IRS_AP.py:273,276), frame_equalizer
(IRS_AP.py:271) and decode_mac's deinterleave / depuncture / Viterbi /
descramble (IRS_AP.py:272) as jit-compiled frame-batch functions.

This module assumes symbol timing is known (either genie-aligned loopback or
offsets produced by phy/sync.py); phy/sync.py owns the front-end that finds
frames in raw streams.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator, PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import bits as bitops
from gnuradio_wifi_imagetransfer_tpu.phy import equalizer, mapping, ofdm, params, signal_field, viterbi
from gnuradio_wifi_imagetransfer_tpu.phy.tx import TxPlan

# tracker-gain defaults come from PhyConfig — the single tuned source of
# truth (docs/equalizer_tuning.md); see equalizer._GAINS for rationale
_GAINS = PhyConfig()


def frame_spectra(samples: jnp.ndarray, n_sym: int, start: int | jnp.ndarray = 0):
    """Slice a burst into LTF + SIGNAL+data spectra.

    samples: (..., N) with the frame's first preamble sample at ``start``.
    Returns (ltf1, ltf2, syms): (..., 64), (..., 64), (..., 1+n_sym, 64).
    """
    if isinstance(start, int):
        idx0 = start
        ltf1 = samples[..., idx0 + params.LTF1_OFFSET : idx0 + params.LTF1_OFFSET + 64]
        ltf2 = samples[..., idx0 + params.LTF2_OFFSET : idx0 + params.LTF2_OFFSET + 64]
        body = []
        for k in range(1 + n_sym):
            s = idx0 + params.PREAMBLE_LEN + k * params.N_SYM + params.N_CP
            body.append(samples[..., s : s + 64])
        syms = jnp.stack(body, axis=-2)
    else:
        # dynamic start: gather fixed windows
        offs_l1 = start[..., None] + params.LTF1_OFFSET + jnp.arange(64)
        offs_l2 = start[..., None] + params.LTF2_OFFSET + jnp.arange(64)
        sym_off = (
            start[..., None, None]
            + params.PREAMBLE_LEN
            + jnp.arange(1 + n_sym)[:, None] * params.N_SYM
            + params.N_CP
            + jnp.arange(64)
        )
        ltf1 = jnp.take_along_axis(samples, offs_l1, axis=-1)
        ltf2 = jnp.take_along_axis(samples, offs_l2, axis=-1)
        syms = _gather_syms(samples, sym_off)
    return ofdm.fft_symbols(ltf1), ofdm.fft_symbols(ltf2), ofdm.fft_symbols(syms)


def _gather_syms(samples: jnp.ndarray, sym_off: jnp.ndarray) -> jnp.ndarray:
    # samples: (..., N); sym_off: (..., S, 64) absolute indices into N.
    flat_off = sym_off.reshape(sym_off.shape[:-2] + (-1,))
    g = jnp.take_along_axis(samples, flat_off, axis=-1)
    return g.reshape(sym_off.shape)


@dataclasses.dataclass(frozen=True)
class RxResult:
    psdu: jnp.ndarray          # (..., L) uint8 decoded PSDU bytes
    sig: dict                  # SIGNAL field decode (rate_idx/length/parity_ok)
    eq_symbols: jnp.ndarray    # (..., n_sym, 48) equalized data symbols
    csi: jnp.ndarray           # (..., n_sym, 48) |H|^2 weights


def decode_aligned(
    samples: jnp.ndarray,
    plan: TxPlan,
    start: int | jnp.ndarray = 0,
    algo: ChannelEstimator = ChannelEstimator.LS,
    lms_mu: float = _GAINS.lms_mu,
    sta_alpha: float = _GAINS.sta_alpha,
    sta_beta: float = _GAINS.sta_beta,
) -> RxResult:
    """Decode a frame whose preamble starts at ``start`` in ``samples``.

    The MCS/length come from ``plan`` (static shapes); the SIGNAL field is
    decoded and returned for validation but does not steer shapes — the
    streaming executor buckets frames by decoded SIGNAL before calling this.
    lms_mu / sta_alpha / sta_beta tune the LMS/STA trackers (PhyConfig
    carries them; the reference's frame_equalizer hard-codes its gains).
    """
    ltf1, ltf2, spectra = frame_spectra(samples, plan.n_sym, start)
    return decode_spectra(ltf1, ltf2, spectra, plan, algo=algo,
                          lms_mu=lms_mu, sta_alpha=sta_alpha,
                          sta_beta=sta_beta)


def decode_spectra(
    ltf1: jnp.ndarray,
    ltf2: jnp.ndarray,
    spectra: jnp.ndarray,
    plan: TxPlan,
    algo: ChannelEstimator = ChannelEstimator.LS,
    lms_mu: float = _GAINS.lms_mu,
    sta_alpha: float = _GAINS.sta_alpha,
    sta_beta: float = _GAINS.sta_beta,
) -> RxResult:
    """Decode from already-demodulated spectra: LTF estimates (..., 64),
    SIGNAL+data spectra (..., 1+n_sym, 64). The tail of decode_aligned,
    exposed for callers that produce spectra without the window path.

    Note: a "fused gather" executor variant (skip window extraction,
    gather only LTF+symbol bodies from the raw block) was built and
    MEASURED SLOWER on v5e (876-893 vs 989 Msps full RX step,
    2026-08-21) — the scattered big-block gather loses to the two-stage
    window locality — and removed; don't rebuild it without a recorded
    win."""
    h0 = equalizer.ls_estimate(ltf1, ltf2)
    eq, csi = equalizer.equalize(spectra, h0, symbol_index0=0, algo=algo,
                                 mcs=plan.mcs, lms_mu=lms_mu,
                                 sta_alpha=sta_alpha, sta_beta=sta_beta)
    sig = signal_field.decode(eq[..., 0, :])
    data_eq = eq[..., 1:, :]
    data_csi = csi[..., 1:, :]

    llr = mapping.demap_llr(
        data_eq.reshape(data_eq.shape[:-2] + (-1,)), plan.mcs,
        csi=data_csi.reshape(data_csi.shape[:-2] + (-1,)),
    )
    deint = bitops.deinterleave(llr, plan.mcs)
    mother = bitops.depuncture(deint, plan.rate, 2 * plan.n_data_bits)
    # The trellis is terminated (state 0) right after the 6 zero tail bits;
    # scrambled PAD bits continue past it, so decode only through the tail.
    n_info = params.N_SERVICE_BITS + 8 * plan.psdu_len + params.N_TAIL_BITS
    decoded = viterbi.decode(mother[..., : 2 * n_info], n_info, terminated=True)
    descrambled = bitops.descramble(decoded)
    psdu_bits = descrambled[..., params.N_SERVICE_BITS : params.N_SERVICE_BITS + 8 * plan.psdu_len]
    psdu = bitops.bits_to_bytes(psdu_bits)
    return RxResult(psdu=psdu, sig=sig, eq_symbols=data_eq, csi=data_csi)


@functools.lru_cache(maxsize=64)
def jitted_decode_aligned(mcs: int, psdu_len: int, algo: int = int(ChannelEstimator.LS),
                          lms_mu: float = _GAINS.lms_mu,
                          sta_alpha: float = _GAINS.sta_alpha,
                          sta_beta: float = _GAINS.sta_beta):
    """jit-compiled decode_aligned for a static (MCS, length, algo).
    Tracker gains are threadable (part of the cache key) and default to
    the tuned PhyConfig values."""
    plan = TxPlan(mcs, psdu_len)

    @jax.jit
    def fn(samples, start):
        r = decode_aligned(samples, plan, start, ChannelEstimator(algo),
                           lms_mu=lms_mu, sta_alpha=sta_alpha,
                           sta_beta=sta_beta)
        return r.psdu, r.sig["rate_idx"], r.sig["length"], r.sig["parity_ok"]

    return fn, plan
