"""Channel estimation and per-symbol equalization with pilot phase tracking.

Replicates ieee802_11.frame_equalizer (IRS_AP.py:271, wifi_phy_hier.grc:
550-569): LS channel estimate from the two LTF symbols, per-symbol
pilot-tracked common-phase correction, equalization of the 48 data carriers,
plus the LMS / COMB (linear comb) / STA algorithm variants selectable at
IRS_AP.py:139-141.

All algorithms are expressed as a `lax.scan` over OFDM symbols carrying the
running channel estimate, fully batched over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
from gnuradio_wifi_imagetransfer_tpu.phy import params


def ls_estimate(ltf1: jnp.ndarray, ltf2: jnp.ndarray) -> jnp.ndarray:
    """LS channel estimate on the 52 used carriers from the two LTF spectra.

    ltf1, ltf2: (..., 64) shifted-order spectra of the two LTF symbols.
    Returns H: (..., 52) complex.
    """
    used = jnp.asarray(params.USED_BINS)
    ref = jnp.asarray(params.LTF_USED)                      # +-1 on used carriers
    y = 0.5 * (ltf1[..., used] + ltf2[..., used])
    return (y * ref).astype(jnp.complex64)                  # ref is +-1 => y/ref


def _pilot_phase(y_used: jnp.ndarray, h: jnp.ndarray, polarity: jnp.ndarray) -> jnp.ndarray:
    """Common phase of one symbol from its 4 pilots.

    y_used: (..., 52); h: (..., 52); polarity: scalar (or broadcastable).
    Returns the phasor e^{j phi} (..., ) to be conjugate-applied.
    """
    p_idx = jnp.asarray(params.PILOT_IN_USED)
    ref = polarity[..., None] * jnp.asarray(params.PILOT_PATTERN)
    corr = jnp.sum(
        y_used[..., p_idx] * jnp.conj(h[..., p_idx]) * ref, axis=-1
    )
    return corr / jnp.maximum(jnp.abs(corr), 1e-12)


def equalize(
    sym_freq: jnp.ndarray,
    h0: jnp.ndarray,
    symbol_index0: int | jnp.ndarray = 0,
    algo: ChannelEstimator = ChannelEstimator.LS,
    lms_mu: float = 0.5,
    sta_alpha: float = 0.5,
    sta_beta: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Equalize a run of OFDM symbols.

    sym_freq: (..., S, 64) shifted spectra (SIGNAL first when
      symbol_index0 == 0).
    h0: (..., 52) initial LS channel estimate.
    Returns (eq_data, csi): (..., S, 48) equalized data-carrier symbols and
    per-carrier reliability weights |H|^2.
    """
    used = jnp.asarray(params.USED_BINS)
    d_idx = jnp.asarray(params.DATA_IN_USED)
    p_idx = jnp.asarray(params.PILOT_IN_USED)
    pilot_pat = jnp.asarray(params.PILOT_PATTERN)
    polarity_tab = jnp.asarray(params.POLARITY)

    y_all = sym_freq[..., used]                             # (..., S, 52)
    s = y_all.shape[-2]
    # scan over the symbol axis: move S to the front.
    perm = (y_all.ndim - 2,) + tuple(i for i in range(y_all.ndim) if i != y_all.ndim - 2)
    y_scan = jnp.transpose(y_all, perm)                     # (S, ..., 52)
    pol = polarity_tab[(symbol_index0 + jnp.arange(s)) % 127]

    algo = ChannelEstimator(algo)

    def step(h, inp):
        y, polarity = inp                                   # y: (..., 52)
        phasor = _pilot_phase(y, h, polarity)               # (...,)
        y_corr = y * jnp.conj(phasor)[..., None]
        eq = y_corr / jnp.where(jnp.abs(h) > 1e-9, h, 1e-9)
        h_next = h
        if algo == ChannelEstimator.LMS:
            # Pilot-driven gradient update of the channel estimate.
            ref = polarity[..., None] * pilot_pat
            err = y_corr[..., p_idx] - h[..., p_idx] * ref
            h_next = h.at[..., p_idx].add(lms_mu * err * ref)
        elif algo == ChannelEstimator.STA:
            # Spectral-temporal averaging: decision-free smoothed update
            # from the per-carrier instantaneous estimate y/x with x taken
            # as the equalized symbol re-normalized (data) / known (pilot).
            x_hat = eq / jnp.maximum(jnp.abs(eq), 1e-9)     # unit-modulus proxy
            x_hat = x_hat.at[..., p_idx].set(polarity[..., None] * pilot_pat)
            h_inst = y_corr * jnp.conj(x_hat)
            # smooth across carriers (beta comb) then across time (alpha)
            left = jnp.roll(h_inst, 1, axis=-1)
            right = jnp.roll(h_inst, -1, axis=-1)
            h_comb = (1 - sta_beta) * h_inst + sta_beta * 0.5 * (left + right)
            h_next = (1 - sta_alpha) * h + sta_alpha * h_comb
        data = eq[..., d_idx]
        csi = (jnp.abs(h[..., d_idx]) ** 2).astype(jnp.float32)
        return h_next, (data, csi)

    if algo == ChannelEstimator.COMB:
        # Linear-comb: one-shot smoothing of the LS estimate across
        # neighboring carriers, then static equalization.
        h_sm = 0.25 * jnp.roll(h0, 1, axis=-1) + 0.5 * h0 + 0.25 * jnp.roll(h0, -1, axis=-1)
        h_sm = h_sm.at[..., 0].set(h0[..., 0]).at[..., -1].set(h0[..., -1])
        h0 = h_sm
        algo = ChannelEstimator.LS

    _, (data, csi) = jax.lax.scan(step, h0.astype(jnp.complex64), (y_scan, pol))
    # move S back: data is (S, ..., 48)
    inv = tuple(range(1, data.ndim - 1)) + (0, data.ndim - 1)
    return jnp.transpose(data, inv), jnp.transpose(csi, inv)
