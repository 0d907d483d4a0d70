"""Sample-rate-conversion front-end for the streaming executors.

The north star names the polyphase FIR resampler as a stage of the RX
chain; the reference instead rate-matches in SDR hardware config
(/root/reference/gnu_radio/IRS_AP.py:88-91). This module makes rate
conversion a first-class ON-DEVICE stage of both streaming executors:
an input stream captured at ``nominal * M/L * (1 + ppm*1e-6)`` is
corrected to the nominal 20 MS/s grid before the sync front-end ever
sees it (VERDICT r4 item 1).

The exact combined ratio (a ``fractions.Fraction``) is factored into a
chain of up to two TPU-shaped stages:

  decimation   integer M >= 2: anti-alias FIR + keep-every-Mth, computed
               as K static STRIDED SLICES + scaled adds over the stream
               (y[j] = sum_t h[t] x[jM + a - t]) — no gathers, no
               per-sample state; XLA fuses it into K vectorized
               passes. (The generic polyphase gather/matmul paths in
               ops/resampler.py measure 2-30 Msps on this chip; this
               formulation is HBM-bound instead.)
  clock trim   |ratio - 1| <= 2.5e-3 (ppm-scale): windowed-sinc
               fractional-delay interpolation applied per SUB-BLOCK
               (default 512 samples) with a constant delay per
               sub-block — the timing ripple is sub_block * |delta| / 2
               (0.01 samples at 40 ppm), far below the equalizer's
               tracking floor. Integer drift is absorbed by per-sub-
               block window starts computed with EXACT host integer
               arithmetic (float32 cannot address sample 1e8 to 1e-5
               precision), so only small relative offsets live in-graph.

Arbitrary small rationals that fit neither regime (e.g. 3/4) fall back
to ops/resampler.py's polyphase resampler as a single whole-stream
device pass (local executor mode only).

Executor integration (see parallel/executor.py):
  * local mode — the resident stream stays at INPUT rate on device; one
    jitted correction pass materializes the corrected output-rate
    resident stream in HBM (no extra host<->device traffic), and every
    downstream consumer (block steps, adaptive stage-B window gathers)
    is unchanged.
  * mesh mode — the host cuts per-shard EXTENDED input windows (true
    context, replacing the ppermute halo exchange) and the correction
    runs fused at the top of the sharded step, steered by one exact
    per-shard phase scalar.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import FrontendConfig

# trim regime bound: |in_per_out - 1| <= 1/400 (2500 ppm)
_TRIM_MAX = Fraction(1, 400)
_MAX_DECIM = 32


def combined_in_per_out(cfg: FrontendConfig) -> Fraction:
    """Exact input samples consumed per output sample.

    resample=(L, M): the input rate is nominal * M/L. ppm: the input
    clock additionally ran (1 + ppm*1e-6) fast (the convention of
    channel.model.sample_clock_offset, which this front-end inverts —
    tests/test_frontend.py proves round trips).
    """
    l, m = cfg.resample
    if l < 1 or m < 1:
        raise ValueError(f"resample ratio terms must be >= 1, got {(l, m)}")
    r = Fraction(m, l)
    if cfg.ppm:
        r = r / (1 + Fraction(cfg.ppm) / 10**6)
    return r


# ----------------------------------------------------------------------
# stages
# ----------------------------------------------------------------------


class _DecimStage:
    """Integer-M anti-alias decimation as K static strided slices."""

    def __init__(self, m: int, taps_per_phase: int):
        import scipy.signal as sig

        self.m = m
        # odd length -> type-I symmetric FIR with INTEGER group delay
        # (an even length's half-sample delay would skew every output by
        # half an input sample — a linear phase error across the band)
        self.k = m * taps_per_phase + 1
        self.center = (self.k - 1) // 2
        # passband gain 1 (no zero-stuffing loss), cutoff at the OUTPUT
        # Nyquist — firdes-style Kaiser design like ops/resampler.py
        self.taps = sig.firwin(self.k, 1.0 / m,
                               window=("kaiser", 7.0)).astype(np.float32)
        self.in_per_out = Fraction(m)

    def apply(self, x: jnp.ndarray, n_out: int, a: int) -> jnp.ndarray:
        """y[..., j] = sum_t h[t] * x[..., j*m + a - t], j in [0, n_out).
        Requires a >= k-1 and x.shape[-1] >= (n_out-1)*m + a + 1."""
        assert a >= self.k - 1
        h = self.taps
        acc = None
        for t in range(self.k):
            s = a - t
            sl = jax.lax.slice_in_dim(
                x, s, s + (n_out - 1) * self.m + 1, stride=self.m, axis=-1)
            acc = h[t] * sl if acc is None else acc + h[t] * sl
        return acc


class _TrimStage:
    """ppm-scale resampling by per-sub-block fractional delay."""

    def __init__(self, in_per_out: Fraction, frac_taps: int, sub: int):
        self.r = in_per_out
        self.delta = float(in_per_out - 1)       # |delta| <= 2.5e-3
        self.k = frac_taps
        self.center = (self.k - 1) // 2
        self.sub = sub
        self.in_per_out = in_per_out

    def _taps(self, taus: jnp.ndarray) -> jnp.ndarray:
        """(B,) fractional delays in [0, 1) -> (B, K) Hann-windowed-sinc
        interpolation taps for y = x(i + tau): c_t = wsinc(t - c - tau)."""
        arg = (jnp.arange(self.k)[None, :].astype(jnp.float32)
               - self.center - taus[:, None])
        w = jnp.maximum(0.0, 0.5 + 0.5 * jnp.cos(
            jnp.pi * arg / (self.center + 1)))
        h = jnp.sinc(arg) * w
        return h / jnp.sum(h, axis=-1, keepdims=True)

    def apply(self, x: jnp.ndarray, sub_starts: jnp.ndarray,
              taus: jnp.ndarray, n_out: int) -> jnp.ndarray:
        """x: (..., N); sub_starts: (B,) int32 window origin of each
        sub-block (covers taps: output i of sub-block b reads
        x[start_b + i .. start_b + i + K)); taus: (B,) f32 fractional
        delay per sub-block. Returns (..., n_out)."""
        def cut(st):
            return jax.lax.dynamic_slice_in_dim(
                x, st, self.sub + self.k, axis=-1)

        w = jax.vmap(cut, out_axes=-2)(sub_starts)   # (..., B, sub+K)
        h = self._taps(taus)                         # (B, K)
        acc = None
        for t in range(self.k):
            term = h[:, t][:, None] * w[..., t : t + self.sub]
            acc = term if acc is None else acc + term
        y = acc.reshape(acc.shape[:-2] + (-1,))
        return y[..., :n_out]


# ----------------------------------------------------------------------
# the front-end
# ----------------------------------------------------------------------


class Frontend:
    """Factored rate-conversion chain + executor geometry helpers."""

    def __init__(self, cfg: FrontendConfig):
        self.cfg = cfg
        self.ratio = combined_in_per_out(cfg)     # input per output, exact
        self.decim: _DecimStage | None = None
        self.trim: _TrimStage | None = None
        self.general: Fraction | None = None
        r = self.ratio
        if r == 1:
            return
        m0 = (r.numerator + r.denominator // 2) // r.denominator  # round(r)
        if 2 <= m0 <= _MAX_DECIM and abs(r / m0 - 1) <= _TRIM_MAX:
            self.decim = _DecimStage(m0, cfg.taps_per_phase)
            resid = r / m0
            if resid != 1:
                self.trim = _TrimStage(resid, cfg.frac_taps, cfg.sub_block)
        elif abs(r - 1) <= _TRIM_MAX:
            self.trim = _TrimStage(r, cfg.frac_taps, cfg.sub_block)
        else:
            self.general = r                      # ops/resampler fallback

    @property
    def active(self) -> bool:
        return self.ratio != 1

    def out_len(self, n_in: int) -> int:
        """Number of complete output-grid samples in an n_in-sample input."""
        return int(n_in / self.ratio)

    # exact mid-rate position chain: out global s -> mid position (after
    # decim, before trim); mid == in when no decim, mid == out when no trim
    def _mid_pos(self, s) -> Fraction:
        return Fraction(s) * (self.trim.r if self.trim else 1)

    # -- local (resident whole-stream) path ----------------------------

    def _local_mid_geom(self, np_out: int, p_out: int) -> tuple[int, int]:
        """(p_mid, n_mid): the intermediate (post-decim, pre-trim) padded
        stream's left pad and total length. The last trim sub-block's
        window (sub + K samples past its start) must fit."""
        tr = self.trim
        if tr is None:
            return p_out, np_out
        p_mid = int(math.ceil(p_out * float(tr.r))) + tr.center + 4
        n_mid = (int(math.ceil((np_out - p_out) * float(tr.r)))
                 + p_mid + tr.sub + tr.k + 8)
        return p_mid, n_mid

    def padded_geometry(self, np_out: int, p_out: int):
        """Static geometry for the whole-padded-stream correction.

        np_out: padded output length; p_out: output left pad (HALO_LEFT —
        padded output index p holds out global sample p - p_out).
        Returns (p_in, n_in_pad, aux) where aux are host-exact device
        operands for the jitted pass (trim sub-block starts/taus).
        """
        if self.general is not None:
            return self._general_geometry(np_out, p_out)
        p_mid, n_mid = self._local_mid_geom(np_out, p_out)
        if self.trim is not None:
            tr = self.trim
            n_sub = -(-np_out // tr.sub)
            sub_starts = np.empty(n_sub, np.int32)
            taus = np.empty(n_sub, np.float32)
            half = Fraction(tr.sub, 2) * (tr.r - 1)
            for b in range(n_sub):
                p = self._mid_pos(b * tr.sub - p_out)       # exact
                base = math.floor(p)
                sub_starts[b] = base - tr.center + p_mid
                taus[b] = float(p - base + half)  # delay at sub-block middle
            assert sub_starts.min() >= 0
            assert sub_starts.max() + tr.sub + tr.k <= n_mid
            aux = (jnp.asarray(sub_starts), jnp.asarray(taus))
        else:
            aux = ()
        if self.decim is not None:
            de = self.decim
            p_in = p_mid * de.m + de.k
            n_in_pad = n_mid * de.m + 2 * de.k
        else:
            p_in, n_in_pad = p_mid, n_mid
        return p_in, n_in_pad, aux

    def correct_padded(self, x: jnp.ndarray, np_out: int, p_out: int,
                       aux) -> jnp.ndarray:
        """In-graph: (..., n_in_pad) complex input-rate padded stream ->
        (..., np_out) corrected output-rate padded stream."""
        if self.general is not None:
            return self._general_apply(x, np_out, p_out)
        _, n_mid = self._local_mid_geom(np_out, p_out)
        mid = x
        if self.decim is not None:
            mid = self.decim.apply(x, n_mid, self.decim.k + self.decim.center)
        if self.trim is not None:
            mid = self.trim.apply(mid, aux[0], aux[1], np_out)
        return mid

    # general-rational fallback: one ops/resampler pass, local mode only
    _GEN_MARGIN = 16

    def _general_geometry(self, np_out: int, p_out: int):
        r = self.general
        m, l = r.numerator, r.denominator
        p_in = m * (p_out + self._GEN_MARGIN)
        s0 = p_out * (l - 1) + l * self._GEN_MARGIN
        n_in_pad = int(math.ceil((s0 + np_out) * r)) + self._GEN_MARGIN * m
        return p_in, n_in_pad, ()

    def _general_apply(self, x, np_out, p_out):
        from gnuradio_wifi_imagetransfer_tpu.ops import resampler

        r = self.general
        m, l = r.numerator, r.denominator
        s0 = p_out * (l - 1) + l * self._GEN_MARGIN
        y = resampler.rational_resampler(x, l, m)
        return y[..., s0 : s0 + np_out]

    # -- mesh (per-shard extended block) path --------------------------

    def _trim_guards(self, ext_out: int) -> tuple[int, int]:
        d = self.trim.delta if self.trim else 0.0
        left = int(math.ceil(ext_out * max(-d, 0.0))) + 4
        right = int(math.ceil(ext_out * max(d, 0.0))) + 4
        return left, right

    def block_ext_in(self, ext_out: int) -> int:
        """Static input-window length a shard needs to produce ext_out
        corrected samples (filter tails + clock-drift guards included)."""
        if self.general is not None:
            raise ValueError(
                "mesh-mode executors support decimation/clock-trim "
                "front-ends; general rational ratios run in local mode")
        ext_mid = ext_out
        if self.trim is not None:
            lg, rg = self._trim_guards(ext_out)
            ext_mid = ext_out + lg + rg + self.trim.k + self.trim.sub
        if self.decim is not None:
            de = self.decim
            return (ext_mid - 1) * de.m + de.k + de.center + 1
        return ext_mid

    def block_cut(self, s0: int, ext_out: int) -> tuple[int, float]:
        """Host-exact cut parameters for a window producing ext_out
        corrected samples from out-global sample s0: returns
        (in_cut, tau0) — the absolute input index to cut
        block_ext_in(ext_out) samples from, and the fractional phase
        scalar the in-graph correction needs."""
        if self.trim is not None:
            lg, _ = self._trim_guards(ext_out)
            p = self._mid_pos(s0)
            mid0 = math.floor(p) - self.trim.center - lg
            tau0 = float(p - mid0)
        else:
            mid0, tau0 = s0, 0.0
        if self.decim is not None:
            return mid0 * self.decim.m - self.decim.k, tau0
        return mid0, tau0

    def correct_block(self, x: jnp.ndarray, tau0, ext_out: int) -> jnp.ndarray:
        """In-graph: (..., block_ext_in(ext_out)) raw cut + tau0 scalar ->
        (..., ext_out) corrected samples. Stateless: guards recompute
        from ext_out, so one cached Frontend serves every window size
        (executor blocks AND adaptive stage-B windows)."""
        mid = x
        if self.decim is not None:
            de = self.decim
            ext_mid = (x.shape[-1] - de.k - de.center) // de.m + 1
            mid = de.apply(x, ext_mid, de.k + de.center)
        if self.trim is not None:
            tr = self.trim
            n_sub = -(-ext_out // tr.sub)
            b = jnp.arange(n_sub).astype(jnp.float32) * tr.sub
            q = tau0 + b * tr.delta                   # drift, |q| small
            qf = jnp.floor(q)
            sub_starts = ((jnp.arange(n_sub) * tr.sub).astype(jnp.int32)
                          + qf.astype(jnp.int32) - tr.center)
            taus = q - qf + (tr.sub / 2) * tr.delta   # delay at middle
            mid = tr.apply(mid, sub_starts, taus, ext_out)
        return mid


@functools.lru_cache(maxsize=16)
def cached_frontend(cfg: FrontendConfig) -> Frontend | None:
    """One Frontend per config (tap design + Fraction factoring cached);
    None when the combined ratio is exactly 1."""
    fe = Frontend(cfg)
    return fe if fe.active else None
