"""Frame synchronization front-end: dense STF autocorrelation detection,
coarse/fine CFO estimation, and LTF matched-filter timing.

Replicates the reference RX front-end (SURVEY.md §3.2) — the inline
delay-16 conjugate-multiply / moving-average / divide graph (IRS_AP.py:
276-285,294-316), ieee802_11.sync_short(threshold=0.56, min_plateau=2)
(IRS_AP.py:268) and ieee802_11.sync_long(sync_length=320) (IRS_AP.py:269) —
redesigned for TPU: instead of a per-sample C++ state machine, every
statistic is computed densely for the whole time-block with prefix sums,
frame starts are gathered into a fixed number of candidate slots, and the
LTF cross-correlation runs as one batched matmul against gathered windows
(MXU-shaped: (T, 64) x (64,)).

Statistic definitions (matching the GNU Radio graph):
    m[n] = x[n] * conj(x[n-16])
    a[n] = sum_{k=n-47..n} m[k]          (moving_average_cc(48))
    p[n] = sum_{k=n-63..n} |x[k]|^2      (moving_average_ff(64))
    c[n] = |a[n]| / p[n]
Trigger: c >= threshold for >= min_plateau consecutive samples (rising
edge); coarse CFO = arg(a[edge]) / 16 per sample, like sync_short.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import params

# Window geometry for candidate extraction: we cut a window starting
# MARGIN samples before the detected edge; the edge lies somewhere inside
# the 160-sample STF, so the full preamble + frame always fits in
# MARGIN + PREAMBLE + payload + slack.
MARGIN = 160
LTF_SEARCH = MARGIN + params.PREAMBLE_LEN  # matched-filter search span


def window_len(n_sym: int) -> int:
    """Extraction window length for a frame of n_sym data symbols."""
    return MARGIN + params.PREAMBLE_LEN + (1 + n_sym) * params.N_SYM + 2 * params.N_SYM


@dataclasses.dataclass
class FrameCandidates:
    starts: jnp.ndarray    # (K,) int32 sample index of detection edge
    valid: jnp.ndarray     # (K,) bool
    cfo: jnp.ndarray       # (K,) float32 coarse CFO (rad/sample)
    ratio: jnp.ndarray     # (K,) float32 c[n] at the edge


def sync_stats(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense (a, p, c) statistics for every sample of a stream.

    x: (..., N) complex64. Returns (a, p, c), each (..., N); positions
    whose windows are not yet filled hold partial sums (like the
    streaming blocks after reset).
    """
    import os

    flag = os.environ.get("GWT_PALLAS_SYNC")
    if flag is not None:
        use_pallas = flag not in ("0", "false", "")
    else:
        # hardware-validated 2026-08-20 on a v5e chip: the fused
        # banded-matmul kernel (ops/pallas_sync.py) matches this XLA
        # path to 1.5e-6 rel and runs 580 vs 373 Msps on a 1M-sample
        # stream — default ON for TPU backends
        try:
            use_pallas = jax.default_backend() in ("tpu", "axon")
        except RuntimeError as e:           # backend init failed
            import warnings

            warnings.warn(
                f"backend probe failed ({e}); sync statistics fall back to "
                "the XLA path — set GWT_PALLAS_SYNC to pin the choice",
                RuntimeWarning, stacklevel=2)
            use_pallas = False
    if use_pallas:
        from gnuradio_wifi_imagetransfer_tpu.ops import pallas_sync

        return pallas_sync.sync_stats(x)
    xm16 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(16, 0)])[..., : x.shape[-1]]
    m = x * jnp.conj(xm16)
    a = _moving_sum(m, 48)
    p = _moving_sum(jnp.abs(x) ** 2, 64)
    c = jnp.abs(a) / jnp.maximum(p, 1e-12)
    return a, p, c


def _moving_sum(v: jnp.ndarray, w: int, seg: int = 512) -> jnp.ndarray:
    """Trailing moving sum of width w along the last axis.

    Implemented with SEGMENTED cumulative sums: a plain global cumsum
    difference cs[n] - cs[n-w] suffers float32 catastrophic cancellation
    (after ~1e6 unit-power samples the residue in silent regions rivals
    real signal statistics and produces false sync edges). Here cumsums
    are local to seg-sample rows, so every window sum is a difference of
    partial sums bounded by one row's energy — and exact zero in silent
    rows. Requires w <= seg.
    """
    assert w <= seg
    n = v.shape[-1]
    pad = (-n) % seg
    vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
    rows = vp.reshape(vp.shape[:-1] + (-1, seg))              # (..., R, S)
    c = jnp.cumsum(rows, axis=-1)
    prev_c = jnp.roll(c, 1, axis=-2).at[..., 0, :].set(0)     # previous row's cumsum
    prev_tot = prev_c[..., -1:]                               # (..., R, 1)
    j = jnp.arange(seg)
    jmw = j - w
    within = jmw >= 0
    # window entirely inside this row:
    sub_in = jnp.take(c, jnp.maximum(jmw, 0), axis=-1)
    # window crossing from the previous row: sum = c[i, j] +
    # (prev_tot - prev_c[i-1, S + j - w])
    sub_prev = jnp.take(prev_c, jnp.minimum(jmw + seg, seg - 1), axis=-1)
    ws = jnp.where(within, c - sub_in, c + prev_tot - sub_prev)
    return ws.reshape(vp.shape)[..., :n]


def detect(
    x: jnp.ndarray,
    max_frames: int,
    cfg: PhyConfig = PhyConfig(),
    search_lo: int = 0,
    search_hi: int | None = None,
) -> FrameCandidates:
    """Find up to ``max_frames`` frame-start candidates in a stream.

    x: (N,) complex64 (one stream; vmap for batches).
    search_lo/search_hi bound the edge positions considered (the streaming
    executor uses them to ignore the halo region so a frame is claimed by
    exactly one shard).
    """
    n = x.shape[-1]
    a, p, c = sync_stats(x)
    above = c >= cfg.sync_threshold
    # plateau of >= min_plateau consecutive samples ending at n
    plateau = above
    for k in range(1, cfg.min_plateau):
        plateau = jnp.logical_and(
            plateau, jnp.pad(above, (k, 0))[: n]
        )
    edge = jnp.logical_and(plateau, jnp.logical_not(jnp.pad(plateau, (1, 0))[:n]))
    idx = jnp.arange(n)
    if search_hi is None:
        search_hi = n
    in_range = jnp.logical_and(idx >= search_lo, idx < search_hi)
    edge = jnp.logical_and(edge, in_range)
    # first K edges == the K largest values of -index among edges (block
    # sentinel -n for non-edges); top_k is O(n·K)-ish on TPU where a full
    # jnp.sort of the 256k-sample block was the RX step's single biggest
    # cost (v5e, 2026-08-21: detection+gather 444 -> 1953 Msps marginal,
    # full RX step 305 -> 635 Msps). top_k returns values descending,
    # i.e. indices ascending — the same order the sort produced.
    key = jnp.where(edge, -idx, -n)
    neg_starts, _ = jax.lax.top_k(key, max_frames)
    starts = (-neg_starts).astype(jnp.int32)
    valid = starts < n
    starts_c = jnp.minimum(starts, n - 1)
    # edge index is the plateau *end* of the first min_plateau run; the
    # trigger sample (first above-threshold) is min_plateau-1 earlier.
    trigger = jnp.maximum(starts_c - (cfg.min_plateau - 1), 0)
    cfo = jnp.angle(a[trigger]) / 16.0
    return FrameCandidates(
        starts=jnp.where(valid, trigger, 0).astype(jnp.int32),
        valid=valid,
        cfo=jnp.where(valid, cfo, 0.0).astype(jnp.float32),
        ratio=c[trigger].astype(jnp.float32),
    )


def extract(x: jnp.ndarray, starts: jnp.ndarray, wlen: int) -> jnp.ndarray:
    """Cut fixed windows beginning MARGIN before each candidate edge.

    x: (N,); starts: (K,) -> (K, wlen). dynamic_slice clamps at the ends.
    """
    def cut(s):
        return jax.lax.dynamic_slice(x, (jnp.maximum(s - MARGIN, 0),), (wlen,))

    return jax.vmap(cut)(starts)


def _ltf_locate(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Locate the second LTF body in each corrected window.

    w: (K, WL). Returns (q, score): q (K,) index of the second 64-sample
    LTF body; score (K,) the combined correlation magnitude.

    The matched filter is a batched matmul: gathered (K, T, 64) windows
    against the conjugate LTF (64,) — MXU-friendly.
    """
    t_span = LTF_SEARCH
    offs = jnp.arange(t_span)[:, None] + jnp.arange(64)[None, :]      # (T, 64)
    win = w[:, offs]                                                   # (K, T, 64)
    ltf = jnp.conj(jnp.asarray(params.LTF_TIME))
    corr = jnp.abs(win @ ltf)                                          # (K, T)
    score = corr[:, : t_span - 64] + corr[:, 64:]
    q1 = jnp.argmax(score, axis=-1)
    return (q1 + 64).astype(jnp.int32), jnp.take_along_axis(score, q1[:, None], 1)[:, 0]


def fine_cfo(w: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Residual CFO from the two LTF repetitions 64 samples apart.

    w: (K, WL); q: (K,) second-body start. Returns (K,) rad/sample.
    """
    offs = q[:, None] + jnp.arange(64)
    b2 = jnp.take_along_axis(w, offs, axis=1)
    b1 = jnp.take_along_axis(w, offs - 64, axis=1)
    return (jnp.angle(jnp.sum(b2 * jnp.conj(b1), axis=-1)) / 64.0).astype(jnp.float32)


def synchronize(
    x: jnp.ndarray,
    n_sym: int,
    max_frames: int,
    cfg: PhyConfig = PhyConfig(),
    search_lo: int = 0,
    search_hi: int | None = None,
):
    """Full front-end: detect, extract, CFO-correct, time-align.

    x: (N,) complex64 raw stream.
    Returns (windows, frame_start, cand): windows (K, WL) CFO-corrected
    samples, frame_start (K,) index of the preamble start within each
    window (feed to rx.decode_aligned), and the FrameCandidates record.
    """
    wlen = window_len(n_sym)
    if x.shape[-1] < wlen:
        raise ValueError(
            f"stream of {x.shape[-1]} samples is shorter than one frame "
            f"extraction window ({wlen}); pad the block or use a larger "
            f"ExecutorConfig.block_size"
        )
    cand = detect(x, max_frames, cfg, search_lo, search_hi)
    raw = extract(x, cand.starts, wlen)                               # (K, WL)
    n_idx = jnp.arange(wlen)
    w1 = raw * jnp.exp(-1j * cand.cfo[:, None] * n_idx)
    q, score = _ltf_locate(w1)
    eps = fine_cfo(w1, q)
    w2 = w1 * jnp.exp(-1j * eps[:, None] * n_idx)
    frame_start = q - params.LTF2_OFFSET                              # preamble start
    # guard: a bogus peak location would index out of range
    max_start = wlen - (params.PREAMBLE_LEN + (1 + n_sym) * params.N_SYM + params.N_CP)
    ok = jnp.logical_and(frame_start >= 0, frame_start <= max_start)
    cand = FrameCandidates(
        starts=cand.starts,
        valid=jnp.logical_and(cand.valid, ok),
        cfo=(cand.cfo + eps).astype(jnp.float32),
        ratio=cand.ratio,
    )
    return w2, jnp.clip(frame_start, 0, max_start).astype(jnp.int32), cand


def receive(
    x: jnp.ndarray,
    plan,
    max_frames: int,
    cfg: PhyConfig = PhyConfig(),
    algo=None,
):
    """Raw stream -> decoded frames (fixed MCS/length plan).

    Returns (RxResult, cand) where invalid candidate slots carry garbage
    bytes (mask with cand.valid).
    """
    from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
    from gnuradio_wifi_imagetransfer_tpu.phy import rx as rxmod

    if algo is None:
        algo = ChannelEstimator(cfg.chan_est)
    windows, frame_start, cand = synchronize(x, plan.n_sym, max_frames, cfg)
    res = rxmod.decode_aligned(windows, plan, start=frame_start, algo=algo)
    return res, cand
