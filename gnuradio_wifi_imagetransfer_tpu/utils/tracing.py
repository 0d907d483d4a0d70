"""Observability: per-stage sample/frame counters, timers, SNR probe,
and JAX profiler hooks.

The reference's only observability is its Qt GUI sinks and the
probe_mpsk_snr_est_c(0, 1000, 0.05) running SNR estimator on the equalized
constellation (IRS_AP.py:275,312); SURVEY.md §5 calls for the rebuild to
formalize this as JAX profiler hooks plus per-stage counters. This module
provides:

    Tracer        thread-safe per-stage counters (samples, frames, calls,
                  seconds) with a `stage()` timing context manager;
    SnrProbe      EWMA second/fourth-moment SNR estimator matching the
                  probe's alpha=0.05 update on equalized symbols;
    evm_snr_db    batched on-device EVM->SNR metric for equalized frames;
    ConstellationProbe  ring buffer of recent equalized symbols (the
                  frame_equalizer "symbols" port -> const_sink_c analogue);
    SpectrumProbe Welch-averaged PSD of recent samples (freq/waterfall
                  sink analogue);
    profile()     context manager around jax.profiler.trace for TensorBoard
                  traces of the streaming hot path.

The StreamExecutor (parallel/executor.py) accepts a Tracer and feeds the
`ingest`, `device_step`, and `collect` stages automatically.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
import time

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class StageStats:
    calls: int = 0
    seconds: float = 0.0
    samples: int = 0
    frames: int = 0

    def throughput_msps(self) -> float:
        """Msamples/s through this stage (0 when untimed)."""
        return self.samples / self.seconds / 1e6 if self.seconds > 0 else 0.0


class Tracer:
    """Thread-safe per-stage counter registry."""

    def __init__(self):
        self._lock = threading.Lock()
        self._stages: dict[str, StageStats] = {}

    def _get(self, name: str) -> StageStats:
        if name not in self._stages:
            self._stages[name] = StageStats()
        return self._stages[name]

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0, frames: int = 0):
        """Time a stage invocation and attribute samples/frames to it."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._get(name)
                s.calls += 1
                s.seconds += dt
                s.samples += samples
                s.frames += frames

    def count(self, name: str, samples: int = 0, frames: int = 0,
              calls: int = 1):
        """Attribute counts to a stage without timing it."""
        with self._lock:
            s = self._get(name)
            s.calls += calls
            s.samples += samples
            s.frames += frames

    def report(self) -> dict[str, StageStats]:
        with self._lock:
            return {k: dataclasses.replace(v) for k, v in self._stages.items()}

    def summary(self) -> str:
        rows = ["stage                 calls      sec     Msamples  frames  Msps"]
        for name, s in sorted(self.report().items()):
            rows.append(
                f"{name:<20} {s.calls:>6} {s.seconds:>8.3f} "
                f"{s.samples / 1e6:>10.3f} {s.frames:>7} "
                f"{s.throughput_msps():>7.1f}")
        return "\n".join(rows)

    def reset(self):
        with self._lock:
            self._stages.clear()


_default = Tracer()


def default_tracer() -> Tracer:
    return _default


def evm_snr_db(eq_symbols: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """Per-frame SNR estimate from equalized data symbols (..., S, 48).

    Error vector magnitude against the nearest constellation point (the
    decision-directed analogue of the reference's SNR probe on its
    constellation-display stream): SNR = P_signal / P_error. Returns (...,)
    float32 dB, reduced over the trailing (symbol, carrier) axes.
    """
    from gnuradio_wifi_imagetransfer_tpu.phy import params

    n_bpsc = int(params.MCS_N_BPSC[mcs])
    points = jnp.asarray(params.constellation(n_bpsc))
    idx = jnp.argmin(jnp.abs(eq_symbols[..., None] - points) ** 2, axis=-1)
    nearest = points[idx]
    err = jnp.mean(jnp.abs(eq_symbols - nearest) ** 2, axis=(-2, -1))
    sig = jnp.mean(jnp.abs(nearest) ** 2, axis=(-2, -1))
    return (10.0 * jnp.log10(jnp.maximum(sig, 1e-12)
                             / jnp.maximum(err, 1e-12))).astype(jnp.float32)


class SnrProbe:
    """Running M2/M4 SNR estimator (probe_mpsk_snr_est_c semantics).

    The GNU Radio probe updates second/fourth moments with EWMA alpha
    (instantiated alpha=0.05, IRS_AP.py:275) and derives SNR via the
    M2M4 estimator. Host-side, numpy."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.m2: float | None = None
        self.m4: float | None = None

    def update(self, symbols: np.ndarray) -> float:
        s = np.asarray(symbols).ravel()
        p2 = float(np.mean(np.abs(s) ** 2))
        p4 = float(np.mean(np.abs(s) ** 4))
        if self.m2 is None:
            self.m2, self.m4 = p2, p4
        else:
            a = self.alpha
            self.m2 = (1 - a) * self.m2 + a * p2
            self.m4 = (1 - a) * self.m4 + a * p4
        return self.snr_db()

    def snr_db(self) -> float:
        if self.m2 is None:
            return float("nan")
        # M2M4 for constant-modulus signal + complex AWGN:
        #   S = sqrt(2*M2^2 - M4), N = M2 - S
        s = np.sqrt(max(2 * self.m2**2 - self.m4, 1e-20))
        n = max(self.m2 - s, 1e-20)
        return float(10.0 * np.log10(s / n))


class ConstellationProbe:
    """Ring buffer of recent equalized data-carrier symbols.

    The analogue of the reference's constellation display chain:
    frame_equalizer's "symbols" message port -> pdu_to_tagged_stream ->
    qtgui.const_sink_c (IRS_AP.py:267,293,312-313). Headless here: the
    probe keeps the latest points for rendering/inspection (the split
    RxRadio feeds it per decoded frame) and exposes them as (N, 2)
    re/im float32."""

    def __init__(self, capacity: int = 4096):
        self.capacity = int(capacity)
        self._buf = np.zeros(self.capacity, np.complex64)
        self._n = 0          # total symbols ever pushed
        self._lock = threading.Lock()

    def push(self, symbols: np.ndarray) -> None:
        s = np.asarray(symbols).ravel().astype(np.complex64)
        if s.size >= self.capacity:
            s = s[-self.capacity:]
        with self._lock:
            pos = self._n % self.capacity
            first = min(self.capacity - pos, s.size)
            self._buf[pos : pos + first] = s[:first]
            if first < s.size:
                self._buf[: s.size - first] = s[first:]
            self._n += s.size

    def points(self, n: int | None = None) -> np.ndarray:
        """Most recent min(n, stored) symbols as (N, 2) float32 re/im."""
        with self._lock:
            stored = min(self._n, self.capacity)
            pos = self._n % self.capacity
            ring = np.concatenate([self._buf[pos:], self._buf[:pos]])[-stored:]
        if n is not None:
            ring = ring[-n:]
        return np.stack([ring.real, ring.imag], axis=-1).astype(np.float32)


class SpectrumProbe:
    """Welch-style averaged power spectrum of recent samples — the
    headless analogue of the reference's qtgui.freq_sink_c / waterfall
    displays (IRS_user.py:174-191). EWMA-averaged periodograms over
    ``nfft``-sample segments, Hann-windowed, fftshifted so bin 0 is
    -fs/2."""

    def __init__(self, nfft: int = 512, alpha: float = 0.2):
        self.nfft = int(nfft)
        self.alpha = float(alpha)
        self._window = np.hanning(self.nfft).astype(np.float32)
        self._psd: np.ndarray | None = None
        self._lock = threading.Lock()

    def update(self, samples: np.ndarray) -> None:
        x = np.asarray(samples).ravel()
        n_seg = x.size // self.nfft
        if n_seg == 0:
            return
        segs = x[: n_seg * self.nfft].reshape(n_seg, self.nfft) * self._window
        p = np.mean(np.abs(np.fft.fftshift(np.fft.fft(segs, axis=-1),
                                           axes=-1)) ** 2, axis=0)
        with self._lock:
            if self._psd is None:
                self._psd = p
            else:
                self._psd = (1 - self.alpha) * self._psd + self.alpha * p

    def psd_db(self) -> np.ndarray:
        """(nfft,) averaged PSD in dB (NaN-free; -200 dB floor when empty)."""
        with self._lock:
            if self._psd is None:
                return np.full(self.nfft, -200.0, np.float32)
            return (10.0 * np.log10(np.maximum(self._psd, 1e-20))
                    ).astype(np.float32)


@contextlib.contextmanager
def profile(logdir: str | None = None):
    """JAX profiler trace scope (TensorBoard format). No-op when logdir is
    None or the profiler is unavailable (e.g. CPU test backends without
    profiler support)."""
    if logdir is None:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
