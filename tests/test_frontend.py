"""Rate-conversion front-end: standalone kernels + executor integration.

VERDICT r4 item 1: both executors must decode a 2x-oversampled AND a
+-40 ppm clock-skewed stream through run() bit-exact, in mesh and local
modes, with halo sizing accounting for filter tails.

Oversampled fixtures are built by EXACT FFT zero-pad interpolation (the
polyphase upsampler in ops/resampler.py has a half-sample bias at small
L from its even-length taps, which would contaminate the reference);
clock-skew fixtures use channel.model.sample_clock_offset — the exact
impairment the ppm front-end inverts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gnuradio_wifi_imagetransfer_tpu.channel.model import sample_clock_offset
from gnuradio_wifi_imagetransfer_tpu.config import (
    ExecutorConfig,
    FrontendConfig,
    PhyConfig,
)
from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (
    AdaptiveStreamExecutor,
    StreamExecutor,
)
from gnuradio_wifi_imagetransfer_tpu.parallel.frontend import (
    Frontend,
    cached_frontend,
    combined_in_per_out,
)
from gnuradio_wifi_imagetransfer_tpu.phy import tx


def fft_oversample(x: np.ndarray, m: int) -> np.ndarray:
    """Exact m-times oversampling by FFT zero padding (periodic)."""
    n = len(x)
    spec = np.fft.fft(x)
    up = np.zeros(m * n, np.complex64)
    h = n // 2
    up[:h] = spec[:h]
    up[-h:] = spec[-h:]
    return (np.fft.ifft(up) * m).astype(np.complex64)


def make_stream(rng, mcs=2, n_frames=6, n=120000, noise=0.012, seed_amp=1.0):
    frames = rng.integers(0, 256, (n_frames, 50), dtype=np.uint8)
    bursts = np.asarray(tx.transmit(frames, mcs)) * seed_amp
    stream = (noise * (rng.normal(size=n) + 1j * rng.normal(size=n))
              ).astype(np.complex64)
    step = (n - 8000) // n_frames
    starts = [4000 + i * step for i in range(n_frames)]
    for i, s in enumerate(starts):
        stream[s : s + bursts.shape[1]] += bursts[i]
    return stream, frames, starts


def assert_all_recovered(recs, frames, starts, tol=50):
    for i, s in enumerate(starts):
        hits = [r for r in recs
                if r.parity_ok and abs(r.global_start - s) < tol]
        assert hits, f"frame {i} near {s} not decoded"
        assert any(np.array_equal(r.psdu, frames[i]) for r in hits), \
            f"frame {i} decoded but payload differs"


# ----------------------------------------------------------------------
# factoring / ratios
# ----------------------------------------------------------------------


def test_ratio_factoring():
    from fractions import Fraction

    assert combined_in_per_out(FrontendConfig()) == 1
    assert cached_frontend(FrontendConfig()) is None
    fe = Frontend(FrontendConfig(resample=(1, 2)))
    assert fe.decim is not None and fe.decim.m == 2 and fe.trim is None
    fe = Frontend(FrontendConfig(ppm=40.0))
    assert fe.decim is None and fe.trim is not None
    assert fe.ratio == Fraction(25000, 25001)
    fe = Frontend(FrontendConfig(resample=(1, 2), ppm=40.0))
    assert fe.decim is not None and fe.trim is not None
    fe = Frontend(FrontendConfig(resample=(3, 4)))
    assert fe.general == Fraction(4, 3)
    with pytest.raises(ValueError):
        fe.block_ext_in(1000)          # general ratio is local-mode only


def test_decim_kernel_tone_exact():
    """Integer group delay: in-band tones pass with ~1e-4 error."""
    fe = Frontend(FrontendConfig(resample=(1, 2)))
    n_in = 8000
    for f in (0.01, 0.1):
        sig = np.exp(2j * np.pi * f * np.arange(n_in)).astype(np.complex64)
        n_out = fe.out_len(n_in)
        np_out = 256 + n_out + 64
        p_in, n_in_pad, aux = fe.padded_geometry(np_out, 256)
        buf = np.zeros(n_in_pad, np.complex64)
        buf[p_in : p_in + n_in] = sig
        out = np.asarray(jax.jit(
            lambda a: fe.correct_padded(a, np_out, 256, aux))(jnp.asarray(buf)))
        s = np.arange(100, n_out - 100)
        err = np.abs(out[256 + s] - np.exp(2j * np.pi * f * 2 * s))
        assert err.max() < 2e-4, (f, err.max())


def test_trim_kernel_inverts_sample_clock_offset():
    rng = np.random.default_rng(0)
    n = 40000
    spec = np.zeros(n, np.complex64)
    k = int(n * 0.35 / 2)
    spec[:k] = rng.normal(size=k) + 1j * rng.normal(size=k)
    spec[-k:] = rng.normal(size=k) + 1j * rng.normal(size=k)
    x = (np.fft.ifft(spec) * np.sqrt(n)).astype(np.complex64)
    y = np.asarray(sample_clock_offset(jnp.asarray(x), 40.0))
    fe = Frontend(FrontendConfig(ppm=40.0))
    n_out = fe.out_len(len(y))
    np_out = 256 + n_out + 512
    p_in, n_in_pad, aux = fe.padded_geometry(np_out, 256)
    buf = np.zeros(n_in_pad, np.complex64)
    buf[p_in : p_in + len(y)] = y
    out = np.asarray(jax.jit(
        lambda a: fe.correct_padded(a, np_out, 256, aux))(jnp.asarray(buf)))
    rec = out[256 : 256 + n_out]
    m = slice(100, n_out - 200)
    rms = np.sqrt(np.mean(np.abs(rec[m] - x[:n_out][m]) ** 2))
    sig_rms = np.sqrt(np.mean(np.abs(x[m]) ** 2))
    assert rms / sig_rms < 0.02          # < -34 dB residual


def _block_correct(fe, x, s0, ext_out):
    """Host-cut + in-graph per-block correction (the mesh shard path)."""
    n_in = len(x)
    in_cut, tau0 = fe.block_cut(s0, ext_out)
    ext_in = fe.block_ext_in(ext_out)
    cut = np.zeros(ext_in, np.complex64)
    lo, hi = max(in_cut, 0), min(in_cut + ext_in, n_in)
    cut[lo - in_cut : lo - in_cut + hi - lo] = x[lo:hi]
    return np.asarray(jax.jit(
        lambda a, t: fe.correct_block(a, t, ext_out))(
        jnp.asarray(cut), jnp.float32(tau0)))


def test_block_path_decim_matches_padded_path():
    """No fractional phase: the per-shard decim correction must agree
    with the whole-stream pass bit-for-bit (same samples, same taps)."""
    rng = np.random.default_rng(3)
    n_in = 30000
    x = (rng.normal(size=n_in) + 1j * rng.normal(size=n_in)).astype(
        np.complex64)
    fe = Frontend(FrontendConfig(resample=(1, 2)))
    n_out = fe.out_len(n_in)
    np_out = 256 + n_out + 64
    p_in, n_in_pad, aux = fe.padded_geometry(np_out, 256)
    buf = np.zeros(n_in_pad, np.complex64)
    buf[p_in : p_in + n_in] = x
    whole = np.asarray(jax.jit(
        lambda a: fe.correct_padded(a, np_out, 256, aux))(jnp.asarray(buf)))
    s0, ext_out = 5000, 4096
    blk = _block_correct(fe, x, s0, ext_out)
    err = np.abs(blk - whole[256 + s0 : 256 + s0 + ext_out])
    assert err.max() < 1e-5, err.max()


def test_block_path_trim_matches_analytic_positions():
    """The per-shard trim correction must land on the EXACT resample
    grid: compare against the band-limited truth evaluated analytically
    at in_pos(s) (a 1-sample phase-chain error would blow this up by
    ~2 orders of magnitude; only the interpolator's in-band ripple
    remains)."""
    rng = np.random.default_rng(3)
    n_in = 30000
    kb = int(n_in * 0.35 / 2)
    spec = np.zeros(n_in, np.complex64)
    spec[:kb] = rng.normal(size=kb) + 1j * rng.normal(size=kb)
    spec[-kb:] = rng.normal(size=kb) + 1j * rng.normal(size=kb)
    x = (np.fft.ifft(spec) * np.sqrt(n_in)).astype(np.complex64)

    freqs = np.fft.fftfreq(n_in)
    nz = np.nonzero(spec)[0]

    def truth(pos):                     # evaluate the trig polynomial
        e = np.exp(2j * np.pi * np.outer(pos, freqs[nz]))
        return (e @ spec[nz]) * np.sqrt(n_in) / n_in

    for cfg in (FrontendConfig(ppm=-40.0),
                FrontendConfig(resample=(1, 2), ppm=25.0)):
        fe = Frontend(cfg)
        s0, ext_out = 5000, 2048
        blk = _block_correct(fe, x, s0, ext_out)
        pos = np.array([float(fe.ratio * (s0 + i)) for i in range(ext_out)])
        ref = truth(pos)
        rel = (np.sqrt(np.mean(np.abs(blk - ref) ** 2))
               / np.sqrt(np.mean(np.abs(ref) ** 2)))
        assert rel < 0.02, (cfg, rel)


# ----------------------------------------------------------------------
# executor integration — the VERDICT matrix
# ----------------------------------------------------------------------



def _run_fixed(mode, fe_cfg, stream_in, plan):
    cfg = ExecutorConfig(block_size=1 << 14, time_shards=2, frontend=fe_cfg)
    if mode == "mesh":
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                    ("channel", "time"))
        ex = StreamExecutor(plan, mesh=mesh, exec_cfg=cfg)
    else:
        ex = StreamExecutor(plan, mesh=None, exec_cfg=cfg)
    return ex.run(stream_in[None, :])


def _run_adaptive(mode, fe_cfg, stream_in):
    cfg = ExecutorConfig(block_size=1 << 14, time_shards=2, frontend=fe_cfg)
    if mode == "mesh":
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                    ("channel", "time"))
        ex = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg)
    else:
        ex = AdaptiveStreamExecutor(mesh=None, exec_cfg=cfg)
    return ex.run(stream_in)


@pytest.mark.parametrize("mode", ["local", "mesh"])
def test_fixed_executor_decodes_2x_oversampled(mode):
    rng = np.random.default_rng(7)
    stream, frames, starts = make_stream(rng)
    up = fft_oversample(stream, 2)
    plan = tx.tx_plan(2, 50)
    recs = _run_fixed(mode, FrontendConfig(resample=(1, 2)), up, plan)
    assert_all_recovered(recs, frames, starts)


@pytest.mark.parametrize("mode", ["local", "mesh"])
@pytest.mark.parametrize("ppm", [40.0, -40.0])
def test_fixed_executor_decodes_clock_skew(mode, ppm):
    rng = np.random.default_rng(11)
    stream, frames, starts = make_stream(rng)
    skewed = np.asarray(sample_clock_offset(jnp.asarray(stream), ppm))
    plan = tx.tx_plan(2, 50)
    recs = _run_fixed(mode, FrontendConfig(ppm=ppm), skewed, plan)
    assert_all_recovered(recs, frames, starts)


@pytest.mark.parametrize("mode", ["local", "mesh"])
def test_adaptive_executor_decodes_2x_oversampled(mode):
    rng = np.random.default_rng(13)
    stream, frames, starts = make_stream(rng)
    up = fft_oversample(stream, 2)
    recs = _run_adaptive(mode, FrontendConfig(resample=(1, 2)), up[None, :])
    assert_all_recovered(recs, frames, starts)
    assert all(r.rate_idx == 2 and r.length == 50
               for r in recs if r.parity_ok)


@pytest.mark.parametrize("mode", ["local", "mesh"])
def test_adaptive_executor_decodes_clock_skew(mode):
    rng = np.random.default_rng(17)
    stream, frames, starts = make_stream(rng)
    skewed = np.asarray(sample_clock_offset(jnp.asarray(stream), -40.0))
    recs = _run_adaptive(mode, FrontendConfig(ppm=-40.0), skewed[None, :])
    assert_all_recovered(recs, frames, starts)


def test_fixed_executor_oversampled_and_skewed_combo():
    """The realistic SDR capture: 2x oversampled AND 40 ppm off."""
    rng = np.random.default_rng(19)
    stream, frames, starts = make_stream(rng)
    up = fft_oversample(stream, 2)
    bad = np.asarray(sample_clock_offset(jnp.asarray(up), 40.0))
    plan = tx.tx_plan(2, 50)
    recs = _run_fixed("local", FrontendConfig(resample=(1, 2), ppm=40.0),
                      bad, plan)
    assert_all_recovered(recs, frames, starts)


def test_general_rational_frontend_local():
    """Arbitrary small rational (input at 4/3 the nominal rate) through
    the ops/resampler fallback, local mode."""
    rng = np.random.default_rng(23)
    stream, frames, starts = make_stream(rng, n=90000, n_frames=4)
    # input at 4/3 nominal: exact FFT 4x then keep every 3rd sample
    up = fft_oversample(stream, 4)[::3].copy()
    plan = tx.tx_plan(2, 50)
    recs = _run_fixed("local", FrontendConfig(resample=(3, 4)), up, plan)
    assert_all_recovered(recs, frames, starts)


def test_untuned_frontend_is_noop():
    """resample=(1,1), ppm=0 must behave exactly like frontend=None."""
    rng = np.random.default_rng(29)
    stream, frames, starts = make_stream(rng, n=60000, n_frames=3)
    plan = tx.tx_plan(2, 50)
    base = _run_fixed("local", None, stream, plan)
    noop = _run_fixed("local", FrontendConfig(), stream, plan)
    assert len(base) == len(noop)
    for a, b in zip(base, noop):
        assert a.global_start == b.global_start
        assert np.array_equal(a.psdu, b.psdu)


def test_high_mcs_through_decim_frontend():
    """64-QAM 3/4 at high SNR through the anti-alias filter: the LTF
    sees the same band-edge droop as the data, so LS absorbs it."""
    rng = np.random.default_rng(31)
    stream, frames, starts = make_stream(rng, mcs=7, noise=0.004)
    up = fft_oversample(stream, 2)
    plan = tx.tx_plan(7, 50)
    recs = _run_fixed("local", FrontendConfig(resample=(1, 2)), up, plan)
    assert_all_recovered(recs, frames, starts)
