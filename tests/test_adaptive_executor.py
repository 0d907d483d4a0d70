"""SIGNAL-steered streaming executor tests: interleaved MCS through the
sharded (channel, time)-mesh pipeline.

The reference RX decodes SIGNAL per frame and steers decode_mac with it
(IRS_AP.py:271-272); these tests assert the TPU executor does the same —
a single stream carrying MCS 0 / 3 / 7 frames of different lengths decodes
every frame with its own parameters, including frames straddling shard and
super-block boundaries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
from gnuradio_wifi_imagetransfer_tpu.parallel import AdaptiveStreamExecutor, make_mesh
from gnuradio_wifi_imagetransfer_tpu.phy import tx


def _mixed_stream(n_samples, specs, seed=0, snr_db=30):
    """specs: list of (pos, mcs, payload). Returns a noise-floored stream."""
    rng = np.random.default_rng(seed)
    x = np.zeros(n_samples, np.complex64)
    for i, (pos, mcs, payload) in enumerate(specs):
        b = np.array(tx.transmit(jnp.asarray(payload)[None], mcs,
                                 scrambler_seed=(i % 127) + 1))[0]
        x[pos : pos + b.size] += 0.5 * b
    noise = 0.5 * 10 ** (-snr_db / 20) / np.sqrt(2)
    x = x + noise * (rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples))
    return x.astype(np.complex64)


def _specs(seed=7):
    """Interleaved MCS 0 / 3 / 7 frames with two distinct lengths."""
    rng = np.random.default_rng(seed)
    return [
        (600, 0, rng.integers(0, 256, 50, dtype=np.uint8)),
        (4000, 3, rng.integers(0, 256, 120, dtype=np.uint8)),
        (7000, 7, rng.integers(0, 256, 50, dtype=np.uint8)),
        (10500, 3, rng.integers(0, 256, 50, dtype=np.uint8)),
    ]


def _check(records, specs, channel=0):
    ok = [r for r in records if r.channel == channel and r.parity_ok]
    assert len(ok) >= len(specs), f"got {len(ok)} frames, want {len(specs)}"
    by_payload = {tuple(r.psdu): r for r in ok}
    for pos, mcs, payload in specs:
        assert tuple(payload) in by_payload, f"frame at {pos} (mcs {mcs}) missing"
        r = by_payload[tuple(payload)]
        assert r.rate_idx == mcs
        assert r.length == len(payload)
        assert abs(r.global_start - pos) <= 160, (r.global_start, pos)


def test_adaptive_local_mixed_mcs():
    cfg = ExecutorConfig(block_size=4096, time_shards=4, max_frames_per_block=4)
    specs = _specs()
    x = _mixed_stream(4 * 4096, specs)
    ex = AdaptiveStreamExecutor(mesh=None, exec_cfg=cfg)
    _check(ex.run(x), specs)


def test_adaptive_mesh_mixed_mcs_with_shard_straddle():
    """VERDICT item 2's done condition: interleaved MCS 0/3/7 through the
    sharded executor, one frame straddling a shard boundary."""
    mesh = make_mesh(channels=1, time_shards=8)
    cfg = ExecutorConfig(block_size=2048, time_shards=8, max_frames_per_block=4)
    rng = np.random.default_rng(3)
    specs = [
        # MCS0 burst is 1841 samples: edge 400 before the shard-1 boundary
        (2048 - 400, 0, rng.integers(0, 256, 50, dtype=np.uint8)),
        (3 * 2048 + 500, 3, rng.integers(0, 256, 120, dtype=np.uint8)),
        # straddles the shard-6 boundary
        (6 * 2048 - 200, 7, rng.integers(0, 256, 80, dtype=np.uint8)),
    ]
    x = _mixed_stream(8 * 2048, specs, seed=5)
    ex = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg)
    records = ex.run(x)
    assert len([r for r in records if r.parity_ok]) == len(specs)
    _check(records, specs)


def test_adaptive_mesh_matches_local_multichannel():
    mesh = make_mesh(channels=2, time_shards=4)
    cfg = ExecutorConfig(block_size=4096, time_shards=4,
                         max_frames_per_block=4, channels=2)
    rng = np.random.default_rng(11)
    specs_a = _specs(seed=7)
    specs_b = [
        (1500, 7, rng.integers(0, 256, 200, dtype=np.uint8)),
        (9000, 0, rng.integers(0, 256, 50, dtype=np.uint8)),
    ]
    xa = _mixed_stream(4 * 4096, specs_a, seed=1)
    xb = _mixed_stream(4 * 4096, specs_b, seed=2)
    stream = np.stack([xa, xb])

    rec_mesh = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg).run(stream)
    _check(rec_mesh, specs_a, channel=0)
    _check(rec_mesh, specs_b, channel=1)

    rec_local = AdaptiveStreamExecutor(mesh=None, exec_cfg=cfg).run(stream)
    got_mesh = {(r.channel, r.global_start, r.rate_idx, tuple(r.psdu))
                for r in rec_mesh if r.parity_ok}
    got_local = {(r.channel, r.global_start, r.rate_idx, tuple(r.psdu))
                 for r in rec_local if r.parity_ok}
    assert got_mesh == got_local


def test_adaptive_superblock_boundary():
    """Frames near/straddling SUPER-block seams decode exactly once: stage B
    cuts windows from the host-resident stream, so only edge detection needs
    the overlap re-scan."""
    cfg = ExecutorConfig(block_size=2048, time_shards=2, max_frames_per_block=4)
    span = 2 * 2048
    rng = np.random.default_rng(9)
    specs = [
        (span - 700, 3, rng.integers(0, 256, 60, dtype=np.uint8)),   # straddle
        (2 * span + 300, 7, rng.integers(0, 256, 60, dtype=np.uint8)),
    ]
    x = _mixed_stream(3 * span, specs, seed=4)
    for mesh in (None, make_mesh(channels=1, time_shards=2)):
        ex = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg)
        records = [r for r in ex.run(x) if r.parity_ok]
        assert len(records) == len(specs), f"mesh={mesh}"
        _check(records, specs)


def test_adaptive_frame_at_stream_end_unpadded():
    """A frame whose burst ends AT the last sample of the stream (no tail
    padding) still decodes: stage A zero-fills its SIGNAL window past the
    stream edge and stage B cuts from the host stream, so neither depends
    on the ring halo's wrapped context."""
    cfg = ExecutorConfig(block_size=2048, time_shards=4, max_frames_per_block=4)
    rng = np.random.default_rng(21)
    payload = rng.integers(0, 256, 60, dtype=np.uint8)
    mcs = 3
    burst = np.array(tx.transmit(jnp.asarray(payload)[None], mcs))[0]
    n = 4 * 2048
    pos = n - burst.size                     # flush against the stream end
    specs = [(pos, mcs, payload)]
    x = np.zeros(n, np.complex64)
    x[pos:] += 0.5 * burst
    x += (0.005 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    for mesh in (None, make_mesh(channels=1, time_shards=4)):
        ex = AdaptiveStreamExecutor(mesh=mesh, exec_cfg=cfg)
        records = [r for r in ex.run(x) if r.parity_ok]
        assert len(records) == 1, f"mesh={mesh}: {len(records)} records"
        _check(records, specs)


def test_capture_symbols_constellation():
    """capture_symbols returns per-frame equalized symbols that cluster on
    the constellation (the frame_equalizer 'symbols' port analogue)."""
    from gnuradio_wifi_imagetransfer_tpu.phy import params

    rng = np.random.default_rng(3)
    payload = rng.integers(0, 256, 50, dtype=np.uint8)
    x = _mixed_stream(1 << 14, [(600, 2, payload)], snr_db=28)
    ex = AdaptiveStreamExecutor(mesh=None, exec_cfg=ExecutorConfig(
        block_size=1 << 13, time_shards=2, max_frames_per_block=4),
        capture_symbols=True)
    recs = [r for r in ex.run(x[None]) if r.parity_ok]
    assert len(recs) == 1
    sym = recs[0].eq_symbols
    plan = tx.tx_plan(2, 50)
    assert sym is not None and sym.shape == (plan.n_sym, 48)
    # QPSK 3/4 = MCS2 -> QPSK points; max distance to nearest point small
    pts = np.asarray(params.constellation(int(params.MCS_N_BPSC[2])))
    d = np.min(np.abs(sym[..., None] - pts), axis=-1)
    assert float(np.percentile(d, 95)) < 0.25
    # default executor leaves eq_symbols unset
    ex2 = AdaptiveStreamExecutor(mesh=None, exec_cfg=ExecutorConfig(
        block_size=1 << 13, time_shards=2, max_frames_per_block=4))
    recs2 = [r for r in ex2.run(x[None]) if r.parity_ok]
    assert recs2 and recs2[0].eq_symbols is None


def test_adaptive_sc8_wire_format():
    """SIGNAL steering + stage-B payload decode over the int8 wire."""
    rng = np.random.default_rng(5)
    n = 1 << 16
    x = np.zeros(n, np.complex64)
    specs = [(700, 2, rng.integers(0, 256, 50, dtype=np.uint8)),
             (34000, 7, rng.integers(0, 256, 120, dtype=np.uint8))]
    for i, (pos, mcs, payload) in enumerate(specs):
        b = np.asarray(tx.transmit(jnp.asarray(payload)[None], mcs,
                                   scrambler_seed=i + 1))[0]
        x[pos : pos + b.size] += 0.5 * b
    x += 0.004 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                  ).astype(np.complex64)
    ex = AdaptiveStreamExecutor(exec_cfg=ExecutorConfig(
        block_size=1 << 14, time_shards=4, max_frames_per_block=4,
        wire_format="sc8"))
    got = {(r.rate_idx, tuple(r.psdu)) for r in ex.run(x[None]) if r.parity_ok}
    for pos, mcs, payload in specs:
        assert (mcs, tuple(payload)) in got
