"""Streaming executor tests: local and (channel, time)-mesh sharded modes.

The mesh tests run on the 8 virtual CPU devices forced in conftest.py —
the same topology the multi-chip dry-run uses (SURVEY.md §2.5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
from gnuradio_wifi_imagetransfer_tpu.parallel import StreamExecutor, make_mesh
from gnuradio_wifi_imagetransfer_tpu.phy import sync, tx

MCS = 2
L = 50


def _stream_with_frames(n_samples, frame_positions, frames, seed=0, snr_db=25):
    """Place TX bursts at given positions in a noise-floored stream."""
    rng = np.random.default_rng(seed)
    bursts = np.array(tx.transmit(jnp.asarray(frames), MCS,
                                  scrambler_seed=jnp.asarray(np.arange(len(frames)) % 127 + 1)))
    x = np.zeros(n_samples, np.complex64)
    for pos, b in zip(frame_positions, bursts):
        x[pos : pos + b.size] += 0.5 * b
    noise = 0.5 * 10 ** (-snr_db / 20) / np.sqrt(2)
    x = x + noise * (rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples))
    return x.astype(np.complex64)


@pytest.fixture(scope="module")
def payloads():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (6, L), dtype=np.uint8)


def _check(records, frames, positions, channel=0):
    by_payload = {tuple(r.psdu): r for r in records
                  if r.channel == channel and r.parity_ok}
    for f, pos in zip(frames, positions):
        assert tuple(f) in by_payload, f"frame at {pos} missing"
        r = by_payload[tuple(f)]
        assert abs(r.global_start - pos) <= 160, (r.global_start, pos)


def test_local_executor_single_channel(payloads):
    cfg = ExecutorConfig(block_size=4096, time_shards=4, max_frames_per_block=4)
    positions = [500, 5000, 9000, 13000]
    x = _stream_with_frames(4 * 4096, positions, payloads[:4])
    ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=None, exec_cfg=cfg)
    records = ex.run(x)
    _check(records, payloads[:4], positions)


def test_local_executor_block_straddle(payloads):
    """A frame whose burst crosses a block boundary decodes exactly once."""
    cfg = ExecutorConfig(block_size=4096, time_shards=4, max_frames_per_block=4)
    # burst is ~1841 samples; put the edge 300 samples before a boundary
    positions = [4096 - 300, 2 * 4096 - 600]
    x = _stream_with_frames(4 * 4096, positions, payloads[:2])
    ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=None, exec_cfg=cfg)
    records = [r for r in ex.run(x) if r.parity_ok]
    assert len(records) == 2
    _check(records, payloads[:2], positions)


def test_local_executor_multichannel(payloads):
    cfg = ExecutorConfig(block_size=4096, time_shards=2, max_frames_per_block=4)
    pos_a, pos_b = [700, 4800], [2000, 6400]
    xa = _stream_with_frames(2 * 4096, pos_a, payloads[:2], seed=1)
    xb = _stream_with_frames(2 * 4096, pos_b, payloads[2:4], seed=2)
    ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=None, exec_cfg=cfg)
    records = ex.run(np.stack([xa, xb]))
    _check(records, payloads[:2], pos_a, channel=0)
    _check(records, payloads[2:4], pos_b, channel=1)


@pytest.mark.parametrize("channels,time_shards", [(1, 8), (2, 4), (4, 2)])
def test_mesh_executor_matches_local(payloads, channels, time_shards):
    mesh = make_mesh(channels=channels, time_shards=time_shards)
    cfg = ExecutorConfig(block_size=4096, time_shards=time_shards,
                         max_frames_per_block=4, channels=channels)
    n = time_shards * 4096
    streams, all_pos, all_frames = [], [], []
    for ci in range(channels):
        k = 2
        frames = payloads[(2 * ci) % 6 : (2 * ci) % 6 + k]
        positions = [600 + 900 * ci, n // 2 + 350 * ci]
        streams.append(_stream_with_frames(n, positions, frames, seed=10 + ci))
        all_pos.append(positions)
        all_frames.append(frames)
    stream = np.stack(streams)

    ex_mesh = StreamExecutor(tx.tx_plan(MCS, L), mesh=mesh, exec_cfg=cfg)
    rec_mesh = ex_mesh.run(stream)
    for ci in range(channels):
        _check(rec_mesh, all_frames[ci], all_pos[ci], channel=ci)

    ex_local = StreamExecutor(tx.tx_plan(MCS, L), mesh=None, exec_cfg=cfg)
    rec_local = ex_local.run(stream)
    got_mesh = {(r.channel, r.global_start, tuple(r.psdu))
                for r in rec_mesh if r.parity_ok}
    got_local = {(r.channel, r.global_start, tuple(r.psdu))
                 for r in rec_local if r.parity_ok}
    assert got_mesh == got_local


def test_mesh_executor_straddles_shard_boundary(payloads):
    """Frames crossing time-shard boundaries ride the ppermute halo."""
    mesh = make_mesh(channels=1, time_shards=8)
    cfg = ExecutorConfig(block_size=2048, time_shards=8, max_frames_per_block=4)
    n = 8 * 2048
    positions = [2048 - 400, 3 * 2048 - 900, 6 * 2048 - 1200]
    x = _stream_with_frames(n, positions, payloads[:3], seed=5)
    ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=mesh, exec_cfg=cfg)
    records = [r for r in ex.run(x) if r.parity_ok]
    assert len(records) == 3
    _check(records, payloads[:3], positions)


def test_mesh_executor_frame_at_stream_end_unpadded(payloads):
    """Fixed-plan mesh mode: a frame whose burst ends AT the last sample of
    a hard-truncated stream (what a real SDR capture produces — no
    pad_burst tail) decodes bit-exact. The last time shard's right halo is
    an OPEN-chain ppermute edge, so it receives zeros — the true content
    past the stream end — rather than ring-wrapped samples (VERDICT r2
    item 5; GNU Radio's end-of-stream flush semantics, implicit in
    gr.top_block.wait(), /root/reference/gnu_radio/IRS_user.py:285-294)."""
    burst = np.array(tx.transmit(jnp.asarray(payloads[:1]), MCS,
                                 scrambler_seed=jnp.asarray([1])))[0]
    n = 4 * 2048
    pos = n - burst.size                     # flush against the stream end
    x = np.zeros(n, np.complex64)
    x[pos:] += 0.5 * burst
    rng = np.random.default_rng(11)
    x += (0.005 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    cfg = ExecutorConfig(block_size=2048, time_shards=4, max_frames_per_block=4)
    for mesh in (make_mesh(channels=1, time_shards=4),
                 make_mesh(channels=1, time_shards=1)):
        cfg_t = ExecutorConfig(block_size=2048,
                               time_shards=mesh.shape["time"],
                               max_frames_per_block=4)
        ex = StreamExecutor(tx.tx_plan(MCS, L), mesh=mesh, exec_cfg=cfg_t)
        records = [r for r in ex.run(x) if r.parity_ok]
        assert len(records) == 1, f"mesh={mesh.shape}: {len(records)} records"
        _check(records, payloads[:1], [pos])


def test_mesh_executor_rejects_degenerate_block_size():
    """A mesh span <= halo_right + HALO_LEFT leaves no trusted stride
    interval (every frame masked untrusted at O(n) strides — ADVICE r3);
    the constructor must refuse rather than silently lose every frame."""
    from gnuradio_wifi_imagetransfer_tpu.parallel.executor import HALO_LEFT

    plan = tx.tx_plan(MCS, L)
    mesh = make_mesh(channels=1, time_shards=1)
    too_small = sync.window_len(plan.n_sym) + HALO_LEFT  # span == halo total
    with pytest.raises(ValueError, match="trusted"):
        StreamExecutor(plan, mesh=mesh, exec_cfg=ExecutorConfig(
            block_size=too_small, time_shards=1, channels=1))


def test_sc8_wire_format_bit_exact(payloads):
    """int8 I/Q wire (the HackRF's native ADC format): quantization noise
    sits ~44 dB under the burst amplitude, so decode stays bit-exact at
    operating SNR with a quarter of the ingest bytes."""
    n = 1 << 16
    positions = [500, 30000]
    frames = payloads[:2]
    x = _stream_with_frames(n, positions, frames)
    plan = tx.tx_plan(MCS, L)
    ex = StreamExecutor(plan, exec_cfg=ExecutorConfig(
        block_size=1 << 14, time_shards=4, max_frames_per_block=4,
        wire_format="sc8"))
    _check(ex.run(x[None]), frames, positions)


def test_unknown_wire_format_raises(payloads):
    """A typo'd wire_format must fail loudly, not silently ship f32."""
    from gnuradio_wifi_imagetransfer_tpu.utils.xfer import quantize_wire

    with pytest.raises(ValueError, match="wire_format"):
        quantize_wire(np.zeros((4, 2), np.float32), "sc-8")
