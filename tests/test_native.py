"""Native C++ host runtime (native/gwt_native.cpp via runtime/native.py).

Covers the GNU-Radio-analogue host components: CRC-32/MAC framing parity
vs the pure-Python path, the SPSC sample ring buffer (including a
cross-thread producer/consumer run), the UDP PDU bridge, and burst
scatter. All tests skip when the g++ toolchain is unavailable."""

import threading
import zlib

import numpy as np
import pytest

from gnuradio_wifi_imagetransfer_tpu.phy import mac
from gnuradio_wifi_imagetransfer_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_crc32_matches_zlib():
    rng = np.random.default_rng(0)
    for n in (1, 7, 24, 500, 4096):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)


def test_frame_batch_matches_python():
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 256, (16, 50), dtype=np.uint8)
    got = native.frame_batch(payloads, 4093, mac.DEFAULT_SRC,
                             mac.DEFAULT_DST, mac.DEFAULT_BSS)
    # reconstruct with the stateful Python framer (tests seq wraparound too)
    m = mac.Mac()
    m.seq_no = 4093
    want = np.stack([
        np.frombuffer(m.frame(payloads[i].tobytes()), dtype=np.uint8)
        for i in range(16)
    ])
    np.testing.assert_array_equal(got, want)


def test_check_fcs_batch():
    rng = np.random.default_rng(2)
    payloads = rng.integers(0, 256, (8, 30), dtype=np.uint8)
    mpdus = native.frame_batch(payloads, 0, mac.DEFAULT_SRC,
                               mac.DEFAULT_DST, mac.DEFAULT_BSS)
    ok = native.check_fcs_batch(mpdus)
    assert ok.all()
    bad = mpdus.copy()
    bad[3, 10] ^= 0xFF
    ok2 = native.check_fcs_batch(bad)
    assert not ok2[3] and ok2[[0, 1, 2, 4, 5, 6, 7]].all()


def test_ring_roundtrip():
    ring = native.RingBuffer(1024)
    assert ring.capacity == 1024
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(700) + 1j * rng.standard_normal(700)).astype(
        np.complex64)
    assert ring.write(x) == 700
    assert ring.available() == 700
    got = ring.read(700)
    np.testing.assert_array_equal(got, x)
    # wraparound
    y = x[:600]
    assert ring.write(y) == 600
    np.testing.assert_array_equal(ring.read(600), y)
    ring.close()


def test_ring_backpressure():
    ring = native.RingBuffer(256)
    x = np.ones(300, dtype=np.complex64)
    assert ring.write(x) == 256          # partial write when full
    assert ring.space() == 0
    ring.read(100)
    assert ring.write(x) == 100
    ring.close()


def test_ring_cross_thread_stream():
    ring = native.RingBuffer(1 << 12)
    total = 50_000
    rng = np.random.default_rng(4)
    data = (rng.standard_normal(total) + 1j * rng.standard_normal(
        total)).astype(np.complex64)
    out = np.empty(total, dtype=np.complex64)

    def produce():
        sent = 0
        while sent < total:
            sent += ring.write(data[sent:sent + 1024])

    t = threading.Thread(target=produce)
    t.start()
    got = 0
    while got < total:
        chunk = ring.read(min(777, total - got))
        out[got:got + chunk.size] = chunk
        got += chunk.size
    t.join()
    np.testing.assert_array_equal(out, data)
    ring.close()


def test_udp_bridge_roundtrip():
    src = native.NativeUdpSource(host="127.0.0.1", port=0).start()
    sink = native.NativeUdpSink("127.0.0.1", src.port)
    msgs = [bytes([i]) * (10 + i) for i in range(5)]
    for msg in msgs:
        sink.send(msg)
    got: list[bytes] = []
    for _ in range(50):
        got.extend(src.drain(8, timeout=0.1))
        if len(got) >= len(msgs):
            break
    assert sorted(got) == sorted(msgs)
    src.stop()
    sink.close()


def test_scatter_bursts():
    rng = np.random.default_rng(5)
    bursts = (rng.standard_normal((3, 40)) + 1j * rng.standard_normal(
        (3, 40))).astype(np.complex64)
    pos = np.array([10, 100, 480], dtype=np.int64)
    out = native.scatter_bursts(bursts, pos, 500, scale=0.5)
    want = np.zeros(500, np.complex64)
    for i, p in enumerate(pos):
        seg = bursts[i][: max(0, min(40, 500 - p))]
        want[p:p + seg.size] += np.complex64(0.5) * seg
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_mac_frame_batch_uses_native_and_parses():
    payloads = np.arange(100, dtype=np.uint8).reshape(2, 50)
    mpdus = mac.frame_batch(payloads, seq0=7)
    f = mac.parse(mpdus[1].tobytes())
    assert f.fcs_ok and f.seq_no == 8
    assert f.payload == payloads[1].tobytes()
