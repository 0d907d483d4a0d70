"""Runtime-layer tests: socket demo, loopback radio, web apps, and the
full reference topology (sender app -> radio -> receiver app) end to end.
"""

import json
import socket
import time
import urllib.request

import numpy as np
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import AppConfig
from gnuradio_wifi_imagetransfer_tpu.runtime import socket_demo
from gnuradio_wifi_imagetransfer_tpu.runtime.apps import ReceiverApp, SenderApp
from gnuradio_wifi_imagetransfer_tpu.runtime.bridge import LoopbackRadio
from gnuradio_wifi_imagetransfer_tpu.utils import image as imgutil


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_socket_demo_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    server = socket_demo.PieceServer(img).start()
    got = socket_demo.receive_image("127.0.0.1", server.port)
    server.join()
    assert np.array_equal(got, img)


def test_loopback_radio_end_to_end():
    """Pieces -> UDP 'app->radio' port -> MAC+PHY+channel+RX on device ->
    UDP 'radio->app' port -> rebuilt image. The IRS_tranceiver workflow."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    pieces = imgutil.detach_image(img, rng=rng)       # 12 pieces

    out_port = _free_port()
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", out_port))
    rx.settimeout(30.0)

    radio = LoopbackRadio(in_port=0, out_port=out_port, mcs=3,
                          snr_db=25.0, epsilon=5e-6, batch=4).start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for p in pieces:
            tx.sendto(imgutil.encode_piece(p), ("127.0.0.1", radio.in_port))
            time.sleep(0.01)
        canvas = np.zeros_like(img)
        seen = set()
        deadline = time.time() + 120
        while len(seen) < len(pieces) and time.time() < deadline:
            try:
                data, _ = rx.recvfrom(65536)
            except socket.timeout:
                break
            # the radio already stripped the 4-byte prefix; datagram is a
            # bare pickled piece
            import pickle
            piece = pickle.loads(data)
            imgutil.redraw_image(piece, canvas)
            seen.add(piece[0])
        assert len(seen) == len(pieces), f"only {len(seen)}/{len(pieces)} pieces"
        assert np.array_equal(canvas, img)
        assert radio.stats["frames_ok"] >= len(pieces)
    finally:
        radio.stop()
        rx.close()


def test_apps_direct_wire():
    """SenderApp -> (UDP, no radio) -> ReceiverApp: canvas converges and
    the HTTP endpoints respond."""
    rx_port = _free_port()
    cfg = AppConfig(tx_port=rx_port, image_size=(20, 20),
                    piece_interval_s=0.002)
    receiver = ReceiverApp(cfg=cfg, rx_port=rx_port).start()
    sender = SenderApp(cfg=cfg)
    sender.start()
    try:
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        sender.send_image(img)
        deadline = time.time() + 20
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{receiver.port}/status", timeout=5) as r:
                n = json.loads(r.read())["pieces_received"]
            if n >= 12:
                break
            time.sleep(0.1)
        assert n >= 12
        assert np.array_equal(receiver.canvas, img)
        # root pages render from the packaged templates/ files
        with urllib.request.urlopen(f"http://127.0.0.1:{sender.port}/", timeout=5) as r:
            assert b"send_image" in r.read()
        with urllib.request.urlopen(f"http://127.0.0.1:{receiver.port}/", timeout=5) as r:
            assert b"/static/receiver.js" in r.read()
        # static assets served from the packaged static/ dir
        with urllib.request.urlopen(
                f"http://127.0.0.1:{receiver.port}/static/receiver.js", timeout=5) as r:
            assert b"EventSource" in r.read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{sender.port}/static/style.css", timeout=5) as r:
            assert b"font-family" in r.read()
        assert receiver.last_image_b64          # SSE payload was produced
    finally:
        sender.stop()
        receiver.stop()


@pytest.mark.slow
def test_full_reference_topology():
    """browser-less Mode 2: SenderApp -> UDP -> LoopbackRadio (802.11a over
    simulated channel) -> UDP -> ReceiverApp, progressive convergence."""
    out_port = _free_port()
    cfg = AppConfig(tx_port=0, image_size=(20, 20), piece_interval_s=0.01)
    radio = LoopbackRadio(in_port=0, out_port=out_port, mcs=2,
                          snr_db=24.0, batch=4).start()
    cfg = AppConfig(tx_port=radio.in_port, image_size=(20, 20),
                    piece_interval_s=0.01)
    receiver = ReceiverApp(cfg=cfg, rx_port=out_port).start()
    sender = SenderApp(cfg=cfg)
    sender.start()
    try:
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        sender.send_image(img)
        deadline = time.time() + 150
        while time.time() < deadline:
            if np.array_equal(receiver.canvas, img):
                break
            time.sleep(0.5)
        assert np.array_equal(receiver.canvas, img), (
            f"canvas match {np.mean(receiver.canvas == img):.2%}, "
            f"radio stats {radio.stats}")
    finally:
        sender.stop()
        radio.stop()
        receiver.stop()


def test_split_radio_topology():
    """The reference's two-node deployment: TxRadio (IRS_user: payloads ->
    802.11a TX -> sc16 sample datagrams) and RxRadio (IRS_AP: sample
    datagrams -> SIGNAL-steered streaming RX -> Extract-Pics UDP), with
    UDP standing in for RF."""
    from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
    from gnuradio_wifi_imagetransfer_tpu.runtime.bridge import RxRadio, TxRadio

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    pieces = imgutil.detach_image(img, rng=rng)           # 12 pieces

    out_port = _free_port()
    app_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    app_rx.bind(("127.0.0.1", out_port))
    app_rx.settimeout(30.0)

    rx_cfg = ExecutorConfig(block_size=1 << 14, time_shards=4,
                            max_frames_per_block=8)
    rxr = RxRadio(samp_port=0, out_port=out_port, chunk=1 << 15,
                  exec_cfg=rx_cfg).start()
    txr = TxRadio(in_port=0, samp_port=rxr.samp_port, mcs=3, batch=4).start()
    try:
        tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for p in pieces:
            tx_sock.sendto(imgutil.encode_piece(p), ("127.0.0.1", txr.in_port))
            time.sleep(0.02)
        import pickle
        canvas = np.zeros_like(img)
        seen = set()
        deadline = time.time() + 120
        while len(seen) < len(pieces) and time.time() < deadline:
            try:
                data, _ = app_rx.recvfrom(65536)
            except socket.timeout:
                break
            piece = pickle.loads(data)
            imgutil.redraw_image(piece, canvas)
            seen.add(piece[0])
        assert len(seen) == len(pieces), (
            f"only {len(seen)}/{len(pieces)} pieces; "
            f"tx {txr.stats}, rx {rxr.stats}")
        assert np.array_equal(canvas, img)
        assert rxr.stats["frames_ok"] >= len(pieces)
        # GUI-sink analogues populated: constellation points from the
        # equalized symbols, a live PSD, and a finite M2M4 SNR estimate
        pts = rxr.constellation.points(100)
        assert pts.shape[0] == 100
        assert float(np.max(np.abs(pts))) > 0.3        # near unit circle
        assert float(np.max(rxr.spectrum.psd_db())) > -150
        assert np.isfinite(rxr.snr_probe.snr_db())
    finally:
        txr.stop()
        rxr.stop()
        app_rx.close()


def test_loopback_live_retune_and_probes():
    """Mid-stream reconfiguration (VERDICT r4 item 5): retune MCS + SNR +
    epsilon + equalizer while the radio runs; frames decode at BOTH
    rates, and the probe endpoints' data sources fill (item 6)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    pieces = imgutil.detach_image(img, rng=rng)       # 12 pieces

    out_port = _free_port()
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", out_port))
    rx.settimeout(30.0)
    radio = LoopbackRadio(in_port=0, out_port=out_port, mcs=2,
                          snr_db=25.0, batch=4, probes=True).start()
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send_and_collect(group, want):
        for p in group:
            tx.sendto(imgutil.encode_piece(p), ("127.0.0.1", radio.in_port))
            time.sleep(0.01)
        got = set()
        deadline = time.time() + 120
        while len(got) < want and time.time() < deadline:
            try:
                data, _ = rx.recvfrom(65536)
            except socket.timeout:
                break
            import pickle

            got.add(pickle.loads(data)[0])
        return got

    try:
        first = send_and_collect(pieces[:6], 6)
        assert len(first) == 6, f"pre-retune: {len(first)}/6"
        # live retune: MCS 2 -> 5, SNR up, small CFO, STA equalizer
        radio.set_encoding(5)
        radio.set_snr(30.0)
        radio.set_epsilon(2e-6)
        radio.set_chan_est(3)
        second = send_and_collect(pieces[6:], 6)
        assert len(second) == 6, f"post-retune: {len(second)}/6"
        assert radio.mcs == 5 and radio.snr_db == 30.0
        # probes filled (constellation + spectrum + SNR estimate)
        assert radio.constellation.points().shape[0] > 0
        assert radio.spectrum.psd_db().max() > -200.0
        assert np.isfinite(radio.snr_probe.snr_db())
    finally:
        radio.stop()
        rx.close()
        tx.close()


def test_receiver_app_rf_endpoints():
    """Constellation/spectrum/radio-control routes on the receiver app
    (VERDICT r4 item 6): data served as JSON, POST /radio retunes the
    attached radio, and the RF panel appears in the page."""
    radio = LoopbackRadio(in_port=0, out_port=_free_port(), mcs=2,
                          probes=True)
    # seed the probes without running the device loop
    radio.constellation.push(np.array([1 + 1j, -1 - 1j], np.complex64))
    radio.spectrum.update(np.exp(2j * np.pi * 0.1 * np.arange(2048)))
    radio.snr_probe.update(np.array([1.0 + 0.01j, -1.0 + 0.02j] * 64))
    app = ReceiverApp(http_port=0, rx_port=0, radio=radio).start()
    try:
        base = f"http://127.0.0.1:{app.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        assert 'id="const"' in page          # RF panel template hook
        c = json.loads(urllib.request.urlopen(
            base + "/constellation", timeout=10).read())
        assert len(c["points"]) == 2 and c["snr_db"] is not None
        s = json.loads(urllib.request.urlopen(
            base + "/spectrum", timeout=10).read())
        assert s["nfft"] == len(s["psd_db"]) > 0
        assert max(s["psd_db"]) > -200.0
        req = urllib.request.Request(
            base + "/radio?mcs=4&snr=28&epsilon=1e-6&chan_est=1",
            method="POST")
        resp = json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert resp["mcs"] == 4 and radio.mcs == 4
        assert radio.snr_db == 28.0 and radio.epsilon == 1e-6
        assert int(radio.chan_est) == 1
    finally:
        app.stop()
        radio.source.stop()
        radio.sink.close()


def test_app_stop_without_start_returns():
    """stop() on an app whose HTTP server was never started must return,
    not deadlock: socketserver.shutdown() waits on an event that only
    serve_forever() sets. The Mode-2 soak drives SenderApp through
    send_image() without the HTTP front end and hung forever in cleanup
    before this guard existed."""
    import threading

    from gnuradio_wifi_imagetransfer_tpu.runtime.apps import (
        ReceiverApp, SenderApp)

    send = SenderApp(http_port=0)
    recv = ReceiverApp(http_port=0, rx_port=0)

    done = threading.Event()

    def _stop_both():
        send.stop()
        recv.stop()
        done.set()

    t = threading.Thread(target=_stop_both, daemon=True)
    t.start()
    assert done.wait(timeout=10.0), "stop() deadlocked on a never-started app"


def test_post_routes_match_exact_path():
    """POST route matching uses the PARSED path, exactly: /radioactive
    must not retune the attached radio (it used to — the handler matched
    with startswith on the raw request line)."""
    import urllib.error
    import urllib.request

    from gnuradio_wifi_imagetransfer_tpu.runtime.apps import ReceiverApp

    radio = LoopbackRadio(in_port=0, out_port=_free_port(), mcs=2)
    app = ReceiverApp(http_port=0, rx_port=0, radio=radio)
    app.start()
    try:
        base = f"http://127.0.0.1:{app.port}"
        for path in ("/radioactive?mcs=7", "/radio/extra?mcs=7"):
            req = urllib.request.Request(base + path, method="POST")
            try:
                resp = urllib.request.urlopen(req, timeout=10)
                status = resp.status
            except urllib.error.HTTPError as e:
                status = e.code
            assert status == 404, (path, status)
            assert radio.mcs == 2, f"{path} retuned the radio"
    finally:
        app.stop()
        radio.source.stop()
        radio.sink.close()
