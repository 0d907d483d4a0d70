"""Misc demo utilities (runtime/misc_demos.py): the reference's scratch
scripts tmp_app.py / upload_image.py rebuilt as library components."""

import time

import numpy as np

from gnuradio_wifi_imagetransfer_tpu.runtime.misc_demos import (
    RandomImageDemo, TcpImageSender, tcp_receive_image,
)


def test_random_image_demo_pushes_frames():
    frames = []
    demo = RandomImageDemo(shape=(20, 20, 3), interval=0.01,
                           on_frame=frames.append).start()
    for _ in range(100):
        if len(frames) >= 3:
            break
        time.sleep(0.02)
    demo.stop()
    assert len(frames) >= 3
    assert frames[0].shape == (20, 20, 3)
    assert not np.array_equal(frames[0], frames[1])


def test_tcp_bw_image_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    sender = TcpImageSender(rgb).start()
    got = tcp_receive_image("127.0.0.1", sender.port)
    sender.join()
    want = np.round(rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_random_image_app_serves_index_and_sse():
    """The tmp_app.py web analogue: '/' serves the index.html landing page
    (reference templates/index.html) and /events streams frame updates."""
    import json
    import urllib.request

    from gnuradio_wifi_imagetransfer_tpu.runtime.misc_demos import RandomImageApp

    app = RandomImageApp(port=0, interval=0.05, shape=(16, 16, 3)).start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{app.port}/", timeout=5).read().decode()
        assert "Random NumPy Array Image" in html and "EventSource" in html
        with urllib.request.urlopen(
                f"http://127.0.0.1:{app.port}/events", timeout=5) as r:
            deadline = time.time() + 5
            payload = None
            while time.time() < deadline:
                line = r.readline().decode()
                if line.startswith("data: "):
                    payload = json.loads(line[6:])
                    break
            assert payload and payload["image"], "no SSE image event"
    finally:
        app.stop()
