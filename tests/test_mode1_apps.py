"""Mode-1 web apps end to end (VERDICT r1 item 7).

FeatureMapSenderApp -> (UDP wire / LoopbackRadio 802.11a PHY) ->
FeatureMapReceiverApp, covering the reference upload_featuremap_udp.py /
download_featuremap_udp.py behaviors: two-image fusion for
TARGET=['3-4','13-10'], decode-every-3rd-piece cadence, /set_user
switching, and the HTTP multipart upload path.
"""

import io
import json
import socket
import time
import urllib.request

import numpy as np
import pytest

from gnuradio_wifi_imagetransfer_tpu.config import AppConfig
from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE
from gnuradio_wifi_imagetransfer_tpu.runtime.apps import (
    FeatureMapReceiverApp,
    FeatureMapSenderApp,
)
from gnuradio_wifi_imagetransfer_tpu.runtime.bridge import LoopbackRadio

IMG_HW = 80              # latent (10, 10, 32) -> 32 pieces of (10, 10, 1)
LATENT = (10, 10, 32)


@pytest.fixture(scope="module")
def jsce():
    return JSCE(img_size=(IMG_HW, IMG_HW), compressed_channel=32)


@pytest.fixture()
def images():
    rng = np.random.default_rng(0)
    return (rng.integers(0, 256, (IMG_HW, IMG_HW, 3), dtype=np.uint8),
            rng.integers(0, 256, (IMG_HW, IMG_HW, 3), dtype=np.uint8))


def _wait(predicate, timeout, interval=0.1):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return predicate()


def test_mode1_apps_direct_wire_and_set_user(jsce, images):
    """Sender fuses two images; the receiver accumulates the latent,
    decodes every 3rd piece, and /set_user switches the reconstruction."""
    img_a, img_b = images
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_port = rx_sock.getsockname()[1]
    rx_sock.close()
    cfg = AppConfig(tx_port=rx_port, piece_interval_s=0.002)
    receiver = FeatureMapReceiverApp(jsce, user_id="3-4", latent_shape=LATENT,
                                     cfg=cfg, rx_port=rx_port).start()
    sender = FeatureMapSenderApp(jsce, cfg=cfg)
    sender.start()
    try:
        sender.send_image(img_a, img_b)
        latent = jsce.img2msg({"3-4": img_a, "13-10": img_b})
        n_pieces = (LATENT[0] // 10) * (LATENT[1] // 10) * LATENT[2]
        assert _wait(lambda: sender.sender is not None
                     and sender.sender.laps >= 1, 30), "sender never lapped"
        assert _wait(lambda: receiver.pieces_received >= n_pieces, 20)
        np.testing.assert_array_equal(receiver.feature_map, latent)

        # decode cadence: publishes happen on every 3rd piece
        assert receiver.pieces_received >= receiver.decode_every
        assert receiver.last_image_b64 is not None
        rec_direct = np.asarray(jsce.msg2img(latent, "3-4"))
        rec_app = np.asarray(jsce.msg2img(receiver.feature_map, receiver.user_id))
        np.testing.assert_array_equal(rec_app, rec_direct)

        # the dedicated Mode-1 page serves the reference's user-id input
        # (featuremap_receiver.html:16)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{receiver.port}/", timeout=5) as r:
            page = r.read().decode()
        assert 'id="uid"' in page and "feature-map receiver" in page

        # /set_user switches the decoded user (featuremap_receiver.html:16)
        req = urllib.request.Request(
            f"http://127.0.0.1:{receiver.port}/set_user?id=13-10", method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
        assert receiver.user_id == "13-10"
        rec_b = np.asarray(jsce.msg2img(receiver.feature_map, receiver.user_id))
        assert not np.array_equal(rec_b, rec_direct)

        # /status works; sender /stop halts the loop
        with urllib.request.urlopen(
                f"http://127.0.0.1:{receiver.port}/status", timeout=5) as r:
            assert json.loads(r.read())["pieces_received"] >= n_pieces
        stop = urllib.request.Request(
            f"http://127.0.0.1:{sender.port}/stop", method="POST")
        with urllib.request.urlopen(stop, timeout=5) as r:
            assert r.read() == b"stopped"
        assert sender.sender is None
    finally:
        sender.stop()
        receiver.stop()


def test_mode1_http_multipart_upload(jsce, images):
    """POST /send_image with two PNG files starts the fused-latent loop."""
    from PIL import Image

    img_a, img_b = images
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    cfg = AppConfig(tx_port=rx_sock.getsockname()[1], piece_interval_s=0.005)
    sender = FeatureMapSenderApp(jsce, cfg=cfg)
    sender.start()
    try:
        boundary = "testboundary42"
        body = io.BytesIO()
        for i, img in enumerate((img_a, img_b)):
            png = io.BytesIO()
            Image.fromarray(img).save(png, format="PNG")
            body.write(f"--{boundary}\r\n".encode())
            body.write(
                f'Content-Disposition: form-data; name="image{i}"; '
                f'filename="im{i}.png"\r\n'
                "Content-Type: image/png\r\n\r\n".encode())
            body.write(png.getvalue())
            body.write(b"\r\n")
        body.write(f"--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{sender.port}/send_image", data=body.getvalue(),
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.read() == b"sending"
        assert sender.sender is not None
        # the dedicated Mode-1 page serves the reference's port input
        # (featuremap_sender.html:104-105) and both TARGET users
        with urllib.request.urlopen(
                f"http://127.0.0.1:{sender.port}/", timeout=5) as r:
            page = r.read().decode()
        assert 'name="port"' in page and "feature-map sender" in page
        assert "3-4" in page and "13-10" in page
        rx_sock.settimeout(10.0)
        data, _ = rx_sock.recvfrom(65536)       # pieces flow on the wire
        assert len(data) > 4
    finally:
        sender.stop()
        rx_sock.close()


def test_mode1_full_reference_topology(jsce, images):
    """Mode 1 over the radio: fused latent pieces -> LoopbackRadio
    (802.11a PHY + channel) -> FeatureMapReceiverApp reconstruction."""
    img_a, img_b = images
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    out_port = rx_sock.getsockname()[1]
    rx_sock.close()
    radio = LoopbackRadio(in_port=0, out_port=out_port, mcs=5,
                          snr_db=26.0, batch=4).start()
    cfg = AppConfig(tx_port=radio.in_port, piece_interval_s=0.01)
    receiver = FeatureMapReceiverApp(jsce, user_id="13-10", latent_shape=LATENT,
                                     cfg=cfg, rx_port=out_port).start()
    sender = FeatureMapSenderApp(jsce, cfg=cfg)
    sender.start()
    try:
        sender.send_image(img_a, img_b)
        latent = jsce.img2msg({"3-4": img_a, "13-10": img_b})
        ok = _wait(lambda: np.array_equal(receiver.feature_map, latent), 150, 0.5)
        assert ok, (f"latent match "
                    f"{np.mean(receiver.feature_map == latent):.2%}, "
                    f"radio stats {radio.stats}")
        rec = np.asarray(jsce.msg2img(latent, "13-10"))
        rec_app = np.asarray(jsce.msg2img(receiver.feature_map, "13-10"))
        np.testing.assert_array_equal(rec_app, rec)
    finally:
        sender.stop()
        radio.stop()
        receiver.stop()
