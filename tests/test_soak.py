"""Full-scale Mode-2 soak: the reference's actual operating point.

A 300x300 RGB image is 2700 (10,10,1) pieces per lap
(/root/reference/upload_image_udp.py:21,33); the sender re-sends the
shuffled piece list forever, and the receiver's persistent canvas
converges despite loss because every lap re-covers every piece. This
soak injects 8% datagram loss between sender and radio and requires the
canvas to converge to the exact source image (VERDICT r4 item 9).

Gated behind GWT_SOAK=1 (runs minutes at full scale); the committed
record of a real run lives in docs/soak_mode2.md.

Run:  GWT_SOAK=1 python -m pytest tests/test_soak.py -q -s
  or: python tests/test_soak.py          (prints the JSON record)
"""

import json
import os
import socket
import threading
import time

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("GWT_SOAK"),
                       reason="full-scale soak: set GWT_SOAK=1"),
]


class _LossyRelay:
    """UDP forwarder dropping a deterministic fraction of datagrams —
    injected channel loss independent of the PHY's own CRC screen."""

    def __init__(self, dst_port: int, drop: float = 0.08, seed: int = 0):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self.dst = ("127.0.0.1", dst_port)
        self.drop = drop
        self.rng = np.random.default_rng(seed)
        self.dropped = 0
        self.forwarded = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._t.start()
        return self

    def _run(self):
        out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            if self.rng.random() < self.drop:
                self.dropped += 1
                continue
            out.sendto(data, self.dst)
            self.forwarded += 1
        out.close()

    def stop(self):
        self._stop.set()
        self._t.join(timeout=2.0)
        self.sock.close()


def run_soak(timeout_s: float = 900.0) -> dict:
    from PIL import Image

    from gnuradio_wifi_imagetransfer_tpu.config import AppConfig
    from gnuradio_wifi_imagetransfer_tpu.runtime.apps import (
        ReceiverApp,
        SenderApp,
    )
    from gnuradio_wifi_imagetransfer_tpu.runtime.bridge import LoopbackRadio

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    img = np.asarray(Image.open(os.path.join(
        repo, "assets", "kodim07.png")).convert("RGB"))

    recv = ReceiverApp(http_port=0, rx_port=0)
    radio = LoopbackRadio(in_port=0, out_port=recv.rx_port, mcs=3,
                          snr_db=22.0, batch=16)
    relay = _LossyRelay(dst_port=0, drop=0.08)

    # sender -> relay -> radio (reference ports preserved by default; the
    # soak rewires through the lossy hop)
    cfg = AppConfig(tx_port=relay.port, piece_interval_s=0.002)
    send = SenderApp(cfg=cfg, http_port=0)

    recv.start()
    radio.start()
    relay.dst = ("127.0.0.1", radio.in_port)
    relay.start()

    t0 = time.monotonic()
    try:
        send.send_image(img)                 # resizes to 300x300 = 2700 pieces
        expect = np.asarray(Image.fromarray(img).resize((300, 300)),
                            dtype=np.uint8)
        deadline = t0 + timeout_s
        converged_at = None
        while time.monotonic() < deadline:
            if np.array_equal(recv.canvas, expect):
                converged_at = time.monotonic() - t0
                break
            time.sleep(1.0)
        assert converged_at is not None, (
            f"canvas did not converge in {timeout_s}s: "
            f"{int((recv.canvas == expect).all(axis=-1).sum())}/90000 px, "
            f"{recv.pieces_received} pieces, radio {radio.stats}, "
            f"relay dropped {relay.dropped}/{relay.dropped + relay.forwarded}")
        return {
            "image": "kodim07 300x300",
            "pieces_per_lap": 2700,
            "laps_started": send.sender.laps + 1,
            "injected_drop_rate": relay.drop,
            "relay_dropped": relay.dropped,
            "pieces_decoded": recv.pieces_received,
            "pieces_per_s": round(recv.pieces_received / converged_at, 1),
            "frames_crc_fail": radio.stats["frames_crc_fail"],
            "converged_s": round(converged_at, 1),
            "bit_exact": True,
        }
    finally:
        send.stop()
        relay.stop()
        radio.stop()
        recv.stop()


def test_mode2_full_scale_soak():
    rec = run_soak()
    print("\nSOAK " + json.dumps(rec))
    assert rec["bit_exact"] and rec["pieces_decoded"] >= 2700


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_soak(), indent=1))
