"""MAC framing + image patchization tests, and the Mode-2 end-to-end path:
image piece -> pickle+prefix -> MAC -> PHY -> sync/decode -> unframe ->
rebuild (BASELINE config[1] skeleton)."""

import zlib

import pytest

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import mac, rx, sync, tx
from gnuradio_wifi_imagetransfer_tpu.utils import image as img


def test_mac_frame_roundtrip():
    m = mac.Mac()
    payload = b"hello 802.11a world"
    mpdu = m.frame(payload)
    assert len(mpdu) == 24 + len(payload) + 4
    f = mac.parse(mpdu)
    assert f.fcs_ok
    assert f.payload == payload
    assert f.frame_control == 0x0008 and f.duration == 0x002E
    assert f.addr1 == mac.DEFAULT_DST and f.addr2 == mac.DEFAULT_SRC
    assert f.seq_no == 0
    assert mac.parse(m.frame(payload)).seq_no == 1


def test_mac_fcs_detects_corruption():
    mpdu = bytearray(mac.Mac().frame(b"payload bytes"))
    mpdu[30] ^= 0x40
    assert not mac.parse(bytes(mpdu)).fcs_ok


def test_frame_batch_matches_scalar():
    rng = np.random.default_rng(0)
    payloads = rng.integers(0, 256, (5, 20), dtype=np.uint8)
    batch = mac.frame_batch(payloads, seq0=7)
    m = mac.Mac()
    m.seq_no = 7
    for i in range(5):
        assert bytes(batch[i]) == m.frame(payloads[i].tobytes())


def test_crc32_jax_matches_zlib():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (4, 60), dtype=np.uint8)
    got = np.array(mac.crc32_jax(jnp.asarray(data)))
    for i in range(4):
        assert got[i] == (zlib.crc32(data[i].tobytes()) & 0xFFFFFFFF)


def test_check_fcs_batch_on_device():
    rng = np.random.default_rng(2)
    payloads = rng.integers(0, 256, (6, 30), dtype=np.uint8)
    mpdus = mac.frame_batch(payloads)
    mpdus_bad = mpdus.copy()
    mpdus_bad[2, 10] ^= 1
    ok = np.array(mac.check_fcs_batch(jnp.asarray(mpdus_bad)))
    assert list(ok) == [True, True, False, True, True, True]


def test_detach_rebuild_roundtrip_uint8():
    rng = np.random.default_rng(3)
    im = rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
    pieces = img.detach_image(im, rng=rng)
    assert len(pieces) == 30 * 30 * 3  # 2700 pieces (BASELINE.md Mode-2 row)
    assert pieces[0][1].shape == (10, 10, 1)
    out = img.rebuild_image(pieces, im.shape)
    assert np.array_equal(out, im)


def test_detach_rebuild_float_feature_map():
    rng = np.random.default_rng(4)
    fm = rng.standard_normal((30, 30, 128)).astype(np.float32)
    pieces = img.detach_image(fm, rng=rng)
    assert len(pieces) == 3 * 3 * 128  # 1152 pieces (BASELINE.md Mode-1 row)
    out = img.rebuild_image(pieces, fm.shape)
    assert np.array_equal(out, fm)


def test_redraw_progressive():
    rng = np.random.default_rng(5)
    im = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    pieces = img.detach_image(im, rng=rng)
    canvas = np.zeros_like(im)
    for p in pieces[: len(pieces) // 2]:
        img.redraw_image(p, canvas)
    half_match = (canvas == im).mean()
    for p in pieces[len(pieces) // 2 :]:
        img.redraw_image(p, canvas)
    assert (canvas == im).all() and 0.2 < half_match < 0.9


def test_piece_wire_roundtrip():
    piece = ((10, 20, 1), np.arange(100, dtype=np.uint8).reshape(10, 10, 1))
    wire = img.encode_piece(piece)
    (pos, arr) = img.decode_piece(wire)
    assert pos == (10, 20, 1) and np.array_equal(arr, piece[1])
    # the RX contract: payload after MAC header starts with the prefix
    assert img.strip_transport(wire) == wire[4:]


def test_mode2_end_to_end_over_phy():
    """Full reference data path for a handful of pieces: detach ->
    pickle+prefix -> MAC MPDU -> 802.11a PHY over a stream -> sync ->
    decode -> FCS check -> strip -> redraw."""
    rng = np.random.default_rng(6)
    im = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    pieces = img.detach_image(im, rng=rng)           # 12 pieces
    mac_tx = mac.Mac()
    datagrams = [img.encode_piece(p) for p in pieces]
    # identical piece shapes -> one static PSDU bucket
    lens = {len(d) for d in datagrams}
    assert len(lens) == 1
    mpdus = np.stack([
        np.frombuffer(mac_tx.frame(d), dtype=np.uint8) for d in datagrams
    ])
    L = mpdus.shape[1]
    mcs = 2
    bursts = tx.transmit(jnp.asarray(mpdus), mcs,
                         scrambler_seed=jnp.asarray(np.arange(len(mpdus)) % 127 + 1))
    stream = tx.pad_burst(bursts, pad_front=120, pad_tail=280).reshape(-1)
    res, cand = sync.receive(stream, tx.tx_plan(mcs, L), max_frames=16)
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
    canvas = np.zeros_like(im)
    n_drawn = 0
    for row in np.array(res.psdu)[ok]:
        f = mac.parse(row.tobytes())
        if not f.fcs_ok:
            continue
        piece = img.decode_piece(f.payload)
        img.redraw_image(piece, canvas)
        n_drawn += 1
    assert n_drawn == len(pieces)
    assert np.array_equal(canvas, im)


@pytest.mark.slow
def test_mode2_full_kodak_set_qpsk_and_16qam():
    """BASELINE config[1]: Mode-2 multi-frame image transfer over AWGN at
    QPSK 3/4 and 16-QAM 3/4 across the full shipped Kodak set (each image
    downscaled to 30x30 to keep the CPU-jit suite sane: 27 pieces/image x
    6 images x 2 MCS through the real detach -> MAC -> PHY -> sync ->
    FCS -> redraw path, every piece bit-exact)."""
    from pathlib import Path

    from PIL import Image

    kodaks = sorted(Path("assets").glob("kodim*.png"))
    assert len(kodaks) == 6, kodaks
    mac_tx = mac.Mac()
    rng = np.random.default_rng(3)
    for mcs, snr_db in ((3, 22.0), (5, 26.0)):       # QPSK 3/4, 16-QAM 3/4
        for path in kodaks:
            im = np.asarray(Image.open(path).convert("RGB").resize((30, 30)))
            pieces = img.detach_image(im, rng=rng)
            datagrams = [img.encode_piece(p) for p in pieces]
            mpdus = np.stack([
                np.frombuffer(mac_tx.frame(d), dtype=np.uint8)
                for d in datagrams])
            L = mpdus.shape[1]
            bursts = tx.transmit(
                jnp.asarray(mpdus), mcs,
                scrambler_seed=jnp.asarray(np.arange(len(mpdus)) % 127 + 1))
            stream = np.asarray(
                tx.pad_burst(bursts, pad_front=120, pad_tail=280).reshape(-1))
            noise = 0.5 * 10 ** (-snr_db / 20) / np.sqrt(2)
            stream = (stream + noise * (
                rng.standard_normal(stream.size)
                + 1j * rng.standard_normal(stream.size))).astype(np.complex64)
            res, cand = sync.receive(jnp.asarray(stream), tx.tx_plan(mcs, L),
                                     max_frames=2 * len(pieces))
            ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
            canvas = np.zeros_like(im)
            drawn = 0
            for row in np.array(res.psdu)[ok]:
                f = mac.parse(row.tobytes())
                if f.fcs_ok:
                    img.redraw_image(img.decode_piece(f.payload), canvas)
                    drawn += 1
            assert drawn >= len(pieces), (path.name, mcs, drawn)
            np.testing.assert_array_equal(canvas, im,
                                          err_msg=f"{path.name} mcs{mcs}")
