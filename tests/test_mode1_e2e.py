"""BASELINE config[3]: JSCE fused-feature-map mode end to end.

codec.img2msg (two users fused) -> float32 latent pieces -> MAC -> 802.11a
PHY over AWGN -> sync/decode -> rebuild latent -> codec.msg2img per user.
Mirrors the Mode-1 path (SURVEY.md §3.3/3.4) at reduced image size to keep
CPU runtime sane; the latent transport must be BIT-exact (float payloads
survive the PHY untouched), and per-user reconstructions must match a
direct no-PHY decode exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE
from gnuradio_wifi_imagetransfer_tpu.phy import mac, sync, tx
from gnuradio_wifi_imagetransfer_tpu.utils import image as imgutil


def test_mode1_jsce_over_phy():
    img_hw = 80                         # latent 10x10x32 -> 32 pieces
    jsce = JSCE(img_size=(img_hw, img_hw), compressed_channel=32)
    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 256, (img_hw, img_hw, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (img_hw, img_hw, 3), dtype=np.uint8)

    users = ["3-4", "13-10"]            # upload_featuremap_udp.py TARGET
    latent = jsce.img2msg({users[0]: img_a, users[1]: img_b})
    assert latent.shape == (10, 10, 32) and latent.dtype == np.float32

    # --- transport over the PHY -----------------------------------------
    pieces = imgutil.detach_image(latent, rng=rng)
    mac_tx = mac.Mac()
    datagrams = [imgutil.encode_piece(p) for p in pieces]
    assert len({len(d) for d in datagrams}) == 1
    mpdus = np.stack([np.frombuffer(mac_tx.frame(d), np.uint8) for d in datagrams])
    L = mpdus.shape[1]
    mcs = 5                              # 16-QAM 3/4
    bursts = tx.transmit(jnp.asarray(mpdus), mcs,
                         scrambler_seed=jnp.asarray(np.arange(len(mpdus)) % 127 + 1))
    stream = np.asarray(tx.pad_burst(bursts, 120, 280).reshape(-1))
    noise = 0.5 * 10 ** (-28 / 20) / np.sqrt(2)
    stream = stream + noise * (rng.standard_normal(stream.size)
                               + 1j * rng.standard_normal(stream.size))
    res, cand = sync.receive(jnp.asarray(stream.astype(np.complex64)),
                             tx.tx_plan(mcs, L), max_frames=2 * len(pieces))
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])

    rebuilt = np.zeros_like(latent)
    n_drawn = 0
    for row in np.array(res.psdu)[ok]:
        f = mac.parse(row.tobytes())
        if not f.fcs_ok:
            continue
        piece = imgutil.decode_piece(f.payload)
        imgutil.redraw_image(piece, rebuilt)
        n_drawn += 1
    assert n_drawn >= len(pieces)
    # float latent must survive the digital link bit-exactly
    np.testing.assert_array_equal(rebuilt, latent)

    # --- per-user reconstruction -----------------------------------------
    for u in users:
        direct = np.asarray(jsce.msg2img(latent, u))
        via_phy = np.asarray(jsce.msg2img(rebuilt, u))
        np.testing.assert_array_equal(via_phy, direct)
        assert direct.shape == (img_hw, img_hw, 3)

    # the two users decode to different images (PE labels separate them)
    rec_a = np.asarray(jsce.msg2img(latent, users[0]))
    rec_b = np.asarray(jsce.msg2img(latent, users[1]))
    assert not np.array_equal(rec_a, rec_b)


@pytest.mark.slow
def test_mode1_trained_codec_over_phy_reconstructs():
    """Mode-1 with the TRAINED packaged checkpoint over the PHY at the
    checkpoint's own geometry — with the reference-geometry npz this is
    the LIVE demo config: 240x240 images, (30,30,128) latent, 1152
    pieces (upload_featuremap_udp.py:78-82, download_featuremap_udp.py:
    20-28). Real Kodak content in, recognizable reconstruction out
    (the reference demonstrates this visually with its trained .pth,
    assets/202503071455_lite.gif); PSNR well above random-init.

    PHY coverage split to keep CPU runtime sane at 1152 frames: a
    16-piece subset runs the full sync front-end (detection, CFO,
    alignment); the complete piece set runs the genie-aligned bit
    pipeline (scramble/BCC/interleave/map/OFDM -> equalize/Viterbi/
    descramble/FCS) as one vectorized batch."""
    from PIL import Image

    from gnuradio_wifi_imagetransfer_tpu.phy import rx
    from gnuradio_wifi_imagetransfer_tpu.utils.metrics import psnr

    jsce = JSCE.packaged()
    hw = jsce.img_size[0]
    img = np.asarray(Image.open("assets/kodim23.png").convert("RGB"))
    # the committed kodim23 is 500x500: keep crops inside both axes at
    # either checkpoint geometry (hw = 240 reference / 80 small)
    crops = {"3-4": img[10:10 + hw, 20:20 + hw],
             "13-10": img[250:250 + hw, 240:240 + hw]}
    latent = jsce.img2msg(crops)
    assert latent.shape == (hw // 8, hw // 8, jsce.c)

    rng = np.random.default_rng(1)
    pieces = imgutil.detach_image(latent, rng=rng)
    mac_tx = mac.Mac()
    datagrams = [imgutil.encode_piece(p) for p in pieces]
    mpdus = np.stack([np.frombuffer(mac_tx.frame(d), np.uint8) for d in datagrams])
    mcs = 7                              # 64-QAM 3/4: shortest bursts
    plan = tx.tx_plan(mcs, mpdus.shape[1])
    seeds = np.arange(len(mpdus)) % 127 + 1
    bursts = np.asarray(tx.transmit(jnp.asarray(mpdus), mcs,
                                    scrambler_seed=jnp.asarray(seeds)))
    noise = 0.5 * 10 ** (-30 / 20) / np.sqrt(2)

    # full piece set: genie-aligned batch through the whole bit pipeline
    y = bursts + noise * (rng.standard_normal(bursts.shape)
                          + 1j * rng.standard_normal(bursts.shape))
    res_all = rx.decode_aligned(jnp.asarray(y.astype(np.complex64)), plan,
                                start=0)
    assert bool(np.asarray(res_all.sig["parity_ok"]).all())
    rebuilt = np.zeros_like(latent)
    n_drawn = 0
    for row in np.asarray(res_all.psdu):
        f = mac.parse(row.tobytes())
        assert f.fcs_ok
        imgutil.redraw_image(imgutil.decode_piece(f.payload), rebuilt)
        n_drawn += 1
    assert n_drawn == len(pieces)
    np.testing.assert_array_equal(rebuilt, latent)

    # 16-piece subset: full sync front-end over a padded stream
    sub = min(16, len(pieces))
    stream = np.asarray(tx.pad_burst(bursts[:sub], 120, 280).reshape(-1))
    stream = stream + noise * (rng.standard_normal(stream.size)
                               + 1j * rng.standard_normal(stream.size))
    res, cand = sync.receive(jnp.asarray(stream.astype(np.complex64)),
                             plan, max_frames=2 * sub)
    ok = np.array(cand.valid) & np.array(res.sig["parity_ok"])
    got = {np.asarray(res.psdu)[i].tobytes() for i in np.flatnonzero(ok)}
    for m in mpdus[:sub]:
        assert m.tobytes() in got, "sync path lost a piece frame"

    for u, src in crops.items():
        rec = np.asarray(jsce.msg2img(rebuilt, u))
        q = psnr(rec, src)
        assert q > 17.0, (u, q)          # trained: ~21+ dB; random: ~10
