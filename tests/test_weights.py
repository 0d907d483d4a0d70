"""Packaged JSCE checkpoint: loads, decodes, and beats random-init.

The reference ships trained .pth weights (stripped from its repo,
.MISSING_LARGE_BLOBS) and demonstrates Mode-1 reconstruction with them
(upload_featuremap_udp.py:78-82, assets/202503071455_lite.gif); the
packaged assets/jsce_soma_dscn.npz — trained by make_weights.py — is our
equivalent, and these tests pin that it actually reconstructs."""

import numpy as np
import pytest

from gnuradio_wifi_imagetransfer_tpu.models import weights as wt


def test_packaged_checkpoint_exists_and_loads():
    path = wt.default_checkpoint()
    assert path is not None, "packaged JSCE checkpoint missing"
    variables, meta = wt.load_soma_npz(path)
    # reference demo geometry (preferred) or the small fast-test one
    assert (meta["compressed_channel"], meta["img_size"]) in {
        (128, 240),      # upload_featuremap_udp.py:78-82 live config
        (64, 80),
    }
    assert meta["users"] == ["3-4", "13-10"]
    # the committed metadata records the held-out quality measured at save
    # (16-crop eval; packaged ref-geometry checkpoint measures 22.2/21.6 dB,
    # the small fast-test one 22.6/20.7 — floor set with ~1.5 dB margin)
    for u in meta["users"]:
        assert meta["holdout_metrics"][u]["psnr"] > 19.5, meta
    enc, dec = wt.split_soma(variables)
    assert "params" in enc and "batch_stats" in enc
    assert "params" in dec
    # leaves restored to float32 for compute
    flat = wt._flatten(variables)
    assert all(v.dtype == np.float32 for v in flat.values()
               if np.issubdtype(v.dtype, np.floating))


def test_roundtrip_flatten_unflatten():
    tree = {"a": {"b": np.arange(3.0, dtype=np.float32)},
            "c": np.ones((2, 2), np.float32)}
    flat = wt._flatten(tree)
    back = wt._unflatten(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["c"], tree["c"])


@pytest.mark.slow
def test_packaged_weights_reconstruct_above_random_init():
    """Full Mode-1 facade path (2-user mean superposition, L2 channel
    norm): the trained checkpoint reconstructs held-out Kodak crops far
    above a random-init facade; measured at save time: ~21-23 dB PSNR /
    ~0.70 SSIM per user (make_weights.py, 20000 steps)."""
    from PIL import Image

    from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE
    from gnuradio_wifi_imagetransfer_tpu.utils.metrics import psnr

    trained = JSCE.packaged()
    hw, c = trained.img_size[0], trained.c
    img = np.asarray(Image.open("assets/kodim23.png").convert("RGB"))
    rng = np.random.default_rng(5)
    crops = {}
    for u in ("3-4", "13-10"):
        y, x = rng.integers(img.shape[0] - hw), rng.integers(img.shape[1] - hw)
        crops[u] = img[y : y + hw, x : x + hw]

    latent = trained.img2msg(crops)
    # tiles exactly into the Mode-1 (10,10,1) piece protocol
    assert latent.shape == (hw // 8, hw // 8, c)
    assert latent.shape[0] % 10 == 0
    trained_psnr = {u: psnr(np.asarray(trained.msg2img(latent, u)), crops[u])
                    for u in crops}

    rand = JSCE(img_size=(hw, hw), compressed_channel=c, rng_seed=3)
    latent_r = rand.img2msg(crops)
    rand_psnr = {u: psnr(np.asarray(rand.msg2img(latent_r, u)), crops[u])
                 for u in crops}

    for u in crops:
        assert trained_psnr[u] > 17.0, (trained_psnr, rand_psnr)
        assert trained_psnr[u] > rand_psnr[u] + 5.0, (trained_psnr, rand_psnr)


def test_flatten_handles_frozen_mapping():
    """Flax variable collections may arrive as FrozenDict (a Mapping but
    not a dict subclass); _flatten must recurse, not np.asarray the whole
    collection into an object leaf (ADVICE r3)."""
    import flax.core

    tree = {"params": flax.core.freeze(
        {"layer": {"w": np.ones((2, 2), np.float32)}})}
    flat = wt._flatten(tree)
    assert set(flat) == {"params/layer/w"}
    assert flat["params/layer/w"].dtype == np.float32


def test_missing_weights_override_raises(monkeypatch, tmp_path):
    """GWT_JSCE_WEIGHTS pointing at a missing file must fail loudly, not
    fall through to the packaged default (ADVICE r3)."""
    monkeypatch.setenv("GWT_JSCE_WEIGHTS", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError, match="GWT_JSCE_WEIGHTS"):
        wt.default_checkpoint()
