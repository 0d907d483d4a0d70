"""JSCE codec parity tests: Flax modules vs torch oracles.

The torch modules below restate the reference architecture (SURVEY.md §2.4)
as numeric oracles; weights are randomized in torch, converted with
models/convert.py, and forward outputs must match to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gnuradio_wifi_imagetransfer_tpu.models import convert  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.afb import AFBPE  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderPE  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.encoder import Encoder  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE, positionalencoding2d  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.layers import GDN  # noqa: E402
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RCB, RTCB  # noqa: E402


# --------------------------------------------------------------------------
# torch oracles (restated from the reference spec)
# --------------------------------------------------------------------------


class TorchGDN(tnn.Module):
    def __init__(self, ch, inverse=False, beta_min=1e-6, gamma_init=0.1, offset=2 ** -18):
        super().__init__()
        self.inverse = inverse
        self.pedestal = offset ** 2
        self.beta_bound = (beta_min + offset ** 2) ** 0.5
        self.gamma_bound = offset
        self.beta = tnn.Parameter(torch.sqrt(torch.ones(ch) + self.pedestal))
        self.gamma = tnn.Parameter(torch.sqrt(gamma_init * torch.eye(ch) + self.pedestal))

    def forward(self, x):
        ch = x.shape[1]
        beta = torch.clamp(self.beta, min=self.beta_bound) ** 2 - self.pedestal
        gamma = (torch.clamp(self.gamma, min=self.gamma_bound) ** 2 - self.pedestal).view(ch, ch, 1, 1)
        norm = torch.sqrt(tF.conv2d(x ** 2, gamma, beta))
        return x * norm if self.inverse else x / norm


class TorchRCB(tnn.Module):
    def __init__(self, k, in_size, expand, out, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_size, expand, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(expand)
        self.conv2 = tnn.Conv2d(expand, expand, k, stride=stride, padding=1,
                                groups=expand, bias=False)
        self.bn2 = tnn.BatchNorm2d(expand)
        self.conv3 = tnn.Conv2d(expand, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.act = tnn.Hardswish()
        self.skip = None
        if stride == 1 and in_size != out:
            self.skip = tnn.Sequential(tnn.Conv2d(in_size, out, 1, bias=False),
                                       tnn.BatchNorm2d(out))
        elif stride == 2 and in_size != out:
            self.skip = tnn.Sequential(
                tnn.Conv2d(in_size, in_size, 3, groups=in_size, stride=2, padding=1, bias=False),
                tnn.BatchNorm2d(in_size),
                tnn.Conv2d(in_size, out, 1, bias=True),
                tnn.BatchNorm2d(out))
        elif stride == 2 and in_size == out:
            self.skip = tnn.Sequential(
                tnn.Conv2d(in_size, out, 3, groups=in_size, stride=2, padding=1, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        out = self.act(self.bn1(self.conv1(x)))
        out = self.act(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        skip = self.skip(x) if self.skip is not None else x
        return self.act(out + skip)


class TorchRTCB(tnn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.proc = tnn.Sequential(
            tnn.ConvTranspose2d(in_ch, out_ch, 3, stride=stride, padding=1,
                                output_padding=stride - 1),
            TorchGDN(out_ch, inverse=True),
            tnn.PReLU(out_ch),
            tnn.ConvTranspose2d(out_ch, out_ch, 3, stride=1, padding=1),
            TorchGDN(out_ch, inverse=True),
        )
        self.shortcut = tnn.Sequential()
        if stride != 1 or in_ch != out_ch:
            self.shortcut = tnn.Sequential(
                tnn.ConvTranspose2d(in_ch, out_ch, 1, stride=stride, padding=0,
                                    output_padding=stride - 1),
                TorchGDN(out_ch, inverse=True))
        self.fn = tnn.PReLU(out_ch)

    def forward(self, x):
        return self.fn(self.proc(x) + self.shortcut(x))


class TorchAFBPE(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.fc1 = tnn.Linear(ch, ch)
        self.fc2 = tnn.Linear(ch, ch)

    def forward(self, feature, sub_csi=None):
        x = torch.mean(feature, dim=(2, 3))
        if sub_csi is not None:
            pe = sub_csi[: x.shape[1]].unsqueeze(0).repeat(x.shape[0], 1)
            x = x + pe
        x = torch.sigmoid(self.fc2(tF.relu(self.fc1(x))))
        return feature * x[:, :, None, None]


class TorchEncoder(tnn.Module):
    def __init__(self, cc=128):
        super().__init__()
        self.convBlock1 = TorchRCB(3, 3, 96, 128, 2)
        self.attention1 = TorchAFBPE(128)
        self.convBlock2 = TorchRCB(3, 128, 256, 256, 2)
        self.attention2 = TorchAFBPE(256)
        self.convBlock3 = TorchRCB(3, 256, 512, 256, 2)
        self.attention3 = TorchAFBPE(256)
        self.convBlock4 = TorchRCB(3, 256, 256, cc, 1)

    def forward(self, r, csi):
        s = self.attention1(self.convBlock1(r), csi)
        s = self.attention2(self.convBlock2(s), csi)
        s = self.attention3(self.convBlock3(s), csi)
        return self.convBlock4(s)


class TorchDecoderPE(tnn.Module):
    def __init__(self, cc=128, rc=3):
        super().__init__()
        self.convBlock1 = TorchRTCB(cc, 256, 1)
        self.attention1 = TorchAFBPE(256)
        self.convBlock2 = TorchRTCB(256, 256, 2)
        self.attention2 = TorchAFBPE(256)
        self.convBlock3 = TorchRTCB(256, 128, 2)
        self.attention3 = TorchAFBPE(128)
        self.convBlock4 = TorchRTCB(128, rc, 2)

    def forward(self, s, csi):
        r = self.attention1(self.convBlock1(s), csi)
        r = self.attention2(self.convBlock2(r), csi)
        r = self.attention3(self.convBlock3(r), csi)
        return self.convBlock4(r)


def _rand_init(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05 + p * 0.7)
        for b in mod.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
    mod.eval()
    return mod


def _nchw(x):
    return torch.tensor(np.moveaxis(x, -1, 1))


# --------------------------------------------------------------------------
# parity tests
# --------------------------------------------------------------------------


def test_gdn_matches_torch():
    t = _rand_init(TorchGDN(8, inverse=False), 0)
    x = np.random.default_rng(0).standard_normal((2, 5, 5, 8)).astype(np.float32)
    ref = t(_nchw(x)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=True)
    got = np.asarray(GDN(8).apply(fvars, jnp.asarray(x)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=2e-5)


@pytest.mark.parametrize("in_size,out,stride", [(3, 128, 2), (128, 128, 2),
                                                (64, 128, 1), (128, 128, 1)])
def test_rcb_matches_torch(in_size, out, stride):
    t = _rand_init(TorchRCB(3, in_size, 96, out, stride), 1)
    x = np.random.default_rng(1).standard_normal((2, 16, 16, in_size)).astype(np.float32)
    ref = t(_nchw(x)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=False)
    got = np.asarray(RCB(3, in_size, 96, out, stride).apply(fvars, jnp.asarray(x)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=1e-4)


@pytest.mark.parametrize("in_ch,out_ch,stride", [(128, 256, 1), (256, 128, 2),
                                                 (128, 3, 2)])
def test_rtcb_matches_torch(in_ch, out_ch, stride):
    t = _rand_init(TorchRTCB(in_ch, out_ch, stride), 2)
    x = np.random.default_rng(2).standard_normal((2, 8, 8, in_ch)).astype(np.float32)
    ref = t(_nchw(x)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=True)
    got = np.asarray(RTCB(in_ch, out_ch, stride).apply(fvars, jnp.asarray(x)))
    assert got.shape == (2, 8 * stride, 8 * stride, out_ch)
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=5e-4, rtol=1e-4)


def test_afb_pe_matches_torch():
    t = _rand_init(TorchAFBPE(32), 3)
    x = np.random.default_rng(3).standard_normal((2, 6, 6, 32)).astype(np.float32)
    pe = np.random.default_rng(4).standard_normal(256).astype(np.float32)
    ref = t(_nchw(x), torch.tensor(pe)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=False)
    got = np.asarray(AFBPE(32).apply(fvars, jnp.asarray(x), jnp.asarray(pe)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=2e-5)


def test_full_encoder_matches_torch():
    t = _rand_init(TorchEncoder(128), 5)
    x = np.random.default_rng(5).standard_normal((1, 48, 48, 3)).astype(np.float32)
    pe = np.random.default_rng(6).standard_normal(256).astype(np.float32)
    ref = t(_nchw(x), torch.tensor(pe)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=False)
    got = np.asarray(Encoder(128).apply(fvars, jnp.asarray(x), jnp.asarray(pe)))
    assert got.shape == (1, 6, 6, 128)
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=5e-4)


def test_full_decoder_matches_torch():
    # default torch init: randomized GDN gammas compound multiplicatively
    # through 4 IGDN blocks and explode to 1e30+, swamping float tolerance
    torch.manual_seed(7)
    t = TorchDecoderPE(128, 3)
    t.eval()
    x = np.random.default_rng(7).standard_normal((1, 6, 6, 128)).astype(np.float32)
    pe = np.random.default_rng(8).standard_normal(256).astype(np.float32)
    ref = t(_nchw(x), torch.tensor(pe)).detach().numpy()
    fvars = convert.convert_module(t.state_dict(), is_decoder=True)
    got = np.asarray(DecoderPE(128, 3).apply(fvars, jnp.asarray(x), jnp.asarray(pe)))
    assert got.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, atol=1e-3, rtol=1e-3)


def test_positional_encoding_matches_torch_reference():
    """Oracle restated from jsce_codec.py:34-57."""
    import math as m

    d_model, h, w = 16, 6, 5
    pe = torch.zeros(d_model, h, w)
    half = d_model // 2
    div = torch.exp(torch.arange(0.0, half, 2) * -(m.log(10000.0) / half))
    pos_w = torch.arange(0.0, w).unsqueeze(1)
    pos_h = torch.arange(0.0, h).unsqueeze(1)
    pe[0:half:2] = torch.sin(pos_w * div).transpose(0, 1).unsqueeze(1).repeat(1, h, 1)
    pe[1:half:2] = torch.cos(pos_w * div).transpose(0, 1).unsqueeze(1).repeat(1, h, 1)
    pe[half::2] = torch.sin(pos_h * div).transpose(0, 1).unsqueeze(2).repeat(1, 1, w)
    pe[half + 1::2] = torch.cos(pos_h * div).transpose(0, 1).unsqueeze(2).repeat(1, 1, w)
    np.testing.assert_allclose(positionalencoding2d(d_model, h, w), pe.numpy(), atol=1e-6)


@pytest.mark.slow
def test_jsce_facade_roundtrip_shapes():
    """Mode-1 API parity: img2msg fuses two users into one (30,30,128)
    latent; msg2img reconstructs a 240x240 image per user."""
    jsce = JSCE(img_size=(240, 240), compressed_channel=128)
    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 256, (240, 240, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (240, 240, 3), dtype=np.uint8)
    latent = jsce.img2msg({"3-4": img_a, "13-10": img_b})   # reference TARGET keys
    assert latent.shape == (30, 30, 128) and latent.dtype == np.float32
    rec = jsce.msg2img(latent, "3-4")
    rec = np.asarray(rec)
    assert rec.shape == (240, 240, 3) and rec.dtype == np.uint8
    # deterministic
    latent2 = jsce.img2msg({"3-4": img_a, "13-10": img_b})
    np.testing.assert_allclose(latent, latent2, atol=1e-6)


def test_jsce_checkpoint_load_from_torch():
    """End-to-end: a torch checkpoint in the reference's on-disk format
    loads through the converter and drives inference."""
    enc = _rand_init(TorchEncoder(128), 11)
    dec = _rand_init(TorchDecoderPE(128, 3), 12)
    ckpt = {}
    ckpt.update({f"shared_encoder.{k}": v for k, v in enc.state_dict().items()})
    ckpt.update({f"shared_decoder.{k}": v for k, v in dec.state_dict().items()})
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pth")
        torch.save(ckpt, path)
        jsce = JSCE(weight_path=path, img_size=(48, 48), compressed_channel=128)
        img = np.random.default_rng(13).integers(0, 256, (48, 48, 3), dtype=np.uint8)
        latent = jsce.img2msg({"3-4": img})
        assert latent.shape == (6, 6, 128)
        # cross-check against the torch forward
        from gnuradio_wifi_imagetransfer_tpu.models.jsce import normalize_image

        x = normalize_image(img)[None]
        label = torch.tensor(np.asarray(jsce._label("3-4")))
        ref = enc(_nchw(x), label).detach().numpy()[0]
        np.testing.assert_allclose(np.moveaxis(latent, -1, 0), ref, atol=5e-4)
