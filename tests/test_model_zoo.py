"""Model-zoo tests: the research model families of the reference's
codec/models tree — shapes, invariants, and a numerical GCN oracle.

Mirrors the reference's __main__ smoke blocks (SURVEY.md §4.3:
RCB_DS.py:82-97, Swin_ViT.py:484-489, GNN.py:22-38, etc.) as real
pytest cases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.models import (
    CSAAFB, ConditionalVAE, GNN, MAE, MaskedAutoencoderViT, PatchMerging,
    PatchExpand, PatchExpand2X, DimReducePatchExpand, FinalPatchExpandX4,
    PropagNet, SOMANetPE, SwinTransformerBlock, Transformer, ViT,
    ViTDecoder, ViTEncoder, vae_loss,
)
from gnuradio_wifi_imagetransfer_tpu.models.encoder import EncoderCSI, EncoderPE
from gnuradio_wifi_imagetransfer_tpu.models.decoder import DecoderDSCN, DecoderOriginal
from gnuradio_wifi_imagetransfer_tpu.models.gnn import normalized_adjacency
from gnuradio_wifi_imagetransfer_tpu.models.pos_embed import (
    get_2d_sincos_pos_embed, interpolate_pos_embed)
from gnuradio_wifi_imagetransfer_tpu.models.rcb import RCBGDN, RTCBDS


KEY = jax.random.PRNGKey(0)


def test_pos_embed_shapes_and_values():
    pe = get_2d_sincos_pos_embed(64, 4)
    assert pe.shape == (16, 64)
    pe_cls = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert pe_cls.shape == (17, 64)
    assert np.allclose(pe_cls[0], 0.0)
    # position (0,0) embeds to sin(0)=0 / cos(0)=1 halves
    assert np.allclose(pe[0, :16], 0.0, atol=1e-6)
    assert np.allclose(pe[0, 16:32], 1.0, atol=1e-6)


def test_interpolate_pos_embed_resizes():
    pe = get_2d_sincos_pos_embed(32, 4, cls_token=True)[None]
    out = interpolate_pos_embed(pe, num_patches=64)
    assert out.shape == (1, 65, 32)
    # same size -> unchanged
    same = interpolate_pos_embed(pe, num_patches=16)
    assert same.shape == pe.shape


def test_vit_forward_cls_and_mean():
    img = jax.random.normal(KEY, (2, 32, 32, 3))
    ctx = jax.random.normal(KEY, (2, 4, 512))
    for pool in ("cls", "mean"):
        model = ViT(image_size=32, patch_size=8, dim=64, depth=2, heads=4,
                    mlp_dim=128, pool=pool)
        params = model.init(KEY, img, ctx)
        out = model.apply(params, img, ctx)
        assert out.shape == (2, 64)
        assert np.all(np.isfinite(out))


def test_transformer_cross_attention_context():
    x = jax.random.normal(KEY, (2, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32))
    model = Transformer(dim=32, depth=2, heads=4, dim_head=8, mlp_dim=64)
    params = model.init(KEY, x, ctx)
    with_ctx = model.apply(params, x, ctx)
    without = model.apply(params, x, None)
    assert with_ctx.shape == (2, 5, 32)
    # context must actually change the output (keys/values include it)
    assert not np.allclose(with_ctx, without)


def test_mae_wrapper_loss_and_reconstruction():
    img = jax.random.normal(KEY, (2, 32, 32, 3))
    model = MAE(image_size=32, patch_size=8, encoder_dim=64, encoder_depth=1,
                decoder_dim=64, decoder_depth=1, masking_ratio=0.75)
    params = model.init({"params": KEY, "mask": KEY}, img)
    loss = model.apply(params, img, rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    dec_tokens, aux = model.apply(params, img, rng=jax.random.PRNGKey(3),
                                  method=model.encode)
    # 75% of 16 patches masked -> 4 visible
    assert dec_tokens.shape == (2, 4, 64)
    loss2, recon = model.apply(params, dec_tokens, aux, method=model.decode)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isclose(float(loss), float(loss2))


def test_masked_autoencoder_vit():
    model = MaskedAutoencoderViT(img_size=32, patch_size=8, embed_dim=64,
                                 depth=2, num_heads=4, decoder_embed_dim=32,
                                 decoder_depth=1, decoder_num_heads=4)
    img = jax.random.normal(KEY, (2, 32, 32, 3))
    params = model.init({"params": KEY, "mask": KEY}, img)
    loss, pred, mask = model.apply(params, img, 0.75,
                                   rngs={"mask": jax.random.PRNGKey(5)})
    assert pred.shape == (2, 16, 8 * 8 * 3)
    assert mask.shape == (2, 16)
    # exactly 75% masked
    assert np.allclose(np.asarray(mask).sum(axis=1), 12)
    assert np.isfinite(float(loss))
    # patchify/unpatchify round-trip
    patches = model.patchify(img)
    back = model.unpatchify(patches)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), rtol=1e-6)


def test_swin_block_and_resamplers():
    # mirrors Swin_ViT.py:484-489
    x = jax.random.normal(KEY, (1, 16 * 16, 32))
    blk = SwinTransformerBlock(dim=32, input_resolution=(16, 16), num_heads=4,
                               window_size=8, shift_size=4)
    params = blk.init(KEY, x)
    out = blk.apply(params, x)
    assert out.shape == x.shape

    merged = PatchMerging((16, 16), 32)
    p = merged.init(KEY, x)
    y = merged.apply(p, x)
    assert y.shape == (1, 8 * 8, 64)

    exp2 = PatchExpand2X((16, 16), 32)
    y = exp2.apply(exp2.init(KEY, x), x)
    assert y.shape == (1, 32 * 32, 16)

    exp = PatchExpand((16, 16), 32, dim_scale=2)
    y = exp.apply(exp.init(KEY, x), x)
    assert y.shape == (1, 32 * 32, 16)

    dr = DimReducePatchExpand((16, 16), 32, dim_scale=2)
    y = dr.apply(dr.init(KEY, x), x)
    assert y.shape == (1, 32 * 32, 8)

    fin = FinalPatchExpandX4((16, 16), 32)
    y = fin.apply(fin.init(KEY, x), x)
    assert y.shape == (1, 64 * 64, 32)


def test_gcn_matches_dense_oracle():
    # 4-node path graph, both directions
    edges = jnp.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    x = jax.random.normal(KEY, (4, 3))
    model = GNN(hidden_channels=8, out_channels=5)
    params = model.init(KEY, x, edges)
    out = model.apply(params, x, edges)
    assert out.shape == (4, 5)

    # oracle: exact propagation rule with the learned weights
    adj = np.asarray(normalized_adjacency(edges, 4))
    w1 = np.asarray(params["params"]["conv1"]["lin"]["kernel"])
    b1 = np.asarray(params["params"]["conv1"]["lin"]["bias"])
    w2 = np.asarray(params["params"]["conv2"]["lin"]["kernel"])
    b2 = np.asarray(params["params"]["conv2"]["lin"]["bias"])
    h = np.maximum(adj @ (np.asarray(x) @ w1 + b1), 0)
    ref = adj @ (h @ w2 + b2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gnn_batched_like_reference_smoke():
    # GNN.py:22-38: batched node features
    import math
    batch, users, in_ch = 8, 6, 3
    g = jax.random.normal(KEY, (batch, users, in_ch))
    edge_index = jax.random.randint(KEY, (2, math.comb(users, 2)), 0, 5)
    model = GNN(hidden_channels=16, out_channels=64)
    params = model.init(KEY, g, edge_index)
    out = model.apply(params, g, edge_index)
    assert out.shape == (batch, users, 64)


def test_propagnet_paths_and_csi():
    rng = np.random.default_rng(0)
    m, n, p = 4, 8, 3
    env = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)),
           rng.standard_normal((n, p)) + 1j * rng.standard_normal((n, p)),
           rng.standard_normal((m, p)) + 1j * rng.standard_normal((m, p)))
    model = PropagNet(env=env, with_irs=True)
    x = jnp.ones((m,), jnp.complex64)
    params = model.init(KEY, x)
    y, csi = model.apply(params, x)
    assert y.shape == (p, m) and csi.shape == (p, m)
    # per-path oracle from the learned phases
    phi = np.asarray(params["params"]["phi"])
    psi = np.cos(phi) + 1j * np.sin(phi)
    for pi in range(p):
        ref = env[0] @ np.diag(psi) @ env[1][:, pi] + env[2][:, pi]
        np.testing.assert_allclose(np.asarray(csi[pi]), ref.astype(np.complex64),
                                   rtol=1e-4, atol=1e-4)
    # withIRS=False zeroes the reflection: CSI reduces to the direct path
    model0 = PropagNet(env=env, with_irs=False)
    p0 = model0.init(KEY, x)
    _, csi0 = model0.apply(p0, x)
    np.testing.assert_allclose(np.asarray(csi0), env[2].T.astype(np.complex64),
                               rtol=1e-4, atol=1e-4)


def test_csa_afb_scalar_and_multi_snr():
    feat = jax.random.normal(KEY, (2, 8, 8, 16))
    for snr in (20.0, [10.0, 20.0, 30.0]):
        model = CSAAFB(snr=snr, channel_size=16)
        params = model.init(KEY, feat)
        out = model.apply(params, feat)
        assert out.shape == feat.shape
        # sigmoid gate: |out| <= |feat|
        assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(feat)) + 1e-6)


@pytest.mark.slow
def test_rcbgdn_and_rtcbds_shapes():
    x = jax.random.normal(KEY, (1, 16, 16, 3))
    blk = RCBGDN(3, 32, 2)
    out = blk.apply(blk.init(KEY, x), x)
    assert out.shape == (1, 8, 8, 32)

    z = jax.random.normal(KEY, (1, 8, 8, 32))
    up = RTCBDS(3, 32, 64, 16, stride=2)
    p = up.init(KEY, z)
    out = up.apply(p, z)
    assert out.shape == (1, 16, 16, 16)
    same = RTCBDS(3, 32, 64, 32, stride=1)
    out = same.apply(same.init(KEY, z), z)
    assert out.shape == (1, 8, 8, 32)


@pytest.mark.slow
def test_encoder_variants_shapes():
    img = jax.random.normal(KEY, (1, 32, 32, 3))
    enc = EncoderPE(compressed_channel=16)
    out = enc.apply(enc.init(KEY, img), img)
    assert out.shape == (1, 4, 4, 16)

    enc_csi = EncoderCSI(csi_shape=1, compressed_channel=16)
    csi = jnp.asarray([0.3 + 0.4j])
    p = enc_csi.init(KEY, img, csi)
    out = enc_csi.apply(p, img, csi)
    assert out.shape == (1, 4, 4, 16)


@pytest.mark.slow
def test_decoder_variants_shapes():
    lat = jax.random.normal(KEY, (1, 4, 4, 16))
    dec = DecoderDSCN(compressed_channel=16)
    out = dec.apply(dec.init(KEY, lat), lat)
    assert out.shape == (1, 32, 32, 3)

    dec_o = DecoderOriginal(snr=20.0, compressed_channel=16)
    out = dec_o.apply(dec_o.init(KEY, lat), lat)
    assert out.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_conditional_vae_end_to_end():
    model = ConditionalVAE(in_channels=3, embedding_dim=4,
                           compressed_channel=8, img_size=32)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y = jax.nn.one_hot(jnp.array([0, 2]), 4)
    params = model.init({"params": KEY, "latent": KEY}, x, y)
    recons, xin, mu, log_var = model.apply(
        params, x, y, rngs={"latent": jax.random.PRNGKey(7)})
    assert recons.shape == x.shape
    assert mu.shape == log_var.shape == (2, model.latent_dim)
    # tanh output range
    assert np.all(np.abs(np.asarray(recons)) <= 1.0)
    losses = vae_loss(recons, xin, mu, log_var, kld_weight=0.01)
    assert np.isfinite(float(losses["loss"]))

    samples = model.apply(params, 2, y, jax.random.PRNGKey(9),
                          method=model.sample)
    assert samples.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_vit_codec_encoder_decoder_mirror():
    size, dim = 16, 32
    x = jax.random.normal(KEY, (1, size * size, dim))
    ctx = jax.random.normal(KEY, (1, 4, 2 * dim))
    enc = ViTEncoder(input_size=size, patch_dim=dim, layer_depth=2)
    p = enc.init(KEY, x, ctx)
    lat = enc.apply(p, x, ctx)
    assert lat.shape == (1, (size // 4) ** 2, 4 * dim)

    dec = ViTDecoder(input_size=size // 4, patch_dim=4 * dim, layer_depth=2)
    pd = dec.init(KEY, lat, ctx)
    out = dec.apply(pd, lat, ctx)
    assert out.shape == (1, size * size, dim)


@pytest.mark.slow
def test_somanet_pe_forward():
    model = SOMANetPE(compressed_channel=8, img_size=32, n_irs=4, csi_bound=30)
    images = jax.random.normal(KEY, (2, 1, 32, 32, 3))
    pairs = jnp.array([[0, 1], [2, 3]])
    rng = np.random.default_rng(1)
    envs = jnp.asarray(rng.standard_normal((4, 4, 1))
                       + 1j * rng.standard_normal((4, 4, 1))).astype(jnp.complex64)
    params = model.init(KEY, images, pairs, envs)
    out = model.apply(params, images, pairs, envs, key=jax.random.PRNGKey(11))
    assert out.shape == (2, 1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
