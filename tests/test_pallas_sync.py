"""Fused sync-statistics kernel vs the phy/sync.sync_stats XLA oracle
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.ops import pallas_sync
from gnuradio_wifi_imagetransfer_tpu.phy import sync, tx


def _check(x):
    a_o, p_o, c_o = (np.asarray(v) for v in sync.sync_stats(jnp.asarray(x)))
    a_k, p_k, c_k = (np.asarray(v)
                     for v in pallas_sync.sync_stats(jnp.asarray(x),
                                                     interpret=True))
    np.testing.assert_allclose(a_k, a_o, atol=2e-4)
    np.testing.assert_allclose(p_k, p_o, atol=2e-4)
    # c is a ratio; compare where the stream carries energy
    mask = p_o > 1e-3
    np.testing.assert_allclose(c_k[mask], c_o[mask], atol=1e-3)


def test_sync_stats_random_stream():
    rng = np.random.default_rng(0)
    n = 5000                     # exercises row padding (not a 16384 multiple)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    _check(x)


def test_sync_stats_real_preamble_plateau():
    """On an actual 802.11a burst the kernel's ratio must show the same
    STF plateau the detector triggers on."""
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 50, dtype=np.uint8)
    burst = np.asarray(tx.transmit(jnp.asarray(payload)[None], 2))[0]
    x = np.zeros(4096, np.complex64)
    x[500 : 500 + burst.size] = 0.5 * burst
    x += (0.01 * (rng.standard_normal(4096) + 1j * rng.standard_normal(4096))
          ).astype(np.complex64)
    _check(x)
    _, _, c = pallas_sync.sync_stats(jnp.asarray(x), interpret=True)
    c = np.asarray(c)
    assert c[560:640].min() > 0.56       # plateau inside the STF
    assert c[:400].max() < 0.56          # silence below threshold


def test_sync_stats_batched():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 3000)) + 1j * rng.standard_normal((2, 3000))
         ).astype(np.complex64)
    _check(x)
