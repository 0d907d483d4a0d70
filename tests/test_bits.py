"""Unit tests for scrambler / convolutional code / puncture / interleave."""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.phy import bits, params


def _conv_ref(bb):
    """Bit-serial reference encoder (slow NumPy oracle)."""
    state, out = 0, []
    for x in bb:
        reg = (int(x) << 6) | state
        out.append(bin(reg & params.G0).count("1") & 1)
        out.append(bin(reg & params.G1).count("1") & 1)
        state = (state >> 1) | (int(x) << 5)
    return np.array(out, dtype=np.uint8)


def _scramble_ref(bb, seed):
    """Bit-serial reference scrambler (17.3.5.4)."""
    state = [(seed >> i) & 1 for i in range(7)]
    out = []
    for x in bb:
        fb = state[6] ^ state[3]
        out.append(int(x) ^ fb)
        state = [fb] + state[:6]
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("seed", [1, 0x2A, 0x5D, 0x7F])
def test_scramble_matches_lfsr_reference(seed):
    rng = np.random.default_rng(seed)
    b = rng.integers(0, 2, 300, dtype=np.uint8)
    got = np.array(bits.scramble(jnp.asarray(b), jnp.int32(seed)))
    assert np.array_equal(got, _scramble_ref(b, seed))


@pytest.mark.parametrize("seed", [1, 33, 127])
def test_descramble_recovers_from_service_field(seed):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 2, 250, dtype=np.uint8)
    raw = np.concatenate([np.zeros(16, np.uint8), payload])
    scrambled = bits.scramble(jnp.asarray(raw), jnp.int32(seed))
    back = np.array(bits.descramble(scrambled))
    assert np.array_equal(back, raw)


def test_descramble_batched():
    rng = np.random.default_rng(7)
    raws = np.concatenate(
        [np.zeros((5, 16), np.uint8), rng.integers(0, 2, (5, 100), dtype=np.uint8)], axis=1
    )
    scr = np.stack(
        [np.array(bits.scramble(jnp.asarray(r), jnp.int32(s)))
         for r, s in zip(raws, [1, 2, 3, 100, 127])]
    )
    back = np.array(bits.descramble(jnp.asarray(scr)))
    assert np.array_equal(back, raws)


def test_conv_encode_matches_reference():
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, 200, dtype=np.uint8)
    got = np.array(bits.conv_encode(jnp.asarray(b)))
    assert np.array_equal(got, _conv_ref(b))


def test_conv_encode_batched():
    rng = np.random.default_rng(1)
    b = rng.integers(0, 2, (3, 64), dtype=np.uint8)
    got = np.array(bits.conv_encode(jnp.asarray(b)))
    for i in range(3):
        assert np.array_equal(got[i], _conv_ref(b[i]))


@pytest.mark.parametrize("rate,kept", [("1/2", 48), ("2/3", 36), ("3/4", 32)])
def test_puncture_rates(rate, kept):
    x = jnp.arange(1.0, 49.0)
    p = bits.puncture(x, rate)
    assert p.shape[-1] == kept
    d = np.array(bits.depuncture(p, rate, 48))
    idx = bits.puncture_indices(rate, 48)
    assert np.array_equal(d[idx], np.array(p))
    mask = np.ones(48, bool)
    mask[idx] = False
    assert np.all(d[mask] == 0)


def test_puncture_34_pattern():
    # 3/4: transmit A1 B1 A2 B3 out of (A1 B1 A2 B2 A3 B3)
    idx = bits.puncture_indices("3/4", 12)
    assert list(idx) == [0, 1, 2, 5, 6, 7, 8, 11]


@pytest.mark.parametrize("mcs", range(8))
def test_interleave_roundtrip(mcs):
    rng = np.random.default_rng(mcs)
    ncbps = int(params.MCS_N_CBPS[mcs])
    x = rng.integers(0, 2, (2, 3 * ncbps), dtype=np.uint8)
    y = bits.interleave(jnp.asarray(x), mcs)
    z = np.array(bits.deinterleave(y, mcs))
    assert np.array_equal(z, x)
    # interleaving must act within each symbol independently
    y_sym = np.array(bits.interleave(jnp.asarray(x[:, :ncbps]), mcs))
    assert np.array_equal(np.array(y)[:, :ncbps], y_sym)


def test_byte_bit_roundtrip_lsb_first():
    d = np.array([0x01, 0x80, 0xAB], dtype=np.uint8)
    b = np.array(bits.bytes_to_bits(jnp.asarray(d)))
    # LSB-first: 0x01 -> 1,0,0,0,0,0,0,0
    assert list(b[:8]) == [1, 0, 0, 0, 0, 0, 0, 0]
    assert list(b[8:16]) == [0, 0, 0, 0, 0, 0, 0, 1]
    back = np.array(bits.bits_to_bytes(jnp.asarray(b)))
    assert np.array_equal(back, d)
