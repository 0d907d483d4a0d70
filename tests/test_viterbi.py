"""Viterbi decoder tests: noiseless, bit errors, puncturing, soft decisions."""

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_wifi_imagetransfer_tpu.phy import bits, viterbi


def _encode_terminated(b):
    """Append 6 zero tail bits and conv-encode."""
    full = np.concatenate([b, np.zeros(6, np.uint8)])
    return np.array(bits.conv_encode(jnp.asarray(full))), full


def _to_llr(coded, flip=()):
    llr = 2.0 * coded.astype(np.float32) - 1.0
    for i in flip:
        llr[i] = -llr[i]
    return llr


def test_noiseless_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, 90, dtype=np.uint8)
    coded, full = _encode_terminated(b)
    out = np.array(viterbi.decode(jnp.asarray(_to_llr(coded)), 96, terminated=True))
    assert np.array_equal(out, full)


def test_corrects_scattered_bit_errors():
    rng = np.random.default_rng(1)
    b = rng.integers(0, 2, 120, dtype=np.uint8)
    coded, full = _encode_terminated(b)
    # flip 8 well-separated coded bits: free distance 10 at rate 1/2 handles this
    flips = list(range(10, 250, 31))[:8]
    out = np.array(viterbi.decode(jnp.asarray(_to_llr(coded, flips)), 126, terminated=True))
    assert np.array_equal(out, full)


def test_soft_information_beats_hard():
    # weak (low-confidence) wrong bits should be overridden by strong
    # correct neighbors — make 12 errors but with tiny magnitude
    rng = np.random.default_rng(2)
    b = rng.integers(0, 2, 120, dtype=np.uint8)
    coded, full = _encode_terminated(b)
    llr = _to_llr(coded)
    err = rng.choice(len(llr), size=12, replace=False)
    llr[err] *= -0.05
    out = np.array(viterbi.decode(jnp.asarray(llr), 126, terminated=True))
    assert np.array_equal(out, full)


@pytest.mark.parametrize("rate", ["2/3", "3/4"])
def test_punctured_roundtrip(rate):
    rng = np.random.default_rng(3)
    b = rng.integers(0, 2, 138, dtype=np.uint8)
    coded, full = _encode_terminated(b)
    kept = bits.puncture(jnp.asarray(_to_llr(coded)), rate)
    mother = bits.depuncture(kept, rate, len(coded))
    out = np.array(viterbi.decode(mother, 144, terminated=True))
    assert np.array_equal(out, full)


def test_batched_decode():
    rng = np.random.default_rng(4)
    b = rng.integers(0, 2, (5, 42), dtype=np.uint8)
    fulls, llrs = [], []
    for row in b:
        coded, full = _encode_terminated(row)
        fulls.append(full)
        llrs.append(_to_llr(coded))
    out = np.array(viterbi.decode(jnp.asarray(np.stack(llrs)), 48, terminated=True))
    assert np.array_equal(out, np.stack(fulls))


def test_unterminated_mode():
    rng = np.random.default_rng(5)
    b = rng.integers(0, 2, 64, dtype=np.uint8)
    coded = np.array(bits.conv_encode(jnp.asarray(b)))
    out = np.array(viterbi.decode(jnp.asarray(_to_llr(coded)), 64, terminated=False))
    assert np.array_equal(out, b)
