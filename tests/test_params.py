"""Golden-value tests for the 802.11a constant layer.

Expected values are the instantiation parameters captured from the reference
flowgraph (wifi_phy_hier.grc:336-405) and the 802.11a standard tables.
"""

import numpy as np

from gnuradio_wifi_imagetransfer_tpu.phy import params


def test_data_carrier_count_and_values():
    assert params.DATA_CARRIERS.shape == (48,)
    # wifi_phy_hier.grc:346-348 occupied_carriers expression
    expected = (
        list(range(-26, -21)) + list(range(-20, -7)) + list(range(-6, 0))
        + list(range(1, 7)) + list(range(8, 21)) + list(range(22, 27))
    )
    assert list(params.DATA_CARRIERS) == expected
    assert list(params.PILOT_CARRIERS) == [-21, -7, 7, 21]
    # data and pilot sets are disjoint, none at DC
    assert not set(params.DATA_CARRIERS) & set(params.PILOT_CARRIERS)
    assert 0 not in set(params.DATA_CARRIERS)


def test_polarity_matches_grc_pilot_symbols():
    # First 16 tuples at wifi_phy_hier.grc:350ff are (1,1,1,-1)*polarity with
    # polarity 1,1,1,1,-1,-1,-1,1,-1,-1,-1,-1,1,1,-1,1
    expected = [1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1, 1, 1, -1, 1]
    assert list(params.POLARITY[:16].astype(int)) == expected
    assert params.POLARITY.shape == (127,)
    # m-sequence balance: 64 ones in the bit sequence -> polarity sums to -1
    assert int(params.POLARITY.sum()) == -1


def test_stf_freq_matches_grc_sync_word():
    # wifi_phy_hier.grc sync word 1: +-1.4719601443879746*(1+1j) at carriers
    # that are multiples of 4.
    mag = np.sqrt(13.0 / 6.0)
    assert np.isclose(mag, 1.4719601443879746)
    nz = np.nonzero(params.STF_FREQ)[0]
    assert list(nz - 32) == [-24, -20, -16, -12, -8, -4, 4, 8, 12, 16, 20, 24]
    # spot-check signs from the grc tuple (position = carrier + 32)
    assert np.isclose(params.STF_FREQ[8], mag * (1 + 1j))     # carrier -24
    assert np.isclose(params.STF_FREQ[12], -mag * (1 + 1j))   # carrier -20
    assert np.isclose(params.STF_FREQ[56], mag * (1 + 1j))    # carrier +24


def test_ltf_freq_matches_grc_sync_word4():
    # grc sync word 4 (positions 6..58 around DC)
    row = params.LTF_FREQ.real.astype(int)
    assert list(row[:6]) == [0] * 6 and list(row[59:]) == [0] * 5
    assert row[32] == 0  # DC
    assert list(row[6:32]) == [1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, 1, 1,
                               -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1]
    assert list(row[33:59]) == [1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, -1, -1,
                                -1, 1, 1, -1, -1, 1, -1, 1, -1, 1, 1, 1, 1]


def test_preamble_structure():
    p = params.PREAMBLE
    assert p.shape == (320,)
    # STF: 10 identical 16-sample periods
    for k in range(1, 10):
        np.testing.assert_allclose(p[:16], p[16 * k : 16 * (k + 1)], atol=1e-6)
    # LTF: GI2 equals LTF tail; two identical 64-sample bodies
    np.testing.assert_allclose(p[160:192], p[288:320], atol=1e-6)
    np.testing.assert_allclose(p[192:256], p[256:320], atol=1e-6)
    # unit average power under the 1/sqrt(52) scaling
    assert np.isclose(np.mean(np.abs(p) ** 2), 1.0, atol=1e-3)


def test_mcs_tables():
    assert list(params.MCS_N_DBPS) == [24, 36, 48, 72, 96, 144, 192, 216]
    assert list(params.MCS_N_CBPS) == [48, 48, 96, 96, 192, 192, 288, 288]
    # BPSK-1/2 worst case that sizes the reference's buffers
    # (wifi_phy_hier.grc:51): ceil((16 + 800*8 + 6)/24) data symbols
    assert params.n_symbols(0, 800) == int(np.ceil((16 + 6400 + 6) / 24))


def test_constellation_unit_power_and_gray():
    for nb in (1, 2, 4, 6):
        c = params.constellation(nb)
        assert np.isclose(np.mean(np.abs(c) ** 2), 1.0, atol=1e-5)
        # Gray property: adjacent levels on each axis differ in exactly 1 bit
        if nb >= 2:
            half = nb // 2
            # walk points sorted by I for fixed Q-label: neighbor labels
            # differ by one bit in the I half
            for q in range(2 ** half):
                idxs = [(i << half) | q for i in range(2 ** half)]
                pts = sorted(idxs, key=lambda v: c[v].real)
                for a, b in zip(pts, pts[1:]):
                    assert bin((a >> half) ^ (b >> half)).count("1") == 1


def test_interleaver_is_permutation():
    for mcs in range(8):
        perm = params.interleaver_perm(mcs)
        assert sorted(perm) == list(range(params.MCS_N_CBPS[mcs]))
        inv = params.deinterleaver_perm(mcs)
        assert np.array_equal(inv[perm], np.arange(perm.size))


def test_interleaver_bpsk_standard_formula():
    # For BPSK (NCBPS=48, s=1): j == i == 3*(k mod 16) + k//16
    perm = params.interleaver_perm(0)
    k = np.arange(48)
    assert np.array_equal(perm, (48 // 16) * (k % 16) + k // 16)
