"""SIGNAL field (802.11a 17.3.4) encode/decode.

Replicates digital.packet_headergenerator_bb with the ieee802_11.signal_field
formatter (wifi_phy_hier.grc:36-44,425-441) on TX, and the SIGNAL decoding
inside ieee802_11.frame_equalizer on RX.

24 bits: RATE (4, Table 80) | reserved 0 | LENGTH (12, LSB first) | even
PARITY over bits 0..16 | 6 zero tail bits. BCC rate 1/2 (never scrambled,
never punctured), BPSK interleaved as one 48-bit OFDM symbol.
"""

from __future__ import annotations

import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import bits as bitops
from gnuradio_wifi_imagetransfer_tpu.phy import mapping, params, viterbi

_BPSK_MCS = 0  # interleaver/mapper run with BPSK tables (NCBPS=48)


def signal_bits(mcs: int, length: jnp.ndarray) -> jnp.ndarray:
    """Uncoded 24 SIGNAL bits. length: (...,) PSDU byte count (traced ok)."""
    rate = jnp.asarray(params.MCS_RATE_BITS[mcs], dtype=jnp.uint8)
    batch = length.shape
    rate_b = jnp.broadcast_to(rate, batch + (4,))
    reserved = jnp.zeros(batch + (1,), dtype=jnp.uint8)
    len_b = ((length[..., None] >> jnp.arange(12)) & 1).astype(jnp.uint8)
    parity = (jnp.sum(rate_b, axis=-1) + jnp.sum(len_b, axis=-1)) % 2
    tail = jnp.zeros(batch + (6,), dtype=jnp.uint8)
    return jnp.concatenate(
        [rate_b, reserved, len_b, parity[..., None].astype(jnp.uint8), tail], axis=-1
    )


def encode(mcs: int, length: jnp.ndarray) -> jnp.ndarray:
    """SIGNAL bits -> 48 BPSK symbols (one OFDM symbol's data carriers)."""
    raw = signal_bits(mcs, length)
    coded = bitops.conv_encode(raw)                       # (..., 48)
    inter = bitops.interleave(coded, _BPSK_MCS)
    return mapping.map_bits(inter, _BPSK_MCS)             # (..., 48) complex


def decode(symbols: jnp.ndarray):
    """Decode equalized SIGNAL symbols (..., 48) -> dict of fields.

    Returns rate_idx (MCS 0..7, or -1 if the RATE bits are invalid),
    length (PSDU bytes), parity_ok (bool). Soft decoding via LLRs.
    """
    llr = mapping.demap_llr(symbols, _BPSK_MCS)           # (..., 48)
    deint = bitops.deinterleave(llr, _BPSK_MCS)
    raw = viterbi.decode(deint, 24, terminated=True)      # (..., 24)
    rate_bits = raw[..., 0:4].astype(jnp.int32)
    table = jnp.asarray(params.MCS_RATE_BITS)             # (8, 4)
    match = jnp.all(rate_bits[..., None, :] == table, axis=-1)   # (..., 8)
    rate_idx = jnp.where(jnp.any(match, axis=-1), jnp.argmax(match, axis=-1), -1)
    length = jnp.sum(raw[..., 5:17].astype(jnp.int32) << jnp.arange(12), axis=-1)
    parity_ok = (jnp.sum(raw[..., 0:18].astype(jnp.int32), axis=-1) % 2) == 0
    tail_ok = jnp.all(raw[..., 18:24] == 0, axis=-1)
    return {
        "rate_idx": rate_idx.astype(jnp.int32),
        "length": length,
        "parity_ok": jnp.logical_and(parity_ok, tail_ok),
        "raw_bits": raw,
    }
