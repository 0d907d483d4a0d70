"""Constellation mapping and soft demapping (max-log LLR).

Replicates ieee802_11.chunks_to_symbols (wifi_phy_hier.grc:518-532) on the
TX side and the hard/soft demapper inside ieee802_11.frame_equalizer /
decode_mac on the RX side, as batched JAX table lookups.

LLR sign convention: llr = d0 - d1 (min squared distance to a bit-0 point
minus min squared distance to a bit-1 point), so llr > 0 means bit 1 is more
likely. Punctured positions use llr = 0 (erasure).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import params


@functools.cache
def _point_bits(n_bpsc: int) -> np.ndarray:
    """(M, n_bpsc) bit matrix of each constellation point's label, in
    transmission order (bit 0 = first transmitted = MSB of the index)."""
    m = 2**n_bpsc
    v = np.arange(m, dtype=np.uint32)
    return ((v[:, None] >> (n_bpsc - 1 - np.arange(n_bpsc))) & 1).astype(np.int8)


def map_bits(bits: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """(..., n*n_bpsc) bits -> (..., n) complex constellation symbols."""
    n_bpsc = int(params.MCS_N_BPSC[mcs])
    table = jnp.asarray(params.constellation(n_bpsc))
    b = bits.reshape(bits.shape[:-1] + (-1, n_bpsc)).astype(jnp.int32)
    weights = 1 << (n_bpsc - 1 - jnp.arange(n_bpsc))
    idx = jnp.sum(b * weights, axis=-1)
    return table[idx]


def demap_llr(symbols: jnp.ndarray, mcs: int, csi: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max-log LLRs for equalized symbols.

    symbols: (..., n) complex, nominally on the unit-power constellation.
    csi: optional (..., n) real reliability weights (e.g. |H|^2 per carrier)
         multiplied into the LLRs so faded carriers count less.
    Returns (..., n*n_bpsc) float32 LLRs (>0 favors bit 1).
    """
    n_bpsc = int(params.MCS_N_BPSC[mcs])
    points = jnp.asarray(params.constellation(n_bpsc))          # (M,)
    pbits = jnp.asarray(_point_bits(n_bpsc))                    # (M, n_bpsc)
    d = jnp.abs(symbols[..., None] - points) ** 2               # (..., n, M)
    big = jnp.float32(1e9)
    # min distance over points with bit b = 0 / 1, per bit position
    mask1 = (pbits == 1).astype(jnp.float32)                    # (M, n_bpsc)
    d0 = jnp.min(d[..., None] + big * mask1, axis=-2)           # (..., n, n_bpsc)
    d1 = jnp.min(d[..., None] + big * (1.0 - mask1), axis=-2)
    llr = (d0 - d1).astype(jnp.float32)
    if csi is not None:
        llr = llr * csi[..., None].astype(jnp.float32)
    return llr.reshape(symbols.shape[:-1] + (symbols.shape[-1] * n_bpsc,))


def decide(symbols: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """Nearest constellation point per symbol (hard decision), same shape.

    Used by the decision-directed equalizer trackers (LMS/STA) and the
    SNR probe.
    """
    n_bpsc = int(params.MCS_N_BPSC[mcs])
    points = jnp.asarray(params.constellation(n_bpsc))
    idx = jnp.argmin(jnp.abs(symbols[..., None] - points) ** 2, axis=-1)
    return points[idx]


def demap_hard(symbols: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """Nearest-point hard decisions -> (..., n*n_bpsc) bits (uint8)."""
    n_bpsc = int(params.MCS_N_BPSC[mcs])
    points = jnp.asarray(params.constellation(n_bpsc))
    pbits = jnp.asarray(_point_bits(n_bpsc))
    idx = jnp.argmin(jnp.abs(symbols[..., None] - points) ** 2, axis=-1)
    bits = pbits[idx]                                           # (..., n, n_bpsc)
    return bits.reshape(symbols.shape[:-1] + (symbols.shape[-1] * n_bpsc,)).astype(jnp.uint8)
