"""Bit-level 802.11a operations: scrambler, convolutional encoder,
puncturing, interleaving — vectorized JAX, batch-first, static shapes.

Replicates the TX bit pipeline of ieee802_11.mapper and the inverse path in
ieee802_11.decode_mac (reference instantiation: wifi_phy_hier.grc:570-586,
533-549; behavior fixed by 802.11a-1999 §17.3.5).

Design notes (TPU-first):
  * The scrambler is NOT a sequential LFSR here: every nonzero seed walks the
    same 127-state cycle, so scrambling is an XOR against a phase-rolled
    precomputed 127-bit sequence. The phase lookup makes the seed a traced
    value while shapes stay static.
  * The convolutional encoder is a pure XOR of shifted views (no scan).
  * Puncturing / interleaving are precomputed numpy index tables gathered
    with jnp.take — the mapper's bit shuffles become single XLA gathers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import params

# ---------------------------------------------------------------------------
# Scrambler (17.3.5.4)
# ---------------------------------------------------------------------------


@functools.cache
def _scrambler_cycle() -> tuple[np.ndarray, np.ndarray]:
    """(seq, phase_of_state): seq = 127-bit output cycle starting from the
    all-ones state; phase_of_state[s] = index i such that starting the LFSR
    in state s produces seq[i:] (cyclically)."""
    state = 0x7F
    seq = np.empty(127, dtype=np.uint8)
    phase = np.zeros(128, dtype=np.int32)
    for i in range(127):
        phase[state] = i
        fb = ((state >> 6) ^ (state >> 3)) & 1
        seq[i] = fb
        state = ((state << 1) | fb) & 0x7F
    return seq, phase


def scrambler_bits(n: int, seed) -> jnp.ndarray:
    """First ``n`` scrambler output bits for a (traced) 7-bit ``seed``."""
    seq, phase = _scrambler_cycle()
    start = jnp.asarray(phase)[seed]
    return jnp.asarray(seq)[(jnp.arange(n) + start) % 127]


def scramble(bits: jnp.ndarray, seed) -> jnp.ndarray:
    """XOR ``bits`` (..., n) with the scrambler sequence for ``seed``."""
    n = bits.shape[-1]
    return bits ^ scrambler_bits(n, seed).astype(bits.dtype)


def descramble(bits: jnp.ndarray) -> jnp.ndarray:
    """Self-synchronizing descramble: the 16-bit SERVICE field is transmitted
    as zeros, so the first 7 received (scrambled) bits ARE the scrambler
    output; they determine the LFSR phase. Mirrors decode_mac's descrambler.

    bits: (..., n) descrambled in the trailing axis; returns same shape.
    """
    seq, _ = _scrambler_cycle()
    n = bits.shape[-1]
    # Find the phase whose first 7 outputs match the first 7 received bits.
    # Precompute all 127 length-7 windows of the cycle.
    windows = np.stack([np.roll(seq, -i)[:7] for i in range(127)])  # (127, 7)
    first7 = bits[..., :7].astype(jnp.int32)                        # (..., 7)
    w = jnp.asarray(windows, dtype=jnp.int32)                       # (127, 7)
    match = jnp.all(first7[..., None, :] == w, axis=-1)             # (..., 127)
    phase = jnp.argmax(match, axis=-1)                              # (...,)
    idx = (jnp.arange(n) + phase[..., None]) % 127                  # (..., n)
    return bits ^ jnp.asarray(seq)[idx].astype(bits.dtype)


# ---------------------------------------------------------------------------
# Convolutional encoder (17.3.5.5) — K=7, g0=0133, g1=0171
# ---------------------------------------------------------------------------


def conv_encode(bits: jnp.ndarray) -> jnp.ndarray:
    """Rate-1/2 mother-code output, interleaved pairs A1 B1 A2 B2 ...

    bits: (..., n) in {0,1}; returns (..., 2n). Initial register state 0;
    the caller appends the 6 zero tail bits that terminate the trellis.
    Pure shifted-XOR — no sequential dependency.
    """
    n = bits.shape[-1]
    pad = jnp.zeros(bits.shape[:-1] + (6,), dtype=bits.dtype)
    x = jnp.concatenate([pad, bits], axis=-1)  # x[..., i+6] = bits[i]
    i = jnp.arange(n) + 6
    # g0 = 133o: delays 0,2,3,5,6 ; g1 = 171o: delays 0,1,2,3,6
    a = (x[..., i] ^ x[..., i - 2] ^ x[..., i - 3] ^ x[..., i - 5] ^ x[..., i - 6])
    b = (x[..., i] ^ x[..., i - 1] ^ x[..., i - 2] ^ x[..., i - 3] ^ x[..., i - 6])
    out = jnp.stack([a, b], axis=-1)            # (..., n, 2)
    return out.reshape(bits.shape[:-1] + (2 * n,))


# ---------------------------------------------------------------------------
# Puncturing (17.3.5.6)
# ---------------------------------------------------------------------------


@functools.cache
def puncture_indices(rate: str, n_mother: int) -> np.ndarray:
    """Indices of mother-code bits that survive puncturing (static)."""
    pattern = params.PUNCTURE_PATTERNS[rate]
    reps = int(np.ceil(n_mother / pattern.size))
    mask = np.tile(pattern, reps)[:n_mother]
    return np.nonzero(mask)[0].astype(np.int32)


def puncture(coded: jnp.ndarray, rate: str) -> jnp.ndarray:
    """Gather surviving bits: (..., 2n) -> (..., n_kept)."""
    idx = jnp.asarray(puncture_indices(rate, coded.shape[-1]))
    return jnp.take(coded, idx, axis=-1)


def depuncture(llrs: jnp.ndarray, rate: str, n_mother: int) -> jnp.ndarray:
    """Scatter received LLRs back to mother-code positions; punctured
    positions get LLR 0 (erasure). (..., n_kept) -> (..., n_mother)."""
    idx = puncture_indices(rate, n_mother)
    out = jnp.zeros(llrs.shape[:-1] + (n_mother,), dtype=llrs.dtype)
    return out.at[..., jnp.asarray(idx)].set(llrs)


# ---------------------------------------------------------------------------
# Interleaving (17.3.5.7)
# ---------------------------------------------------------------------------


@functools.cache
def _tiled_perm(mcs: int, n_sym: int, inverse: bool) -> np.ndarray:
    """Gather index over n_sym symbols.

    Interleaving scatters in[k] -> out[perm[k]]; as a gather that is
    out[j] = in[inv[j]] with inv = deinterleaver_perm. Deinterleaving is the
    gather out[k] = in[perm[k]] with perm = interleaver_perm.
    """
    n_cbps = int(params.MCS_N_CBPS[mcs])
    base = params.interleaver_perm(mcs) if inverse else params.deinterleaver_perm(mcs)
    offs = np.arange(n_sym, dtype=np.int64)[:, None] * n_cbps
    return (base[None, :] + offs).reshape(-1).astype(np.int32)


def interleave(bits: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """Per-symbol two-permutation interleaver. (..., n_sym*n_cbps)."""
    n_cbps = int(params.MCS_N_CBPS[mcs])
    n_sym = bits.shape[-1] // n_cbps
    idx = jnp.asarray(_tiled_perm(mcs, n_sym, inverse=False))
    return jnp.take(bits, idx, axis=-1)


def deinterleave(vals: jnp.ndarray, mcs: int) -> jnp.ndarray:
    """Inverse interleaver; works on bits or LLRs. (..., n_sym*n_cbps)."""
    n_cbps = int(params.MCS_N_CBPS[mcs])
    n_sym = vals.shape[-1] // n_cbps
    idx = jnp.asarray(_tiled_perm(mcs, n_sym, inverse=True))
    return jnp.take(vals, idx, axis=-1)


# ---------------------------------------------------------------------------
# Byte <-> bit packing (LSB-first per 802.11 octet transmission order)
# ---------------------------------------------------------------------------


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """(..., n_bytes) uint8 -> (..., 8*n_bytes) bits, LSB of each byte first
    (802.11 transmits octets LSB-first)."""
    shifts = jnp.arange(8, dtype=data.dtype)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(data.shape[:-1] + (data.shape[-1] * 8,)).astype(jnp.uint8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8*n) bits -> (..., n) uint8, LSB-first."""
    b = bits.reshape(bits.shape[:-1] + (-1, 8)).astype(jnp.uint32)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)
