"""802.11a TX chain: PSDU bytes -> baseband sample burst.

Replicates the reference TX path (SURVEY.md §3.1): ieee802_11.mapper
(scramble / BCC encode / puncture / interleave, wifi_phy_hier.grc:570-586),
chunks_to_symbols (grc:518-532), the SIGNAL header (grc:425-441),
carrier allocation + IFFT + CP (grc:336-479), amplitude scaling
(IRS_user.py:196) and foo.packet_pad2 zero padding (IRS_user.py:193-194) —
as one jit-compiled, vmap-able frame-batch function with static shapes.

Compilation model: (mcs, psdu_len) fix every shape, so each (MCS, length
bucket) compiles once; the frame batch is the leading axis.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import bits as bitops
from gnuradio_wifi_imagetransfer_tpu.phy import mapping, ofdm, params, signal_field


@dataclasses.dataclass(frozen=True)
class TxPlan:
    """Static sizes for one (MCS, PSDU length) combination."""

    mcs: int
    psdu_len: int                 # bytes

    @property
    def rate(self) -> str:
        return params.MCS_RATE_STR[self.mcs]

    @property
    def n_dbps(self) -> int:
        return int(params.MCS_N_DBPS[self.mcs])

    @property
    def n_cbps(self) -> int:
        return int(params.MCS_N_CBPS[self.mcs])

    @property
    def n_sym(self) -> int:
        return params.n_symbols(self.mcs, self.psdu_len)

    @property
    def n_data_bits(self) -> int:
        """Total scrambled bits incl. service, tail and pad (17.3.5.3)."""
        return self.n_sym * self.n_dbps

    @property
    def n_pad_bits(self) -> int:
        return self.n_data_bits - (
            params.N_SERVICE_BITS + 8 * self.psdu_len + params.N_TAIL_BITS
        )

    @property
    def n_coded_bits(self) -> int:
        return self.n_sym * self.n_cbps

    @property
    def n_samples(self) -> int:
        """Burst length: 4 preamble + 1 SIGNAL + n_sym data symbols x 80,
        plus the single rolloff tail sample."""
        return (4 + 1 + self.n_sym) * params.N_SYM + 1


def _tx_body(plan: TxPlan):
    def tx(psdu: jnp.ndarray, scrambler_seed: jnp.ndarray) -> jnp.ndarray:
        batch = psdu.shape[:-1]
        data_bits = bitops.bytes_to_bits(psdu)                     # (..., 8L)
        zeros = lambda n: jnp.zeros(batch + (n,), dtype=jnp.uint8)
        raw = jnp.concatenate(
            [zeros(params.N_SERVICE_BITS), data_bits,
             zeros(params.N_TAIL_BITS), zeros(plan.n_pad_bits)], axis=-1)
        scrambled = bitops.scramble(raw, scrambler_seed)
        # Reset the 6 tail bits post-scrambling so the trellis terminates
        # in state 0 (17.3.5.2 note / mapper behavior).
        tail_at = params.N_SERVICE_BITS + 8 * plan.psdu_len
        scrambled = scrambled.at[..., tail_at : tail_at + params.N_TAIL_BITS].set(0)
        coded = bitops.conv_encode(scrambled)
        punctured = bitops.puncture(coded, plan.rate)
        interleaved = bitops.interleave(punctured, plan.mcs)
        syms = mapping.map_bits(interleaved, plan.mcs)             # (..., n_sym*48)
        syms = syms.reshape(batch + (plan.n_sym, params.N_DATA_CARRIERS))

        length = jnp.full(batch, plan.psdu_len, dtype=jnp.int32)
        sig = signal_field.encode(plan.mcs, length)                # (..., 48)
        sig_freq = ofdm.allocate_carriers(sig[..., None, :], symbol_index0=0)
        data_freq = ofdm.allocate_carriers(syms, symbol_index0=1)
        return ofdm.assemble_burst(sig_freq, data_freq)            # (..., n_samples)

    return tx


def transmit_traced(psdu: jnp.ndarray, plan: TxPlan,
                    scrambler_seed: jnp.ndarray | None = None) -> jnp.ndarray:
    """Traceable TX for use INSIDE jitted programs (e.g. the loopback
    radio): (B, L) uint8 -> (B, n_samples) complex64. Per-frame scrambler
    seeds default to 1..B (mod 127), like the reference mapper's counter.
    """
    b = psdu.shape[0]
    if scrambler_seed is None:
        scrambler_seed = (jnp.arange(b, dtype=jnp.int32) % 127) + 1
    return jax.vmap(_tx_body(plan))(psdu, scrambler_seed)


@functools.lru_cache(maxsize=64)
def _jitted_tx(mcs: int, psdu_len: int):
    plan = TxPlan(mcs, psdu_len)
    return jax.jit(_tx_body(plan)), plan


def transmit(psdu: jnp.ndarray, mcs: int, scrambler_seed: int | jnp.ndarray = 1) -> jnp.ndarray:
    """PSDU byte frames -> baseband bursts.

    psdu: (..., L) uint8. Returns (..., n_samples) complex64. The scrambler
    seed may be per-frame (the reference mapper increments it 1..127 per
    frame) or a scalar.
    """
    fn, plan = _jitted_tx(int(mcs), int(psdu.shape[-1]))
    batch = psdu.shape[:-1]
    flat = psdu.reshape(-1, psdu.shape[-1])
    seeds = jnp.broadcast_to(
        jnp.asarray(scrambler_seed, dtype=jnp.int32), batch
    ).reshape(-1)
    out = jax.vmap(fn)(flat, seeds)
    return out.reshape(batch + out.shape[-1:])


def tx_plan(mcs: int, psdu_len: int) -> TxPlan:
    return TxPlan(int(mcs), int(psdu_len))


def pad_burst(samples: jnp.ndarray, pad_front: int = 100, pad_tail: int = 1000,
              scale: float = 0.5) -> jnp.ndarray:
    """Amplitude scale + zero padding around a burst.

    Mirrors blocks.multiply_const_cc(0.5) (IRS_user.py:196) and
    foo.packet_pad2(pad_front=100, pad_tail=1000) (IRS_user.py:193-194).
    """
    batch = samples.shape[:-1]
    z = lambda n: jnp.zeros(batch + (n,), dtype=samples.dtype)
    return jnp.concatenate([z(pad_front), samples * scale, z(pad_tail)], axis=-1)
