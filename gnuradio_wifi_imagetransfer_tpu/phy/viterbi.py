"""Soft-decision Viterbi decoder for the 802.11a K=7 convolutional code.

Replaces the Viterbi inside ieee802_11.decode_mac (wifi_phy_hier.grc:533-549)
with a batch-vectorized JAX implementation: the 64-state add-compare-select
recursion runs as a `lax.scan` over bit steps with all states and the whole
frame batch vectorized per step; traceback is a reverse scan over stored
per-step decisions.

A Pallas TPU kernel for the ACS hot loop lives in ops/pallas_viterbi.py; this
module is the XLA reference path and the correctness oracle for it.

Metric convention: inputs are LLR pairs (llr_a, llr_b) per trellis step where
llr > 0 favors coded bit 1 (see mapping.demap_llr); the decoder maximizes the
correlation  sum_i llr_i * coded_bit_i  — depunctured (erased) positions
carry llr = 0 and thus do not influence the path.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import params


def _use_pallas() -> bool:
    """Trace-time choice of the ACS backend.

    Default: the Pallas kernel on TPU backends, the XLA scan elsewhere.
    Override with GWT_PALLAS_VITERBI=0/1 (0 forces XLA, 1 forces Pallas).
    """
    flag = os.environ.get("GWT_PALLAS_VITERBI")
    if flag is not None:
        return flag not in ("0", "false", "")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _tables():
    # NOTE: deliberately NOT cached as jnp arrays — jnp.asarray inside a
    # jit trace yields tracers, and caching those leaks them across traces.
    # conv_tables() itself is cached numpy; the conversions below fold to
    # constants under jit.
    t = params.conv_tables()
    return (
        jnp.asarray(t["prev_state"]),   # (64, 2)
        jnp.asarray(t["prev_bit"]),     # (64, 2)
        jnp.asarray(t["prev_out0"].astype(np.float32)),
        jnp.asarray(t["prev_out1"].astype(np.float32)),
    )


def decode(llrs: jnp.ndarray, n_bits: int, terminated: bool = True) -> jnp.ndarray:
    """Viterbi-decode soft mother-code LLRs.

    llrs: (..., 2*n_bits) float LLRs in A1 B1 A2 B2 ... order (depunctured).
    n_bits: number of information bits (static).
    terminated: if True the encoder was flushed with >=6 zero tail bits, so
      traceback starts from state 0; otherwise from the best end state.

    Returns (..., n_bits) uint8 decoded bits.
    """
    if terminated and _use_pallas():
        from gnuradio_wifi_imagetransfer_tpu.ops import pallas_viterbi

        return pallas_viterbi.decode(llrs, n_bits)
    prev_state, prev_bit, prev_out0, prev_out1 = _tables()
    batch_shape = llrs.shape[:-1]
    x = llrs.reshape((-1, n_bits, 2)).transpose(1, 0, 2)        # (n, B, 2)
    b = x.shape[1]

    neg_inf = jnp.float32(-1e30)
    pm0 = jnp.full((b, params.N_STATES), neg_inf, dtype=jnp.float32)
    pm0 = pm0.at[:, 0].set(0.0)                                  # start in state 0

    def step(pm, llr_pair):
        # llr_pair: (B, 2). Correlation gain of each incoming transition:
        # gain[ns, k] = llr_a * out0[ns,k] + llr_b * out1[ns,k]
        gain = (llr_pair[:, 0:1, None] * prev_out0[None]
                + llr_pair[:, 1:2, None] * prev_out1[None])      # (B, 64, 2)
        cand = pm[:, prev_state] + gain                          # (B, 64, 2)
        dec = jnp.argmax(cand, axis=-1).astype(jnp.uint8)        # (B, 64)
        pm_new = jnp.max(cand, axis=-1)
        # Normalize to prevent metric drift over long frames.
        pm_new = pm_new - jnp.max(pm_new, axis=-1, keepdims=True)
        return pm_new, dec

    pm_final, decisions = jax.lax.scan(step, pm0, x)             # decisions: (n, B, 64)

    if terminated:
        end_state = jnp.zeros((b,), dtype=jnp.int32)
    else:
        end_state = jnp.argmax(pm_final, axis=-1).astype(jnp.int32)

    bi = jnp.arange(b)

    def back(state, dec):
        k = dec[bi, state].astype(jnp.int32)                     # (B,)
        bit = prev_bit[state, k].astype(jnp.uint8)
        return prev_state[state, k].astype(jnp.int32), bit

    _, bits_rev = jax.lax.scan(back, end_state, decisions, reverse=True)
    bits = bits_rev.transpose(1, 0)                              # (B, n)
    return bits.reshape(batch_shape + (n_bits,))
