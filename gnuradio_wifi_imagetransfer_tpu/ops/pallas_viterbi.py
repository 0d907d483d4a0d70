"""Pallas TPU kernel for the Viterbi add-compare-select (ACS) hot loop.

The per-frame hot loop of the reference RX is the Viterbi inside
ieee802_11.decode_mac (SURVEY.md §3.2 "hot loops"; wifi_phy_hier.grc:533-549).
phy/viterbi.py is the XLA `lax.scan` reference path and the correctness
oracle; this kernel replaces its forward recursion with a single fused
Pallas program designed for the TPU memory hierarchy:

  * Path metrics live in VMEM for the whole frame: one (64 states, 128
    frame-lanes) float32 tile, persistent across grid steps (scratch).
  * The trellis predecessor gather ``pm[prev_state[ns, k]]`` — a lane/
    sublane shuffle XLA lowers poorly — becomes two static 64x64 0/1
    selection-matrix matmuls on the MXU: ``pm_prev_k = P_k @ pm``.
  * The batch dimension (frames x channels, as SURVEY.md §7 step 5
    prescribes) rides the 128-lane axis so every VPU/MXU op is full-width.
  * Per-step branch metrics are rebuilt on the fly from the two LLR planes
    (VPU outer products) — no (n, 64) gain tensor ever touches HBM.
  * Survivor decisions stream out chunk-by-chunk as uint8 (8x less HBM
    traffic than the int32 argmax the XLA path materializes).

Traceback is sequential but trivially cheap (one gather per step); it stays
in XLA — see decode() below.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnuradio_wifi_imagetransfer_tpu.phy import params

LANES = 128      # lane quantum (VPU lane width)
MAX_LANES = 512  # widest frame-batch tile per kernel invocation: the ACS
                 # recursion is matmul-LATENCY-bound (two dependent 64x64
                 # matmuls per trellis step), so widening the lane axis
                 # raises throughput almost for free until VMEM pressure —
                 # (64, 512) tiles guarantee one kernel pass for the
                 # streaming executor's 256-512-frame batches
CHUNK = 128      # trellis steps processed per grid step
_NEG = -1e30


@functools.cache
def _np_tables():
    t = params.conv_tables()
    p0 = np.zeros((64, 64), np.float32)
    p1 = np.zeros((64, 64), np.float32)
    for ns in range(64):
        p0[ns, t["prev_state"][ns, 0]] = 1.0
        p1[ns, t["prev_state"][ns, 1]] = 1.0
    # outs[:, 0:2] = (out0, out1) on the k=0 incoming edge; [:, 2:4] for k=1.
    outs = np.stack(
        [t["prev_out0"][:, 0], t["prev_out1"][:, 0],
         t["prev_out0"][:, 1], t["prev_out1"][:, 1]],
        axis=1,
    ).astype(np.float32)
    return p0, p1, outs, t["prev_state"], t["prev_bit"]


def _make_acs_kernel(lanes: int):
    def _acs_kernel(p0_ref, p1_ref, outs_ref, la_ref, lb_ref, dec_ref, pm_ref, pm):
        """One grid step = CHUNK trellis steps over the persistent VMEM metrics."""
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            state = jax.lax.broadcasted_iota(jnp.int32, (64, lanes), 0)
            pm[:] = jnp.where(state == 0, 0.0, _NEG).astype(jnp.float32)

        p0 = p0_ref[:]
        p1 = p1_ref[:]
        o00 = outs_ref[:, 0:1]   # (64, 1) out bits on the k=0 edge
        o01 = outs_ref[:, 1:2]
        o10 = outs_ref[:, 2:3]
        o11 = outs_ref[:, 3:4]

        def step(j, _):
            la = la_ref[pl.ds(j, 1), :]                   # (1, lanes)
            lb = lb_ref[pl.ds(j, 1), :]
            cur = pm[:]
            prev0 = jnp.dot(p0, cur, preferred_element_type=jnp.float32)
            prev1 = jnp.dot(p1, cur, preferred_element_type=jnp.float32)
            cand0 = prev0 + o00 * la + o01 * lb           # (64, lanes)
            cand1 = prev1 + o10 * la + o11 * lb
            # match the XLA oracle's argmax tie-break (first max -> k=0)
            dec = cand1 > cand0
            new = jnp.maximum(cand0, cand1)
            new = new - jnp.max(new, axis=0, keepdims=True)  # drift control
            pm[:] = new
            dec_ref[pl.ds(j, 1), :, :] = dec.astype(jnp.uint8)[None]
            return 0

        jax.lax.fori_loop(0, CHUNK, step, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            pm_ref[:] = pm[:]

    return _acs_kernel


def acs_forward(llr_a: jnp.ndarray, llr_b: jnp.ndarray, interpret: bool = False):
    """Run the forward ACS recursion.

    llr_a/llr_b: (n, B) float32 LLRs of the first/second mother-code bit of
    each trellis step (depunctured positions = 0). B <= MAX_LANES.
    Returns (dec, pm_final): dec (n, 64, B) uint8 survivor choices,
    pm_final (64, B) float32 metrics after the last (padded) step.
    """
    n, b = llr_a.shape
    if b > MAX_LANES:
        raise ValueError(f"batch {b} > {MAX_LANES}; tile the batch outside")
    lanes = -(-b // LANES) * LANES            # round up to the lane quantum
    n_pad = -(-n // CHUNK) * CHUNK
    la = jnp.zeros((n_pad, lanes), jnp.float32).at[:n, :b].set(llr_a)
    lb = jnp.zeros((n_pad, lanes), jnp.float32).at[:n, :b].set(llr_b)
    p0, p1, outs, _, _ = _np_tables()

    grid = (n_pad // CHUNK,)
    dec, pm_final = pl.pallas_call(
        _make_acs_kernel(lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, 64, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 64, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((64, lanes), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((64, lanes), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(outs), la, lb)
    return dec[:n, :, :b], pm_final[:, :b]


def decode(llrs: jnp.ndarray, n_bits: int, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for phy.viterbi.decode (terminated trellis only).

    llrs: (..., 2*n_bits) float LLRs in A1 B1 A2 B2 ... order (depunctured).
    Returns (..., n_bits) uint8 decoded bits.
    """
    batch_shape = llrs.shape[:-1]
    x = llrs.reshape((-1, n_bits, 2)).astype(jnp.float32)
    b = x.shape[0]
    _, _, _, prev_state_np, prev_bit_np = _np_tables()
    prev_state = jnp.asarray(prev_state_np)
    prev_bit = jnp.asarray(prev_bit_np)

    pieces = []
    for lo in range(0, b, MAX_LANES):
        tile = x[lo : lo + MAX_LANES]                      # (bt, n, 2)
        dec, _ = acs_forward(tile[:, :, 0].T, tile[:, :, 1].T, interpret=interpret)
        bt = tile.shape[0]
        bi = jnp.arange(bt)

        def back(state, dec_t):
            # dec_t: (64, bt) survivor choice per (state, frame)
            k = jnp.take_along_axis(dec_t, state[None, :], axis=0)[0].astype(jnp.int32)
            bit = prev_bit[state, k].astype(jnp.uint8)
            return prev_state[state, k].astype(jnp.int32), bit

        end_state = jnp.zeros((bt,), jnp.int32)            # terminated trellis
        _, bits_rev = jax.lax.scan(back, end_state, dec, reverse=True)
        pieces.append(bits_rev.T)                          # (bt, n)
    bits = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)
    return bits.reshape(batch_shape + (n_bits,))
