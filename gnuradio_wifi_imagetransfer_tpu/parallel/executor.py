"""Batched block-streaming executor — the GNU Radio scheduler replacement.

The reference runs every PHY block on its own C++ thread over ring buffers
(SURVEY.md §2.5.1); state (filter history, sync alignment) lives in each
block. Here the whole RX chain is one jit-compiled function mapped over a
(channel, time) device mesh with `shard_map`:

  * each time shard owns a contiguous block of samples per channel;
  * `jax.lax.ppermute` neighbor exchange supplies a LEFT halo (past
    samples for the detection statistics' 64-sample windows and the
    pre-edge extraction margin) and a RIGHT halo (future samples so a
    frame whose sync edge lies in the owned region can be demodulated to
    completion even when it straddles the block boundary) — the
    overlap-save equivalent of GNU Radio's ring-buffer history;
  * detection search bounds [halo_left, halo_left + block) make every
    frame the property of exactly one shard — no duplicate decodes;
  * the host streaming loop carries global sample offsets so frame
    records dedup by (channel, global_start) across super-blocks.

Halo sizing: halo_right >= sync.window_len(n_sym) - MARGIN covers the
worst frame straddle; halo_left >= MARGIN + 80 covers statistics warm-up
and the extraction margin (cf. the reference's delay(sync_length)
IRS_AP.py:282).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig, PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import params, rx, sync
from gnuradio_wifi_imagetransfer_tpu.phy.tx import TxPlan
from gnuradio_wifi_imagetransfer_tpu.utils.xfer import from_riq, to_riq

HALO_LEFT = 256


@dataclasses.dataclass
class FrameRecord:
    """One decoded frame from the stream."""

    channel: int
    global_start: int       # sample index of the sync edge in the full stream
    psdu: np.ndarray        # (L,) uint8
    parity_ok: bool
    rate_idx: int
    length: int
    cfo: float
    snr_db: float = float("nan")   # decision-directed EVM SNR (probe analogue)


class StreamExecutor:
    """Streaming RX over a (channel, time) mesh.

    Usage:
        ex = StreamExecutor(plan, mesh, exec_cfg, phy_cfg)
        frames = ex.run(stream)         # stream: (channels, n_samples)
    """

    def __init__(
        self,
        plan: TxPlan,
        mesh: Mesh | None = None,
        exec_cfg: ExecutorConfig = ExecutorConfig(),
        phy_cfg: PhyConfig = PhyConfig(),
        tracer=None,
    ):
        from gnuradio_wifi_imagetransfer_tpu.utils import tracing

        self.plan = plan
        self.mesh = mesh
        self.cfg = exec_cfg
        self.phy = phy_cfg
        self.tracer = tracer if tracer is not None else tracing.Tracer()
        self.halo_right = sync.window_len(plan.n_sym)
        self.block = exec_cfg.block_size
        self.max_frames = exec_cfg.max_frames_per_block
        if mesh is not None:
            self._step = self._build_sharded_step(mesh)
        else:
            self._step = self._build_local_step()

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _receive_bounded(self, ext: jnp.ndarray):
        """Decode one extended block (halo_left + block + halo_right,);
        only sync edges inside the owned [halo_left, halo_left + block)
        region are claimed."""
        windows, frame_start, cand = sync.synchronize(
            ext, self.plan.n_sym, self.max_frames, self.phy,
            search_lo=HALO_LEFT, search_hi=HALO_LEFT + self.block,
        )
        res = rx.decode_aligned(windows, self.plan, start=frame_start)
        return res, cand

    def _outputs(self, res, cand):
        from gnuradio_wifi_imagetransfer_tpu.utils.tracing import evm_snr_db

        # bools leave the device as uint8: the axon TPU tunnel cannot
        # transfer bool (or complex) arrays to the host (see utils/xfer.py)
        return (
            res.psdu,
            cand.valid.astype(jnp.uint8),
            cand.starts - HALO_LEFT,      # block-relative edge position
            cand.cfo,
            res.sig["rate_idx"],
            res.sig["length"],
            res.sig["parity_ok"].astype(jnp.uint8),
            evm_snr_db(res.eq_symbols, self.plan.mcs),   # SNR probe analogue
        )

    def _build_local_step(self):
        # I/O crosses the jit boundary as float32 (..., 2) real/imag pairs:
        # the axon TPU backend rejects complex64 at program boundaries
        # (transfers/eager ops), though complex math inside jit is fine.
        @jax.jit
        def step(blocks_riq):             # (C, T, halo_l + block + halo_r, 2)
            blocks = from_riq(blocks_riq)

            def one(ext):
                res, cand = self._receive_bounded(ext)
                return self._outputs(res, cand)

            c, t, e = blocks.shape
            # single-level vmap over the flattened (C*T) block axis: nested
            # vmaps of this pipeline stall the TPU compiler service
            out = jax.vmap(one)(blocks.reshape(c * t, e))
            return tuple(o.reshape((c, t) + o.shape[1:]) for o in out)

        return step

    def _build_sharded_step(self, mesh: Mesh):
        t = mesh.shape["time"]

        def shard_fn(x_local_riq):        # (C_local, 1, block, 2)
            x_local = from_riq(x_local_riq[:, 0])   # (C_local, block)
            # neighbor halo exchange over the time ring (ICI traffic)
            right_src = [(i, (i - 1) % t) for i in range(t)]   # i sends to i-1
            left_src = [(i, (i + 1) % t) for i in range(t)]    # i sends to i+1
            left_halo = jax.lax.ppermute(
                x_local[:, -HALO_LEFT:], "time", perm=left_src)
            right_halo = jax.lax.ppermute(
                x_local[:, : self.halo_right], "time", perm=right_src)
            ext = jnp.concatenate([left_halo, x_local, right_halo], axis=-1)

            def one(e):
                res, cand = self._receive_bounded(e)
                return self._outputs(res, cand)

            out = jax.vmap(one)(ext)
            return tuple(o[:, None] for o in out)   # re-insert time-block dim

        from jax import shard_map

        # 8 outputs, each (C, T, ...) sharded on the leading two axes
        smapped = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P("channel", "time"),
            out_specs=tuple([P("channel", "time")] * 8),
            check_vma=False,
        )
        return jax.jit(smapped)

    # ------------------------------------------------------------------
    # host streaming loop
    # ------------------------------------------------------------------

    def _layout(self, x: np.ndarray, offset: int):
        """Slice (C, N) into the per-step block tensor.

        Local mode: builds overlapping extended blocks (C, T, ext_len).
        Mesh mode: builds contiguous blocks (C, T, block); halos move over
        ICI inside the step.
        """
        c = x.shape[0]
        t = self.mesh.shape["time"] if self.mesh is not None else self.cfg.time_shards
        span = t * self.block
        chunk = x[:, offset : offset + span]
        if chunk.shape[1] < span:
            chunk = np.pad(chunk, ((0, 0), (0, span - chunk.shape[1])))
        if self.mesh is not None:
            return chunk.reshape(c, t, self.block)
        ext_len = HALO_LEFT + self.block + self.halo_right
        ext = np.zeros((c, t, ext_len), dtype=x.dtype)
        for ti in range(t):
            s = offset + ti * self.block - HALO_LEFT
            e = s + ext_len
            lo, hi = max(s, 0), min(e, x.shape[1])
            ext[:, ti, lo - s : lo - s + hi - lo] = x[:, lo:hi]
        return ext

    def run(self, stream: np.ndarray) -> list[FrameRecord]:
        """Process a full (channels, n_samples) stream; returns deduped
        frame records sorted by (channel, global_start)."""
        stream = np.atleast_2d(stream)
        c, n = stream.shape
        t = self.mesh.shape["time"] if self.mesh is not None else self.cfg.time_shards
        span = t * self.block
        if self.mesh is not None:
            # mesh mode: the last shard's right halo wraps around the ring,
            # so frames straddling a super-block boundary decode garbage
            # there; overlapping super-blocks re-claims them with proper
            # context and the dedup map keeps exactly one good record.
            stride = max(self.block, span - (self.halo_right + HALO_LEFT))
        else:
            stride = span  # local layout reads true straddle context
        records: dict[tuple[int, int], FrameRecord] = {}
        for offset in range(0, n, stride):
            with self.tracer.stage("ingest", samples=c * span):
                blocks = to_riq(self._layout(stream, offset))
                if self.mesh is not None:
                    blocks = jax.device_put(
                        blocks, NamedSharding(self.mesh, P("channel", "time")))
            with self.tracer.stage("device_step", samples=c * span):
                psdu, valid, starts, cfo, rate_idx, length, parity, snr = map(
                    np.asarray, self._step(jnp.asarray(blocks)))
            n_new = 0
            with self.tracer.stage("collect"):
                for ci in range(c):
                    for ti in range(t):
                        for k in range(self.max_frames):
                            if not valid[ci, ti, k]:
                                continue
                            gstart = offset + ti * self.block + int(starts[ci, ti, k])
                            if gstart >= n:
                                continue
                            key = (ci, gstart)
                            rec = FrameRecord(
                                channel=ci,
                                global_start=gstart,
                                psdu=psdu[ci, ti, k],
                                parity_ok=bool(parity[ci, ti, k]),
                                rate_idx=int(rate_idx[ci, ti, k]),
                                length=int(length[ci, ti, k]),
                                cfo=float(cfo[ci, ti, k]),
                                snr_db=float(snr[ci, ti, k]),
                            )
                            if key not in records or (rec.parity_ok and not records[key].parity_ok):
                                if key not in records:
                                    n_new += 1
                                records[key] = rec
            self.tracer.count("collect", frames=n_new, calls=0)
            # NOTE: frames whose edge falls within the last halo_right of a
            # super-block are claimed by the shard that owns the edge; the
            # ring ppermute wraps the halo, so the final shard of the LAST
            # super-block may see wrapped context. The dedup map plus
            # per-frame parity/FCS screening keeps results exact; streams
            # should end with >= halo_right pad samples (pad_burst's 1000-
            # sample tail already satisfies this).
        return sorted(records.values(), key=lambda r: (r.channel, r.global_start))
