"""Batched block-streaming executors — the GNU Radio scheduler replacement.

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

Two executors share this machinery (_StreamExecutorBase):

  StreamExecutor          fixed (MCS, length) plan — full decode inside the
                          sharded step. Halo sizing: halo_right >=
                          sync.window_len(n_sym) - MARGIN covers the worst
                          frame straddle.
  AdaptiveStreamExecutor  runtime MCS steering — the sharded step decodes
                          only SIGNAL (tiny halo); payloads decode in
                          host-bucketed per-(rate, length) stage-B jits.

halo_left >= MARGIN + 80 covers statistics warm-up and the extraction
margin in both (cf. the reference's delay(sync_length), IRS_AP.py:282).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnuradio_wifi_imagetransfer_tpu.config import (
    ChannelEstimator,
    ExecutorConfig,
    PhyConfig,
)
from gnuradio_wifi_imagetransfer_tpu.phy import (
    equalizer,
    params,
    rx,
    signal_field,
    sync,
)
from gnuradio_wifi_imagetransfer_tpu.phy.tx import TxPlan
from gnuradio_wifi_imagetransfer_tpu.utils.xfer import (
    from_riq,
    from_wire,
    quantize_wire,
    to_riq,
)

HALO_LEFT = 256


def _pack_f32(parts: list[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate heterogeneous per-block outputs into ONE flat float32
    vector. The tunneled TPU backend pays a ~20 ms round trip per
    device->host fetch regardless of size, so the step returns a single
    array instead of a tuple — one fetch per super-block, not eight.
    float32 exactly represents every packed value (uint8 bytes, block-
    relative int32 indices < 2^24, float metrics)."""
    return jnp.concatenate([jnp.ravel(p).astype(jnp.float32) for p in parts])


@jax.jit
def _concat_packed(parts: tuple) -> jnp.ndarray:
    """Ravel + concatenate N device arrays into one fetchable vector.
    Used to fetch every pending stage-B bucket in one round trip.

    Callers canonicalize the signature first (_ravel_pad to a power-of-two
    size, sorted descending), so the jit cache sees multisets of ~25
    possible pow2 lengths instead of one program per raw (b_pad, row_len)
    traffic mix — bounding cache growth on long-lived diverse streams
    (ADVICE r4)."""
    return jnp.concatenate([jnp.ravel(p) for p in parts])


@functools.partial(jax.jit, static_argnums=1)
def _ravel_pad(x, size: int):
    """Ravel one packed bucket and zero-pad to a canonical pow2 length."""
    flat = jnp.ravel(x)
    return jnp.pad(flat, (0, size - flat.shape[0]))


def _to_global(arr: np.ndarray, mesh: Mesh, spec: P):
    """Host numpy -> globally-sharded device array. Single-process:
    plain device_put. Multi-process (jax.distributed): every host holds
    the same global value (each received the shared antenna feed) and
    contributes its addressable shards."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        # global_shape == arr.shape tells jax the array IS the global
        # value (each host extracts its own slices); omitting it would
        # treat the value as one host's sub-batch and double the mesh
        return jax.make_array_from_process_local_data(
            sharding, arr, arr.shape)
    return jax.device_put(arr, sharding)


def _fetch_global(outs) -> np.ndarray:
    """Fetch a (possibly multi-process) sharded step output to a full
    host numpy tensor on EVERY host: processes exchange their
    addressable shards (index + data over DCN), so the host-side
    dispatch (candidate collection, stage-B bucketing) runs replicated —
    identical on all hosts, the standard SPMD discipline."""
    if jax.process_count() == 1:
        return np.asarray(outs)
    if getattr(outs, "is_fully_addressable", False):
        # a LOCAL-mode executor (mesh=None, or a mesh over this process's
        # own devices) inside a jax.distributed job: the value is whole on
        # this host. Entering the allgather below would overwrite every
        # rank's result with the highest rank's (each "shard" spans the
        # full array) — or deadlock when ranks don't step in lockstep.
        return np.asarray(outs)
    from jax.experimental import multihost_utils

    full = np.zeros(outs.shape, outs.dtype)
    local = sorted(outs.addressable_shards,
                   key=lambda s: tuple(sl.indices(outs.shape[d])[0]
                                       for d, sl in enumerate(s.index)))
    starts = np.array([
        [sl.indices(outs.shape[d])[0] for d, sl in enumerate(s.index)]
        for s in local], np.int64)
    stops = np.array([
        [sl.indices(outs.shape[d])[1] for d, sl in enumerate(s.index)]
        for s in local], np.int64)
    data = np.stack([np.asarray(s.data) for s in local])
    g_start = multihost_utils.process_allgather(starts)    # (P, S, ndim)
    g_stop = multihost_utils.process_allgather(stops)
    g_data = multihost_utils.process_allgather(data)       # (P, S, ...)
    for p in range(g_start.shape[0]):
        for s in range(g_start.shape[1]):
            sel = tuple(slice(int(a), int(b))
                        for a, b in zip(g_start[p, s], g_stop[p, s]))
            full[sel] = g_data[p, s]
    return full


@functools.lru_cache(maxsize=8)
def _corrected_resident(fe):
    """jitted whole-padded-stream front-end pass: input-rate wire tensor
    -> corrected output-grid float32 riq resident stream (stays in HBM)."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def fn(x_riq, np_out, *aux):
        x = from_wire(x_riq)
        y = fe.correct_padded(x, np_out, HALO_LEFT, aux)
        return jnp.stack([jnp.real(y), jnp.imag(y)], axis=-1).astype(
            jnp.float32)

    return fn


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
    # equalized data-carrier symbols (n_sym, 48) complex64 — populated only
    # when the executor runs with capture_symbols=True (the analogue of
    # frame_equalizer's "symbols" msg port feeding the constellation GUI,
    # IRS_AP.py:267,293); None otherwise to keep fetches small
    eq_symbols: np.ndarray | None = None


class _StreamExecutorBase:
    """Shared scaffolding: block layout, halo exchange, wire format, and
    the double-buffered host dispatch loop. Subclasses provide
    ``halo_right`` (before calling _init_common) and ``_block_fn`` —
    the per-extended-block device computation returning one packed
    float32 vector."""

    def _init_common(self, mesh: Mesh | None, exec_cfg: ExecutorConfig,
                     phy_cfg: PhyConfig, tracer) -> None:
        from gnuradio_wifi_imagetransfer_tpu.parallel.frontend import (
            cached_frontend,
        )
        from gnuradio_wifi_imagetransfer_tpu.utils import tracing

        self.mesh = mesh
        self.cfg = exec_cfg
        self.phy = phy_cfg
        self.tracer = tracer if tracer is not None else tracing.Tracer()
        self.block = exec_cfg.block_size
        self.max_frames = exec_cfg.max_frames_per_block
        self.frontend = (cached_frontend(exec_cfg.frontend)
                         if exec_cfg.frontend is not None else None)
        if mesh is not None and self.frontend is not None:
            # frontend mesh mode ships per-shard EXTENDED input windows
            # (the host has full context, so shards need no ppermute
            # halos, no zero-context masking, and no stride overlap)
            self._step = self._build_sharded_frontend_step(mesh)
        elif mesh is not None:
            # mesh-mode strides advance by span - (halo_right + HALO_LEFT);
            # if that is <= 0 the trusted interval of every stride is empty
            # (all frames masked untrusted, O(n) strides at step ~1 —
            # silent total frame loss, ADVICE r3). Demand real progress.
            span = mesh.shape["time"] * self.block
            if span - (self.halo_right + HALO_LEFT) <= 0:
                min_block = -(-(self.halo_right + HALO_LEFT + 1)
                              // mesh.shape["time"])
                raise ValueError(
                    f"mesh-mode span {span} (time={mesh.shape['time']} x "
                    f"block_size={self.block}) must exceed halo_right + "
                    f"HALO_LEFT = {self.halo_right} + {HALO_LEFT}: frames "
                    f"need that much context, so no stride would own a "
                    f"trusted interval — use block_size >= {min_block} at "
                    f"this shard count, or more time shards")
            self._step = self._build_sharded_step(mesh)
        else:
            self._step = self._build_local_step()

    # -- device steps --------------------------------------------------

    def _block_fn(self, ext: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _blocks_fn(self, flat: jnp.ndarray) -> jnp.ndarray:
        """(B, ext_len) extended blocks -> (B, F) packed outputs. Default:
        vmap the per-block function; subclasses may override to flatten
        frame-level work across blocks (vmapping a whole decode turns its
        Pallas kernels into B tiny grid-mapped instances — e.g. 4-lane
        Viterbi calls padded to 128 lanes — where one flat batch fills
        the lanes)."""
        return jax.vmap(self._block_fn)(flat)

    def _build_local_step(self):
        # Local (single-process) mode is DEVICE-RESIDENT: run() ships the
        # whole padded wire stream once and every super-block step cuts its
        # overlapping extended blocks on-device with dynamic_slice. This
        # replaces the round-2/3 host layout loop (a per-shard Python copy
        # per super-block, VERDICT r3 item 4) and stops paying the halo
        # bytes twice on the wire. I/O crosses the jit boundary as (..., 2)
        # real/imag pairs (float32 or sc16 int16): the axon TPU backend
        # rejects complex64 at program boundaries, though complex math
        # inside jit is fine.
        t = self.cfg.time_shards
        ext_len = HALO_LEFT + self.block + self.halo_right

        @jax.jit
        def step(stream_riq, offset):     # (C, Np, 2) wire + scalar offset
            c = stream_riq.shape[0]

            def cut(ti):
                # padded index of global sample s is s + HALO_LEFT, so the
                # shard window [off + ti*block - HALO_LEFT, ...) starts at
                # padded index off + ti*block
                return jax.lax.dynamic_slice(
                    stream_riq, (0, offset + ti * self.block, 0),
                    (c, ext_len, 2))

            ext = jax.vmap(cut, out_axes=1)(jnp.arange(t))   # (C, T, E, 2)
            blocks = from_wire(ext)
            # single-level vmap over the flattened (C*T) block axis: nested
            # vmaps of this pipeline stall the TPU compiler service
            out = self._blocks_fn(blocks.reshape(c * t, ext_len))
            return out.reshape((c, t) + out.shape[1:])

        return step

    # extra right padding the resident stream must carry beyond the step's
    # own halo (subclasses with on-device window gathers override)
    def _resident_right_pad(self) -> int:
        return self.halo_right

    def _pad_wire(self, x: np.ndarray) -> np.ndarray:
        """(C, n) complex stream -> (C, Np, 2) zero-padded wire tensor for
        the resident local path: HALO_LEFT zeros in front (statistics
        warm-up / extraction margin before sample 0), zeros behind out to
        the last super-block's full extent plus the largest on-device
        window. Quantizes per channel straight into the wire buffer, so
        the transient host allocation is one channel's riq copy instead
        of a full padded complex64 image of the stream (ADVICE r4)."""
        c, n = x.shape
        span = self.cfg.time_shards * self.block
        n_sup = max(1, -(-n // span))
        np_len = HALO_LEFT + n_sup * span + self._resident_right_pad()
        dt = {"f32": np.float32, "sc16": np.int16, "sc8": np.int8}[
            self.cfg.wire_format]
        out = np.zeros((c, np_len, 2), dtype=dt)
        for ch in range(c):
            # to_riq of a contiguous complex64 row is a zero-copy view
            out[ch, HALO_LEFT : HALO_LEFT + n] = quantize_wire(
                to_riq(np.ascontiguousarray(x[ch])), self.cfg.wire_format)
        return out

    def _build_sharded_frontend_step(self, mesh: Mesh):
        """Sharded step with the rate-conversion front-end fused at the
        top: each shard receives an EXTENDED input-rate window (cut with
        true context by the host) plus one exact phase scalar, corrects
        it to the nominal output grid, and runs the RX chain. No
        ppermute: resample phase continuity across shards is owned by
        the host's exact Fraction arithmetic (parallel/frontend.py)."""
        ext_out = HALO_LEFT + self.block + self.halo_right
        fe = self.frontend

        def shard_fn(x_riq, tau0):       # (C_local, 1, ext_in, 2), (1,)
            xin = from_wire(x_riq[:, 0])             # (C_local, ext_in)
            ext = fe.correct_block(xin, tau0[0], ext_out)
            out = self._blocks_fn(ext)
            return out[:, None]

        from jax import shard_map

        smapped = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("channel", "time"), P("time")),
            out_specs=P("channel", "time"),
            check_vma=False,
        )
        return jax.jit(smapped)

    def _build_sharded_step(self, mesh: Mesh):
        t = mesh.shape["time"]

        def shard_fn(x_local_riq):        # (C_local, 1, block, 2)
            x_local = from_wire(x_local_riq[:, 0])   # (C_local, block)
            # neighbor halo exchange over an OPEN time chain (ICI traffic):
            # pairs omitted from the perm deliver ZEROS, so the first shard's
            # left halo and the last shard's right halo are silence — exactly
            # correct at the stream start/end (a ring would wrap the far
            # shard's samples in as garbage context; frames near a hard-
            # truncated stream end then fail parity and are lost — VERDICT r2
            # item 5). Interior super-block seams re-scan with true context on
            # the next overlapped stride; dedup keeps the parity-ok record.
            right_src = [(i, i - 1) for i in range(1, t)]      # i sends to i-1
            left_src = [(i, i + 1) for i in range(t - 1)]      # i sends to i+1
            left_halo = jax.lax.ppermute(
                x_local[:, -HALO_LEFT:], "time", perm=left_src)
            right_halo = jax.lax.ppermute(
                x_local[:, : self.halo_right], "time", perm=right_src)
            ext = jnp.concatenate([left_halo, x_local, right_halo], axis=-1)
            out = self._blocks_fn(ext)    # flattens frames across channels
            return out[:, None]           # re-insert time-block dim

        from jax import shard_map

        # one packed (C, T, F) output sharded on the leading two axes
        smapped = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P("channel", "time"),
            out_specs=P("channel", "time"),
            check_vma=False,
        )
        return jax.jit(smapped)

    # -- host side -----------------------------------------------------

    def _layout(self, x: np.ndarray, offset: int):
        """Mesh mode: slice (C, N) into contiguous per-shard blocks
        (C, T, block); halos move over ICI inside the step. (The local
        path is device-resident — see _pad_wire/_build_local_step.)"""
        c = x.shape[0]
        t = self.mesh.shape["time"]
        span = t * self.block
        chunk = x[:, offset : offset + span]
        if chunk.shape[1] < span:
            chunk = np.pad(chunk, ((0, 0), (0, span - chunk.shape[1])))
        return chunk.reshape(c, t, self.block)

    def _ingest_mesh(self, stream: np.ndarray, offset: int, span: int):
        c = stream.shape[0]
        if self.frontend is not None:
            return self._ingest_mesh_frontend(stream, offset, span)
        with self.tracer.stage("layout", samples=c * span):
            blocks = quantize_wire(to_riq(self._layout(stream, offset)),
                                   self.cfg.wire_format)
        with self.tracer.stage("transfer", samples=c * span):
            blocks = _to_global(blocks, self.mesh, P("channel", "time"))
        return self._step(blocks)                   # async dispatch

    def _ingest_mesh_frontend(self, stream: np.ndarray, offset: int,
                              span: int):
        """Cut per-shard extended input-rate windows (zero-filled outside
        the stream) + exact per-shard phase scalars, ship sharded."""
        c, n_in = stream.shape
        t = self.mesh.shape["time"]
        fe = self.frontend
        ext_out = HALO_LEFT + self.block + self.halo_right
        ext_in = fe.block_ext_in(ext_out)
        with self.tracer.stage("layout", samples=c * span):
            # quantize each (channel, shard) cut straight into the wire
            # tensor: the transient host allocation is one extended
            # window's riq copy, not a full (c, t, ext_in) complex64
            # image of the span plus its riq view (the same discipline
            # _pad_wire adopted for ADVICE r4)
            dt = {"f32": np.float32, "sc16": np.int16, "sc8": np.int8}[
                self.cfg.wire_format]
            wire = np.zeros((c, t, ext_in, 2), dtype=dt)
            taus = np.empty((t,), np.float32)
            for ti in range(t):
                s0 = offset + ti * self.block - HALO_LEFT
                in_cut, taus[ti] = fe.block_cut(s0, ext_out)
                lo, hi = max(in_cut, 0), min(in_cut + ext_in, n_in)
                if hi > lo:
                    dst = slice(lo - in_cut, lo - in_cut + hi - lo)
                    for ch in range(c):
                        wire[ch, ti, dst] = quantize_wire(
                            to_riq(np.ascontiguousarray(stream[ch, lo:hi])),
                            self.cfg.wire_format)
        with self.tracer.stage("transfer", samples=c * span):
            wire = _to_global(wire, self.mesh, P("channel", "time"))
            taus_d = _to_global(taus, self.mesh, P("time"))
        return self._step(wire, taus_d)

    def effective_len(self, n_in: int) -> int:
        """Stream length on the nominal output grid (== n_in without a
        front-end). Frame global_start positions are output-grid indices."""
        return (self.frontend.out_len(n_in)
                if self.frontend is not None else n_in)

    def _stage_resident(self, stream: np.ndarray) -> None:
        """Local mode: pad + wire-format the whole stream (vector ops) and
        ship it ONCE; steps and on-device window gathers slice it there.
        With a front-end, the INPUT-rate stream ships and one jitted
        correction pass materializes the corrected output-grid resident
        stream in HBM — downstream consumers are unchanged and no extra
        bytes cross the wire."""
        c, n = stream.shape
        if self.frontend is not None:
            self._stage_resident_frontend(stream)
            return
        with self.tracer.stage("layout", samples=c * n):
            wire = self._pad_wire(stream)
        with self.tracer.stage("transfer", samples=c * n):
            self._dev_stream = jnp.asarray(wire)

    def _stage_resident_frontend(self, stream: np.ndarray) -> None:
        fe = self.frontend
        c, n_in = stream.shape
        n_out = fe.out_len(n_in)
        span = self.cfg.time_shards * self.block
        n_sup = max(1, -(-n_out // span))
        np_out = HALO_LEFT + n_sup * span + self._resident_right_pad()
        p_in, n_in_pad, aux = fe.padded_geometry(np_out, HALO_LEFT)
        dt = {"f32": np.float32, "sc16": np.int16, "sc8": np.int8}[
            self.cfg.wire_format]
        with self.tracer.stage("layout", samples=c * n_in):
            buf = np.zeros((c, n_in_pad, 2), dtype=dt)
            for ch in range(c):
                buf[ch, p_in : p_in + n_in] = quantize_wire(
                    to_riq(np.ascontiguousarray(stream[ch])),
                    self.cfg.wire_format)
        with self.tracer.stage("transfer", samples=c * n_in):
            dev_in = jnp.asarray(buf)
        with self.tracer.stage("frontend", samples=c * n_in):
            self._dev_stream = _corrected_resident(fe)(dev_in, np_out, *aux)

    def _stepped(self, stream: np.ndarray):
        """Double-buffered dispatch: yields (offset, outs) per super-block.
        Super-block k+1 is dispatched before k's results are consumed, so
        host work overlaps device compute (JAX dispatch is async).

        Mesh mode overlaps super-block strides by the halo total: edges
        near a seam (where the open-chain ppermute delivered zero context)
        re-scan with true context on the next stride; the caller's dedup
        keeps the good record. Local mode reads true straddle context from
        the resident stream, so strides don't overlap.
        """
        c, n_in = stream.shape
        n = self.effective_len(n_in)
        t = self.mesh.shape["time"] if self.mesh is not None else self.cfg.time_shards
        span = t * self.block
        if self.mesh is not None and self.frontend is None:
            # overlap strides by the halo total so every interior seam is
            # re-scanned with true context (always positive: _init_common
            # rejects spans that don't exceed the halo total)
            stride = span - (self.halo_right + HALO_LEFT)
        elif self.mesh is not None:
            # frontend mesh mode: host-cut extended windows carry true
            # context, so seams need no re-scan and strides don't overlap
            stride = span
        else:
            stride = span
            self._stage_resident(stream)
        pending = None
        for offset in range(0, n, stride):
            if self.mesh is not None:
                outs = self._ingest_mesh(stream, offset, span)
            else:
                outs = self._step(self._dev_stream, np.int32(offset))
            if pending is not None:
                yield pending
            pending = (offset, outs, span)
        if pending is not None:
            yield pending


class StreamExecutor(_StreamExecutorBase):
    """Streaming RX over a (channel, time) mesh with a FIXED (MCS, length)
    plan — the full decode runs inside the sharded step.

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
        self.plan = plan
        self.halo_right = sync.window_len(plan.n_sym)
        self._init_common(mesh, exec_cfg, phy_cfg, tracer)

    def _decode_packed(self, windows, frame_start, starts, valid, cfo, lead):
        """Decode a flat frame batch and pack (see _pack_f32 layout):
        windows (B, wlen), frame_start/starts/valid/cfo (B,) -> per-
        leading-unit packed rows ``lead + (F,)`` where each row is
        [psdu (K*L) | valid K | starts K | cfo K | rate K | len K |
        parity K | snr K] for that unit's K frame slots."""
        from gnuradio_wifi_imagetransfer_tpu.utils.tracing import evm_snr_db

        res = rx.decode_aligned(
            windows, self.plan, start=frame_start,
            algo=ChannelEstimator(self.phy.chan_est),
            lms_mu=self.phy.lms_mu, sta_alpha=self.phy.sta_alpha,
            sta_beta=self.phy.sta_beta)
        # bools leave the device as numeric — the axon TPU tunnel cannot
        # transfer bool (or complex) arrays to the host (see utils/xfer.py)
        parts = [
            res.psdu,                     # (B, L)
            valid[..., None],
            (starts - HALO_LEFT)[..., None],        # block-relative edge
            cfo[..., None],
            res.sig["rate_idx"][..., None],
            res.sig["length"][..., None],
            res.sig["parity_ok"][..., None],
            evm_snr_db(res.eq_symbols, self.plan.mcs)[..., None],  # SNR probe
        ]
        k = self.max_frames
        return jnp.concatenate(
            [p.astype(jnp.float32).reshape(lead + (k * p.shape[-1],))
             for p in parts], axis=-1)

    def _block_fn(self, ext: jnp.ndarray) -> jnp.ndarray:
        """Decode one extended block (halo_left + block + halo_right,);
        only sync edges inside the owned [halo_left, halo_left + block)
        region are claimed. (Used by the sharded path, where the per-
        device block count is small; the local path flattens frames
        across blocks in _blocks_fn.)"""
        windows, frame_start, cand = sync.synchronize(
            ext, self.plan.n_sym, self.max_frames, self.phy,
            search_lo=HALO_LEFT, search_hi=HALO_LEFT + self.block,
        )
        return self._decode_packed(windows, frame_start, cand.starts,
                                   cand.valid, cand.cfo, lead=())

    def _blocks_fn(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Flatten the (B blocks x K slots) frame batch through ONE decode:
        a vmapped per-block decode hands the Pallas Viterbi B tiny 4-lane
        grid instances (each padded to 128 lanes); flat batching fills
        the kernel's lanes instead (v5e, 2026-08-21: full RX step 635 ->
        1025-1040 Msps; sync/detection stays vmapped per block)."""
        def sync_one(ext):
            w, fs, cand = sync.synchronize(
                ext, self.plan.n_sym, self.max_frames, self.phy,
                search_lo=HALO_LEFT, search_hi=HALO_LEFT + self.block,
            )
            return w, fs, cand.starts, cand.valid, cand.cfo

        windows, frame_start, starts, valid, cfo = jax.vmap(sync_one)(flat)
        b, k, wlen = windows.shape
        return self._decode_packed(
            windows.reshape(b * k, wlen), frame_start.reshape(b * k),
            starts.reshape(b * k), valid.reshape(b * k), cfo.reshape(b * k),
            lead=(b,))

    def _unpack(self, flat: np.ndarray):
        """(C, T, F) packed step output -> the 8 logical arrays."""
        k, l = self.max_frames, self.plan.psdu_len
        lead = flat.shape[:-1]
        psdu = flat[..., : k * l].reshape(lead + (k, l)).astype(np.uint8)
        rest = flat[..., k * l :].reshape(lead + (7, k))
        valid, starts, cfo, rate_idx, length, parity, snr = (
            rest[..., i, :] for i in range(7))
        return (psdu, valid, starts.astype(np.int64), cfo,
                rate_idx.astype(np.int32), length.astype(np.int32),
                parity, snr)

    def _collect(self, offset: int, outs, n: int, span: int,
                 records: dict[tuple[int, int], FrameRecord]) -> None:
        c = outs.shape[0]
        with self.tracer.stage("device_step", samples=c * span):
            # the fetch blocks until the (async-dispatched) step lands;
            # ONE packed fetch — the tunnel charges per transfer. On a
            # multi-process mesh the hosts exchange shards (DCN) so the
            # collect below runs replicated on every host.
            psdu, valid, starts, cfo, rate_idx, length, parity, snr = (
                self._unpack(_fetch_global(outs)))
        n_new = 0
        with self.tracer.stage("collect"):
            c, t, k = valid.shape
            gstart = (offset + np.arange(t)[None, :, None] * self.block
                      + starts.astype(np.int64))               # (C, T, K)
            # a fixed-plan frame is good only if its SIGNAL decodes to the
            # plan's exact (rate, length): the 1-bit SIGNAL parity alone
            # passes garbage 50% of the time, which can let an incomplete-
            # context decode from an overlapped stride shadow the true one
            good = ((parity != 0) & (rate_idx == self.plan.mcs)
                    & (length == self.plan.psdu_len))
            mask = (valid != 0) & (gstart < n)
            if self.mesh is not None and self.frontend is None:
                # Drop decodes whose demod window read an open-chain ZERO
                # halo where real samples exist: the edge shards of each
                # super-block see silence instead of neighbouring-stride
                # context, so their boundary frames demodulate a truncated
                # burst (SIGNAL can still parse — only the tail corrupts).
                # The stride overlap guarantees every such frame a fully-
                # contexted re-scan, so discarding here loses nothing.
                ti_idx = np.arange(t)[None, :, None]
                win_end = gstart - sync.MARGIN + self.halo_right
                owned_end = offset + t * self.block     # last shard's edge
                untrusted = ((ti_idx == t - 1) & (win_end > owned_end)
                             & (owned_end < n))
                untrusted |= ((ti_idx == 0) & (offset > 0)
                              & (gstart - sync.MARGIN < offset))
                mask &= ~untrusted
            hits = np.argwhere(mask)                           # vectorized mask
            for ci, ti, ki in hits:
                key = (int(ci), int(gstart[ci, ti, ki]))
                rec = FrameRecord(
                    channel=int(ci),
                    global_start=key[1],
                    psdu=psdu[ci, ti, ki],
                    parity_ok=bool(good[ci, ti, ki]),
                    rate_idx=int(rate_idx[ci, ti, ki]),
                    length=int(length[ci, ti, ki]),
                    cfo=float(cfo[ci, ti, ki]),
                    snr_db=float(snr[ci, ti, ki]),
                )
                if key not in records or (rec.parity_ok and not records[key].parity_ok):
                    if key not in records:
                        n_new += 1
                    records[key] = rec
        self.tracer.count("collect", frames=n_new, calls=0)

    def run(self, stream: np.ndarray) -> list[FrameRecord]:
        """Process a full (channels, n_samples) stream; returns deduped
        frame records sorted by (channel, global_start). Hard-truncated
        streams (no tail pad) decode their last frame exactly: the final
        shard's right halo is open-chain zeros, the true post-end content.
        """
        stream = np.atleast_2d(stream)
        n = self.effective_len(stream.shape[1])
        records: dict[tuple[int, int], FrameRecord] = {}
        try:
            for offset, outs, span in self._stepped(stream):
                self._collect(offset, outs, n, span, records)
        finally:
            self._dev_stream = None        # release the resident HBM copy
        return sorted(records.values(), key=lambda r: (r.channel, r.global_start))


# ----------------------------------------------------------------------
# SIGNAL-steered adaptive streaming executor
# ----------------------------------------------------------------------

# Stage A decodes only the SIGNAL symbol, so candidate windows cover the
# preamble + SIGNAL (window_len(0) = 720 samples) instead of the worst-case
# 800-byte MCS0 frame (~45k samples) — ~60x less gather/ship per candidate.
_SIG_WLEN = sync.window_len(0)


@dataclasses.dataclass
class _Candidate:
    """A detected frame awaiting stage-B payload decode."""

    channel: int
    global_start: int
    cfo: float
    frame_start: int      # preamble offset within a window cut at gstart-MARGIN
    rate_idx: int
    length: int


def _pack_bucket_rows(r, plan, capture_symbols):
    """decode_aligned result -> (B, L + 2 [+ 2*S*48]) packed rows:
    psdu | parity | snr | [symbols] — one fetch per bucket. With
    capture_symbols the row also carries the equalized data symbols as
    re/im floats — the frame_equalizer "symbols" message-port analogue
    (IRS_AP.py:267,293)."""
    from gnuradio_wifi_imagetransfer_tpu.utils.tracing import evm_snr_db

    parts = [
        r.psdu.astype(jnp.float32),
        r.sig["parity_ok"].astype(jnp.float32)[:, None],
        evm_snr_db(r.eq_symbols, plan.mcs)[:, None],
    ]
    if capture_symbols:
        b = r.eq_symbols.shape[0]
        parts.append(jnp.concatenate([
            jnp.real(r.eq_symbols).reshape(b, -1),
            jnp.imag(r.eq_symbols).reshape(b, -1),
        ], axis=-1).astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


_EQ_DEFAULTS = (PhyConfig().lms_mu, PhyConfig().sta_alpha, PhyConfig().sta_beta)


@functools.lru_cache(maxsize=64)
def _stage_b_fn(mcs: int, psdu_len: int, algo: int,
                capture_symbols: bool = False,
                eq_params: tuple[float, float, float] = _EQ_DEFAULTS):
    """jitted payload decode for one (MCS, length) bucket from HOST-cut
    windows (the mesh path): raw windows + total CFO + alignment -> packed
    rows (see _pack_bucket_rows)."""
    plan = TxPlan(mcs, psdu_len)
    wlen = sync.window_len(plan.n_sym)

    @jax.jit
    def fn(raw_riq, cfo, frame_start):
        raw = from_wire(raw_riq)                              # (B, wlen)
        n = jnp.arange(raw.shape[-1])
        w = raw * jnp.exp(-1j * cfo[:, None] * n)             # same ramp origin
        r = rx.decode_aligned(w, plan, start=frame_start,
                              algo=ChannelEstimator(algo),
                              lms_mu=eq_params[0], sta_alpha=eq_params[1],
                              sta_beta=eq_params[2])
        return _pack_bucket_rows(r, plan, capture_symbols)

    return fn, plan, wlen


@functools.lru_cache(maxsize=64)
def _stage_b_fn_frontend(mcs: int, psdu_len: int, algo: int,
                         capture_symbols: bool, eq_params: tuple,
                         fe_cfg):
    """jitted payload decode for one (MCS, length) bucket from HOST-cut
    INPUT-RATE windows (mesh mode with a rate-conversion front-end): the
    window is corrected to the nominal grid on-device (per-row phase
    scalar), then CFO-corrected and decoded like _stage_b_fn."""
    from gnuradio_wifi_imagetransfer_tpu.parallel.frontend import (
        cached_frontend,
    )

    fe = cached_frontend(fe_cfg)
    plan = TxPlan(mcs, psdu_len)
    wlen = sync.window_len(plan.n_sym)
    wlen_in = fe.block_ext_in(wlen)

    @jax.jit
    def fn(raw_riq, tau0, cfo, frame_start):
        raw_in = from_wire(raw_riq)                           # (B, wlen_in)
        w0 = jax.vmap(lambda r, t: fe.correct_block(r, t, wlen))(
            raw_in, tau0)                                     # (B, wlen)
        n = jnp.arange(wlen)
        w = w0 * jnp.exp(-1j * cfo[:, None] * n)              # same ramp origin
        r = rx.decode_aligned(w, plan, start=frame_start,
                              algo=ChannelEstimator(algo),
                              lms_mu=eq_params[0], sta_alpha=eq_params[1],
                              sta_beta=eq_params[2])
        return _pack_bucket_rows(r, plan, capture_symbols)

    return fn, plan, wlen, wlen_in


@functools.lru_cache(maxsize=64)
def _stage_b_fn_resident(mcs: int, psdu_len: int, algo: int,
                         capture_symbols: bool = False,
                         eq_params: tuple[float, float, float] = _EQ_DEFAULTS):
    """jitted payload decode for one (MCS, length) bucket gathering its
    windows ON-DEVICE from the resident padded wire stream (local mode):
    only per-candidate scalars (channel, padded origin, CFO, alignment)
    cross the wire — the samples were already shipped for stage A
    (VERDICT r3 item 3: stop paying one host round trip of window bytes
    per bucket)."""
    plan = TxPlan(mcs, psdu_len)
    wlen = sync.window_len(plan.n_sym)

    @jax.jit
    def fn(stream_riq, ch, origin, cfo, frame_start):
        def cut(c, o):                                        # (wlen, 2)
            return jax.lax.dynamic_slice(
                stream_riq, (c, o, 0), (1, wlen, 2))[0]

        raw = from_wire(jax.vmap(cut)(ch, origin))            # (B, wlen)
        n = jnp.arange(raw.shape[-1])
        w = raw * jnp.exp(-1j * cfo[:, None] * n)             # same ramp origin
        r = rx.decode_aligned(w, plan, start=frame_start,
                              algo=ChannelEstimator(algo),
                              lms_mu=eq_params[0], sta_alpha=eq_params[1],
                              sta_beta=eq_params[2])
        return _pack_bucket_rows(r, plan, capture_symbols)

    return fn, plan, wlen


class AdaptiveStreamExecutor(_StreamExecutorBase):
    """Streaming RX over a (channel, time) mesh with runtime MCS steering.

    The reference RX never knows the MCS in advance: frame_equalizer decodes
    SIGNAL per frame and decode_mac follows (IRS_AP.py:271-272). Shapes under
    jit are static, so reception splits around a host dispatch:

      stage A (one sharded jit): halo exchange + dense sync front-end +
        SIGNAL-only decode for every candidate. Windows cover just the
        preamble + SIGNAL symbol (720 samples), so the right halo and the
        per-candidate gather are ~60x smaller than a worst-case-frame design;
      host dispatch: dedup by (channel, global start), bucket candidates by
        decoded (rate_idx, length);
      stage B (one cached jit per (MCS, length) bucket): windows sized for
        the ACTUAL frame are cut from the host-resident stream, CFO-corrected
        with the stage-A estimate, and batch-decoded. Batch dims are padded
        to powers of two so compile count stays logarithmic.

    Frames that straddle shard or super-block boundaries need no special
    casing in stage B — the host stream has full context; only the sync EDGE
    must fall in a shard's owned region, which the search bounds guarantee.
    """

    def __init__(
        self,
        mesh: Mesh | None = None,
        exec_cfg: ExecutorConfig = ExecutorConfig(),
        phy_cfg: PhyConfig = PhyConfig(),
        tracer=None,
        algo: ChannelEstimator | None = None,
        capture_symbols: bool = False,
    ):
        self.algo = ChannelEstimator(
            phy_cfg.chan_est if algo is None else algo)
        self.capture_symbols = capture_symbols
        # extraction cuts MARGIN before the edge; the window then extends
        # (wlen - MARGIN) past the last owned edge position
        self.halo_right = _SIG_WLEN - sync.MARGIN
        self._init_common(mesh, exec_cfg, phy_cfg, tracer)

    def _resident_right_pad(self) -> int:
        # local-mode stage B gathers payload windows on-device: a frame
        # whose SIGNAL decodes to the largest allowed (rate, length) near
        # the stream tail must still find a full window of (zero) context
        # past the end — MCS0 at max_psdu_bytes is the longest frame
        wlen_max = sync.window_len(TxPlan(0, self.phy.max_psdu_bytes).n_sym)
        return max(self.halo_right, wlen_max)

    # -- stage A -------------------------------------------------------

    def _sig_decode(self, windows: jnp.ndarray, frame_start: jnp.ndarray):
        """(B, wlen) windows + (B,) alignments -> SIGNAL field dict."""
        ltf1, ltf2, spectra = rx.frame_spectra(windows, 0, frame_start)
        h0 = equalizer.ls_estimate(ltf1, ltf2)
        eq, _ = equalizer.equalize(spectra, h0, symbol_index0=0, algo=self.algo)
        return signal_field.decode(eq[..., 0, :])

    def _block_fn(self, ext: jnp.ndarray) -> jnp.ndarray:
        """SIGNAL-only receive on one extended block."""
        windows, frame_start, cand = sync.synchronize(
            ext, 0, self.max_frames, self.phy,
            search_lo=HALO_LEFT, search_hi=HALO_LEFT + self.block,
        )
        sig = self._sig_decode(windows, frame_start)
        return _pack_f32([                 # (7K,) — one fetch per super-block
            cand.valid,
            cand.starts - HALO_LEFT,       # block-relative edge position
            cand.cfo,
            frame_start,
            sig["rate_idx"],
            sig["length"],
            sig["parity_ok"],
        ])

    def _blocks_fn(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Flatten the SIGNAL decodes across blocks (same rationale as
        StreamExecutor._blocks_fn: fill the kernels' lanes instead of
        vmapping B tiny decodes)."""
        def sync_one(ext):
            w, fs, cand = sync.synchronize(
                ext, 0, self.max_frames, self.phy,
                search_lo=HALO_LEFT, search_hi=HALO_LEFT + self.block,
            )
            return w, fs, cand.starts, cand.valid, cand.cfo

        windows, frame_start, starts, valid, cfo = jax.vmap(sync_one)(flat)
        b, k, wlen = windows.shape
        sig = self._sig_decode(windows.reshape(b * k, wlen),
                               frame_start.reshape(b * k))
        parts = [valid, starts - HALO_LEFT, cfo, frame_start,
                 sig["rate_idx"].reshape(b, k), sig["length"].reshape(b, k),
                 sig["parity_ok"].reshape(b, k)]
        return jnp.concatenate(
            [p.astype(jnp.float32) for p in parts], axis=-1)   # (B, 7K)

    def _unpack_a(self, flat: np.ndarray):
        """(C, T, 7K) packed stage-A output -> the 7 logical arrays."""
        k = self.max_frames
        rest = flat.reshape(flat.shape[:-1] + (7, k))
        valid, starts, cfo, frame_start, rate_idx, length, sig_ok = (
            rest[..., i, :] for i in range(7))
        return (valid, starts.astype(np.int64), cfo,
                frame_start.astype(np.int32), rate_idx.astype(np.int32),
                length.astype(np.int32), sig_ok)

    def _collect_candidates(
        self, offset: int, outs, n: int, span: int,
        seen: set[tuple[int, int]],
    ) -> list[_Candidate]:
        c_dim = outs.shape[0]
        with self.tracer.stage("device_step", samples=c_dim * span):
            # multi-process: shard exchange makes the SIGNAL-steered
            # bucketing below identical on every host (SPMD host dispatch)
            valid, starts, cfo, frame_start, rate_idx, length, sig_ok = (
                self._unpack_a(_fetch_global(outs)))
        cands: list[_Candidate] = []
        with self.tracer.stage("collect"):
            c, t, k = valid.shape
            gstart = (offset + np.arange(t)[None, :, None] * self.block
                      + starts.astype(np.int64))
            mask = (
                (valid != 0)
                & (sig_ok != 0)
                & (gstart < n)
                & (rate_idx >= 0)
                & (length >= 1)
                & (length <= self.phy.max_psdu_bytes)
            )
            if self.mesh is not None and self.frontend is None:
                # mirror StreamExecutor._collect: a SIGNAL read through an
                # open-chain zero halo (instead of real neighbour samples)
                # may parse to a wrong (rate, length) and burn the dedup key
                # before the overlapped re-scan supplies the true candidate
                ti_idx = np.arange(t)[None, :, None]
                win_end = gstart - sync.MARGIN + _SIG_WLEN
                owned_end = offset + t * self.block
                untrusted = ((ti_idx == t - 1) & (win_end > owned_end)
                             & (owned_end < n))
                untrusted |= ((ti_idx == 0) & (offset > 0)
                              & (gstart - sync.MARGIN < offset))
                mask &= ~untrusted
            for ci, ti, ki in np.argwhere(mask):
                key = (int(ci), int(gstart[ci, ti, ki]))
                if key in seen:
                    continue
                seen.add(key)
                cands.append(_Candidate(
                    channel=key[0],
                    global_start=key[1],
                    cfo=float(cfo[ci, ti, ki]),
                    frame_start=int(frame_start[ci, ti, ki]),
                    rate_idx=int(rate_idx[ci, ti, ki]),
                    length=int(length[ci, ti, ki]),
                ))
        return cands

    # -- stage B -------------------------------------------------------

    def _cut_window(self, stream: np.ndarray, ch: int, gstart: int,
                    wlen: int) -> np.ndarray:
        """Window origin = gstart - MARGIN, matching stage A's extraction
        (zero-filled outside the stream), so stage-A frame_start/cfo apply."""
        out = np.zeros(wlen, dtype=np.complex64)
        s = gstart - sync.MARGIN
        lo, hi = max(s, 0), min(s + wlen, stream.shape[1])
        if hi > lo:
            out[lo - s : lo - s + hi - lo] = stream[ch, lo:hi]
        return out

    def _dispatch_bucket(self, stream: np.ndarray, bucket: list[_Candidate]):
        """Async-dispatch one (MCS, length) bucket decode; returns
        (bucket, plan, ln, packed_device_array) — the fetch happens later
        in _finish_bucket so bucket dispatches pipeline instead of paying
        one device->host round trip each (VERDICT r3 item 3)."""
        mcs, ln = bucket[0].rate_idx, bucket[0].length
        eq = (self.phy.lms_mu, self.phy.sta_alpha, self.phy.sta_beta)
        b = len(bucket)
        # pad the batch to the next power of two: compile count per plan is
        # O(log max_batch) instead of one program per batch size
        b_pad = 1 << (b - 1).bit_length()
        cfo = np.zeros(b_pad, dtype=np.float32)
        fstart = np.zeros(b_pad, dtype=np.int32)
        for i, cand in enumerate(bucket):
            cfo[i] = cand.cfo
            fstart[i] = cand.frame_start
        if self.mesh is None:
            # local mode: gather windows on-device from the resident
            # stream — only per-candidate scalars cross the wire
            fn, plan, wlen = _stage_b_fn_resident(
                mcs, ln, int(self.algo), self.capture_symbols, eq)
            ch = np.zeros(b_pad, dtype=np.int32)
            origin = np.zeros(b_pad, dtype=np.int32)
            for i, cand in enumerate(bucket):
                ch[i] = cand.channel
                # padded index of global sample s is s + HALO_LEFT; the
                # window origin matches stage A's extraction (gstart -
                # MARGIN), so stage-A frame_start/cfo apply unchanged
                origin[i] = cand.global_start - sync.MARGIN + HALO_LEFT
            packed = fn(self._dev_stream, jnp.asarray(ch), jnp.asarray(origin),
                        jnp.asarray(cfo), jnp.asarray(fstart))
        elif self.frontend is not None:
            # mesh mode + front-end: the host stream is INPUT rate, so
            # cut input-rate windows and correct them inside the bucket
            # jit (per-candidate exact phase scalar from the host)
            fn, plan, wlen, wlen_in = _stage_b_fn_frontend(
                mcs, ln, int(self.algo), self.capture_symbols, eq,
                self.cfg.frontend)
            raw = np.zeros((b_pad, wlen_in), dtype=np.complex64)
            tau = np.zeros(b_pad, dtype=np.float32)
            n_in = stream.shape[1]
            for i, cand in enumerate(bucket):
                in_cut, tau[i] = self.frontend.block_cut(
                    cand.global_start - sync.MARGIN, wlen)
                lo, hi = max(in_cut, 0), min(in_cut + wlen_in, n_in)
                if hi > lo:
                    raw[i, lo - in_cut : lo - in_cut + hi - lo] = (
                        stream[cand.channel, lo:hi])
            wire = quantize_wire(to_riq(raw), self.cfg.wire_format)
            packed = fn(jnp.asarray(wire), jnp.asarray(tau),
                        jnp.asarray(cfo), jnp.asarray(fstart))
        else:
            fn, plan, wlen = _stage_b_fn(
                mcs, ln, int(self.algo), self.capture_symbols, eq)
            raw = np.zeros((b_pad, wlen), dtype=np.complex64)
            for i, cand in enumerate(bucket):
                raw[i] = self._cut_window(
                    stream, cand.channel, cand.global_start, wlen)
            wire = quantize_wire(to_riq(raw), self.cfg.wire_format)
            packed = fn(jnp.asarray(wire), jnp.asarray(cfo),
                        jnp.asarray(fstart))
        return bucket, plan, ln, packed

    def _finish_bucket(self, pending) -> list[FrameRecord]:
        """Fetch one dispatched bucket and build its frame records."""
        bucket, plan, ln, packed_dev = pending
        packed = np.asarray(packed_dev)
        psdu = packed[:, :ln].astype(np.uint8)
        parity, snr = packed[:, ln], packed[:, ln + 1]
        symbols = None
        if self.capture_symbols:
            flat = packed[:, ln + 2:]
            half = flat.shape[1] // 2
            symbols = (flat[:, :half] + 1j * flat[:, half:]).astype(
                np.complex64).reshape(len(packed), plan.n_sym, 48)
        recs = []
        for i, cand in enumerate(bucket):
            recs.append(FrameRecord(
                channel=cand.channel,
                global_start=cand.global_start,
                psdu=psdu[i],
                parity_ok=bool(parity[i]),
                rate_idx=cand.rate_idx,
                length=ln,
                cfo=cand.cfo,
                snr_db=float(snr[i]),
                eq_symbols=None if symbols is None else symbols[i],
            ))
        return recs

    def _stage_b_dispatch(self, stream: np.ndarray,
                          cands: list[_Candidate]) -> list:
        buckets: dict[tuple[int, int], list[_Candidate]] = {}
        for cand in cands:
            buckets.setdefault((cand.rate_idx, cand.length), []).append(cand)
        with self.tracer.stage("stage_b", frames=len(cands)):
            return [self._dispatch_bucket(stream, b) for b in buckets.values()]

    def run(self, stream: np.ndarray) -> list[FrameRecord]:
        """Process a (channels, n_samples) stream of UNKNOWN per-frame MCS;
        returns frame records sorted by (channel, global_start).

        All device work is dispatched ahead of any fetch: stage B of
        super-block k overlaps stage A of k+1 on the device queue, and
        bucket results are fetched lazily — as ONE combined fetch per
        drain when several buckets are pending (each device->host fetch
        costs a full round trip on a tunneled chip: 8-bucket mixed-rate
        traffic would otherwise spend ~85% of its wall time fetching).
        In-flight buckets are bounded (drained every MAX_PENDING_BUCKETS)
        so device memory and the concat program's operand count stay
        O(1) in stream length."""
        stream = np.atleast_2d(np.ascontiguousarray(stream, dtype=np.complex64))
        n = self.effective_len(stream.shape[1])
        seen: set[tuple[int, int]] = set()
        pending: list = []
        records: list[FrameRecord] = []
        try:
            for offset, outs, span in self._stepped(stream):
                cands = self._collect_candidates(offset, outs, n, span, seen)
                pending.extend(self._stage_b_dispatch(stream, cands))
                if len(pending) >= self.MAX_PENDING_BUCKETS:
                    self._drain(pending, records)
            self._drain(pending, records)
        finally:
            self._dev_stream = None        # release the resident HBM copy
        return sorted(records, key=lambda r: (r.channel, r.global_start))

    # drain threshold: far above any one super-block's bucket fan-out
    # (8 rates x a few lengths) yet small enough that in-flight packed
    # rows and the combined-fetch concat stay bounded on long streams
    MAX_PENDING_BUCKETS = 64

    def _drain(self, pending: list, records: list) -> None:
        """Fetch every pending bucket (one combined round trip when more
        than one is in flight) and append their frame records."""
        if not pending:
            return
        with self.tracer.stage("stage_b_fetch", frames=len(pending)):
            if len(pending) > 1:
                # one tiny on-device concat program -> one fetch for all
                # buckets. The concat signature is canonicalized (each
                # bucket zero-padded to a pow2 length, sorted descending)
                # so diverse long-lived traffic compiles O(few) concat
                # programs instead of one per (b_pad, row_len) mix.
                sizes = [int(np.prod(p[3].shape)) for p in pending]
                pad_sizes = [1 << max(s - 1, 0).bit_length() for s in sizes]
                order = sorted(range(len(pending)),
                               key=lambda i: -pad_sizes[i])
                flat = np.asarray(_concat_packed(tuple(
                    _ravel_pad(pending[i][3], pad_sizes[i]) for i in order)))
                off = 0
                for i in order:
                    p = pending[i]
                    packed = flat[off : off + sizes[i]].reshape(p[3].shape)
                    off += pad_sizes[i]
                    records.extend(self._finish_bucket(
                        (p[0], p[1], p[2], packed)))
            else:
                records.extend(self._finish_bucket(pending[0]))
        pending.clear()
