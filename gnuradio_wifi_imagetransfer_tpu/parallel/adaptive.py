"""Adaptive-MCS receiver: SIGNAL-steered per-frame decode.

The reference RX never knows the MCS in advance — ieee802_11.frame_equalizer
decodes the SIGNAL field of each detected frame (rate + length,
IRS_AP.py:271) and decode_mac then processes that frame with the decoded
parameters (wifi_phy_hier.grc:533-549), so TX-side encoding changes
(IRS_user.py:130-132, GUI-selectable 0..7) need no RX reconfiguration.

TPU rebuild: data-dependent shapes can't steer a single jit, so reception is
split into two stages around a host dispatch. (This module is the simple
single-stream form; the sharded streaming form with tiny SIGNAL-only
stage-A windows is parallel/executor.py's AdaptiveStreamExecutor — prefer
it for anything beyond one-shot buffers.)

  stage A (one jit, static shapes): dense sync front-end over the raw
    stream + SIGNAL-only decode for every candidate — windows are cut long
    enough for the largest allowed PSDU at the slowest rate (the
    reference's own buffer-sizing trick: max_symbols=541 for an 800-byte
    PSDU, wifi_phy_hier.grc:51);
  host dispatch: bucket valid candidates by decoded (rate_idx, length);
  stage B (one cached jit per distinct (MCS, length) bucket —
    rx.jitted_decode_aligned's lru cache): full payload decode with static
    shapes. Image transfer uses one payload size, so steady state is
    exactly two compiled programs.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator, PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import params, rx, signal_field, sync, tx
from gnuradio_wifi_imagetransfer_tpu.utils.xfer import from_riq, to_riq


@dataclasses.dataclass
class AdaptiveFrame:
    """One frame decoded with runtime-detected parameters."""

    start: int              # sync-edge sample index in the input stream
    rate_idx: int           # decoded MCS 0..7
    length: int             # decoded PSDU byte count
    psdu: np.ndarray        # (length,) uint8
    sig_ok: bool            # SIGNAL parity + tail check
    cfo: float


class AdaptiveReceiver:
    """Receive frames of unknown MCS/length from a raw sample stream."""

    def __init__(self, max_psdu: int = 800, max_frames: int = 8,
                 phy_cfg: PhyConfig = PhyConfig(),
                 algo: ChannelEstimator = ChannelEstimator.LS):
        self.max_psdu = max_psdu
        self.max_frames = max_frames
        self.phy = phy_cfg
        self.algo = algo
        # worst case: largest PSDU at the slowest rate (MCS 0)
        self.n_sym_max = params.n_symbols(0, max_psdu)
        self.wlen = sync.window_len(self.n_sym_max)
        self._stage_a = self._build_stage_a()

    def _build_stage_a(self):
        @jax.jit
        def stage_a(x_riq):
            x = from_riq(x_riq)
            windows, frame_start, cand = sync.synchronize(
                x, self.n_sym_max, self.max_frames, self.phy)
            # SIGNAL-only decode: LTF channel estimate + first symbol
            ltf1, ltf2, spectra = rx.frame_spectra(windows, 1, frame_start)
            from gnuradio_wifi_imagetransfer_tpu.phy import equalizer

            h0 = equalizer.ls_estimate(ltf1, ltf2)
            eq, _ = equalizer.equalize(spectra, h0, symbol_index0=0,
                                       algo=self.algo)
            sig = signal_field.decode(eq[..., 0, :])
            win_riq = jnp.stack(
                [jnp.real(windows), jnp.imag(windows)], axis=-1
            ).astype(jnp.float32)          # device-side to_riq
            return (win_riq, frame_start,
                    cand.valid.astype(jnp.uint8), cand.starts, cand.cfo,
                    sig["rate_idx"], sig["length"],
                    sig["parity_ok"].astype(jnp.uint8))

        return stage_a

    def receive(self, x: np.ndarray) -> list[AdaptiveFrame]:
        """x: (N,) complex64 raw samples -> decoded frames, SIGNAL-steered.

        N must be >= the worst-case extraction window (window_len of the
        configured max_psdu); pad shorter streams.
        """
        x = np.asarray(x, dtype=np.complex64)
        if x.size < self.wlen:
            x = np.pad(x, (0, self.wlen - x.size))
        (win_riq, frame_start, valid, starts, cfo, rate_idx, length,
         sig_ok) = map(np.asarray, self._stage_a(jnp.asarray(to_riq(x))))

        frames: list[AdaptiveFrame] = []
        # bucket candidate slots by decoded (mcs, length) for batched stage B
        buckets: dict[tuple[int, int], list[int]] = {}
        for k in range(self.max_frames):
            if not valid[k] or not sig_ok[k]:
                continue
            mcs, ln = int(rate_idx[k]), int(length[k])
            if mcs < 0 or not (1 <= ln <= self.max_psdu):
                continue
            buckets.setdefault((mcs, ln), []).append(k)

        for (mcs, ln), slots in buckets.items():
            fn, plan = rx.jitted_decode_aligned(mcs, ln, int(self.algo))
            w = from_riq(jnp.asarray(win_riq[slots]))
            psdu, _, _, _ = fn(w, jnp.asarray(frame_start[slots]))
            psdu = np.asarray(psdu)
            for i, k in enumerate(slots):
                frames.append(AdaptiveFrame(
                    start=int(starts[k]), rate_idx=mcs, length=ln,
                    psdu=psdu[i], sig_ok=True, cfo=float(cfo[k])))
        frames.sort(key=lambda f: f.start)
        return frames
