"""Typed configuration for the TPU-native 802.11a framework.

Replaces the reference's three ad-hoc config mechanisms (GRC variable blocks
with Qt getter/setter plumbing, module-level app constants, and an empty
``codec/config.json``) with one typed dataclass layer — see SURVEY.md §5
"Config / flag system".

Reference parameter provenance:
  - encoding enum:        IRS_user.py:130-132 (ieee802_11.Encoding values)
  - bandwidth choices:    IRS_AP.py:88-91 / IRS_user.py:89-91 (1/5/10/20 MS/s)
  - sync parameters:      IRS_AP.py:268-269, wifi_phy_hier.grc:63,690
    (threshold 0.56, min_plateau 2, sync_length 320)
  - max_symbols:          wifi_phy_hier.grc:51
    (int(5 + 1 + ((16 + 800*8 + 6)*2)/24) = 541)
  - pdu length range:     IRS_user.py:104 (10..500 B, default 50)
  - chan_est algorithms:  IRS_AP.py:139-141 (LS / LMS / COMB / STA)
"""

from __future__ import annotations

import dataclasses
import enum


class Encoding(enum.IntEnum):
    """MCS indices, value-compatible with the reference's ieee802_11.Encoding
    (IRS_user.py:130-132)."""

    BPSK_1_2 = 0
    BPSK_3_4 = 1
    QPSK_1_2 = 2
    QPSK_3_4 = 3
    QAM16_1_2 = 4
    QAM16_3_4 = 5
    QAM64_2_3 = 6
    QAM64_3_4 = 7


class ChannelEstimator(enum.IntEnum):
    """Channel-estimation algorithms, value-compatible with
    ieee802_11.frame_equalizer's algo argument (IRS_AP.py:139-141)."""

    LS = 0
    LMS = 1
    COMB = 2
    STA = 3


@dataclasses.dataclass(frozen=True)
class PhyConfig:
    """Static PHY configuration (everything that fixes compiled shapes)."""

    bandwidth: float = 10e6            # Hz; reference default 10 MHz (wifi_phy_hier.grc:83-99)
    frequency: float = 5.89e9          # Hz carrier (wifi_phy_hier.grc:501-517)
    encoding: Encoding = Encoding.QPSK_1_2   # reference live default (IRS_user.py:82)
    chan_est: ChannelEstimator = ChannelEstimator.LS
    sync_threshold: float = 0.56       # sync_short plateau threshold (IRS_AP.py:268)
    min_plateau: int = 2               # sync_short min plateau (IRS_AP.py:268)
    sync_length: int = 320             # sync_long search window (IRS_AP.py:269)
    max_psdu_bytes: int = 800          # PHY buffer sizing assumption (wifi_phy_hier.grc:51)
    # LMS/STA tracker gains: data-backed defaults from the fading-waterfall
    # sweep (tune_equalizer.py, docs/equalizer_tuning.md, 2026-08-21).
    # lms_mu = 0.5 minimized PER at every wander depth without regressing
    # the static channel; STA wants heavy temporal but LIGHT carrier
    # smoothing — beta 0.5 biases the estimate on frequency-selective
    # channels (PER 0.28 vs 0.06 on mild fading), 0.125 dominates.
    lms_mu: float = 0.5                # LMS update gain (frame_equalizer algo=LMS)
    sta_alpha: float = 0.5             # STA smoothing across symbols
    sta_beta: float = 0.125            # STA smoothing across carriers

    @property
    def max_symbols(self) -> int:
        """Max OFDM data symbols a frame may occupy (wifi_phy_hier.grc:51).

        5 STF + 1 SIGNAL "symbols" of margin plus the BPSK-1/2 worst case of
        (16 service + 8*max_psdu + 6 tail) coded bits at 24 data bits/symbol.
        """
        return int(5 + 1 + ((16 + self.max_psdu_bytes * 8 + 6) * 2) / 24)


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Sample-rate-conversion front-end for the streaming executors — the
    polyphase-resampler stage of the RX chain (BASELINE.json north star).

    The reference has no resampler block: rate matching is SDR hardware
    sample-rate config (IRS_AP.py:88-91). Here the executor ingests a
    stream at ``nominal * resample[1]/resample[0] * (1 + ppm*1e-6)`` and
    corrects it to the nominal 20 MS/s grid ON DEVICE before sync:

      resample: (L, M) rational ratio — an input oversampled M/L times
                is decimated/resampled by L/M (e.g. (1, 2) for a 2x-
                oversampled capture).
      ppm:      residual TX/RX sample-clock offset to undo (the stream
                was produced by a clock running (1 + ppm*1e-6) fast),
                exactly channel.model.sample_clock_offset's convention.

    parallel/frontend.py factors the combined exact ratio into up to two
    device stages (integer-decimation FIR + fractional-delay clock trim)
    with a general polyphase fallback.
    """

    resample: tuple[int, int] = (1, 1)
    ppm: float = 0.0
    taps_per_phase: int = 12           # anti-alias FIR length per decim phase
    frac_taps: int = 32                # fractional-delay interpolator taps
    sub_block: int = 512               # clock-trim granularity (samples);
                                       # timing ripple = sub_block * |ppm| * 1e-6


@dataclasses.dataclass(frozen=True)
class ExecutorConfig:
    """Streaming block-executor configuration (the GNU Radio scheduler
    replacement — SURVEY.md §2.5, §7 step 6)."""

    frontend: FrontendConfig | None = None   # sample-rate front-end (None = off)
    block_size: int = 1 << 16          # samples per time-block per shard
    halo: int = 4096                   # left-halo samples (>= sync_length + frame tail)
    max_frames_per_block: int = 8      # fixed frame-candidate slots per block
    channels: int = 1                  # parallel 20 MHz channels (mesh axis "channel")
    time_shards: int = 1               # time-block shards (mesh axis "time")
    wire_format: str = "f32"           # host->device sample format: "f32"
                                       # (float32 I/Q), "sc16" (int16 I/Q,
                                       # UHD's native over-the-wire format —
                                       # half the ingest bytes), or "sc8"
                                       # (int8 I/Q, the HackRF's native ADC
                                       # format, IRS_user.py:161-173 — a
                                       # quarter of the ingest bytes;
                                       # ~44 dB SNR floor, comfortably
                                       # above 64-QAM 3/4's ~26 dB need)


@dataclasses.dataclass(frozen=True)
class AppConfig:
    """Application-layer constants (upload/download apps).

    Reference provenance: HOST/PORT constants upload_featuremap_udp.py:20-22,
    download_featuremap_udp.py:18-22; image size upload_image_udp.py:21;
    piece spacing upload_image_udp.py:33.
    """

    tx_host: str = "127.0.0.1"
    tx_port: int = 52001               # app -> radio UDP (IRS_user.grc:311-318)
    rx_host: str = "127.0.0.1"
    rx_port: int = 10010               # radio -> app UDP (IRS_AP_epy_block_2.py:38)
    image_size: tuple[int, int] = (300, 300)
    piece_size: tuple[int, int] = (10, 10)
    piece_interval_s: float = 0.05
    pdu_length: int = 50               # frame payload bytes (IRS_user.py:104)
