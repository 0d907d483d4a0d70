"""Socket-PDU UDP bridge and the software loopback radio.

Replaces the reference's process topology (SURVEY.md §1 control/data-plane
split) with drop-in port compatibility:

  app --UDP 52001--> [radio] --UDP 10010--> app

* UdpSource  = network.socket_pdu('UDP_SERVER', '', 52001, 10000)
  (IRS_user.grc:299-318): each datagram becomes one MAC payload.
* UdpSink    = the "Extract Pics" embedded block (IRS_AP_epy_block_2.py:
  27-41): strips the 24-byte MAC header + 4-byte length prefix and
  forwards the payload to localhost:10010.
* LoopbackRadio = the IRS_tranceiver flowgraph (SURVEY.md §3.5): MAC ->
  802.11a TX -> multiply 10^(snr/20) -> channel_model -> full RX (sync +
  decode) -> MAC parse -> UDP out, with the whole PHY running as one
  batched jit on the accelerator. Datagrams are micro-batched so the
  device sees frame batches, not single frames.
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from typing import Optional

import numpy as np

from gnuradio_wifi_imagetransfer_tpu.config import AppConfig, PhyConfig
from gnuradio_wifi_imagetransfer_tpu.phy import mac as macmod


class UdpSource:
    """UDP server socket -> payload queue (socket_pdu equivalent)."""

    def __init__(self, host: str = "0.0.0.0", port: int = 52001, mtu: int = 10000):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # deep kernel buffer (capped by net.core.rmem_max): app senders
        # burst faster than the GIL-bound drain thread during device
        # dispatch; the ~208 KiB default silently drops the overflow
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                             4 * 1024 * 1024)
        self.sock.bind((host, port))
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self.q: "queue.Queue[bytes]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self.mtu = mtu

    def start(self):
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(self.mtu)
                self.q.put(data)
            except socket.timeout:
                continue
            except OSError:
                break

    def drain(self, max_items: int, timeout: float = 0.05) -> list[bytes]:
        """Collect up to max_items pending datagrams (micro-batching)."""
        out = []
        deadline = time.monotonic() + timeout
        while len(out) < max_items:
            try:
                remaining = max(deadline - time.monotonic(), 0)
                out.append(self.q.get(timeout=remaining if not out else 0.0))
            except queue.Empty:
                break
        return out

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():             # join() before start() raises
            self._thread.join(timeout=1.0)
        self.sock.close()


class UdpSink:
    """MAC payload -> strip 4-byte prefix -> UDP sendto (Extract Pics)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 10010):
        self.addr = (host, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send_mac_payload(self, payload: bytes):
        """payload = MPDU body after the 24-byte header; the sender's
        4-byte length prefix is dropped (IRS_AP_epy_block_2.py:34-38)."""
        self.sock.sendto(payload[4:], self.addr)

    def close(self):
        self.sock.close()


def make_udp_source(host: str = "0.0.0.0", port: int = 52001,
                    mtu: int = 10000):
    """socket_pdu source factory: native C++ receive thread when the
    toolchain is available (runtime/native.py), Python thread otherwise.
    Both expose start()/drain()/stop()/.port."""
    from gnuradio_wifi_imagetransfer_tpu.runtime import native

    if native.available():
        try:
            return native.NativeUdpSource(host, port, mtu)
        except OSError:
            pass
    return UdpSource(host, port, mtu)


class NativeExtractSink:
    """UdpSink (Extract Pics) over the native UDP sender."""

    def __init__(self, host: str = "127.0.0.1", port: int = 10010):
        from gnuradio_wifi_imagetransfer_tpu.runtime import native

        self._sink = native.NativeUdpSink(host, port)

    def send_mac_payload(self, payload: bytes):
        self._sink.send(payload[4:])

    def close(self):
        self._sink.close()


def make_udp_sink(host: str = "127.0.0.1", port: int = 10010):
    """Extract-Pics sink factory (native when available)."""
    from gnuradio_wifi_imagetransfer_tpu.runtime import native

    if native.available():
        try:
            return NativeExtractSink(host, port)
        except OSError:
            pass
    return UdpSink(host, port)


class LoopbackRadio:
    """Software transceiver: UDP in -> 802.11a PHY loopback -> UDP out.

    Equivalent to running IRS_tranceiver.grc (SURVEY.md §4.1): the de-facto
    integration harness, with SNR/CFO knobs matching its GUI sliders
    (snr 20-30 dB, epsilon +-20e-6; IRS_tranceiver.py:98,121).
    """

    def __init__(
        self,
        in_port: int = 52001,
        out_host: str = "127.0.0.1",
        out_port: int = 10010,
        mcs: int = 3,                    # loopback default QPSK 3/4 (IRS_tranceiver.py:91)
        snr_db: float = 22.0,
        epsilon: float = 0.0,
        phy_cfg: PhyConfig = PhyConfig(),
        batch: int = 8,
        seed: int = 0,
        probes: bool = False,
    ):
        from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator
        from gnuradio_wifi_imagetransfer_tpu.utils import tracing

        self.source = make_udp_source(port=in_port)
        self.sink = make_udp_sink(out_host, out_port)
        self.mcs = mcs
        self.snr_db = snr_db
        self.epsilon = epsilon
        self.chan_est = ChannelEstimator(phy_cfg.chan_est)
        self.cfg = phy_cfg
        self.batch = batch
        self.mac = macmod.Mac()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._rng = np.random.default_rng(seed)
        self.stats = {"datagrams_in": 0, "frames_ok": 0, "frames_crc_fail": 0}
        # headless GUI-sink analogues (constellation / spectrum / SNR),
        # populated when probes=True — see RxRadio for the split-topology
        # equivalents (IRS_AP.py:178-266 Qt sinks)
        self.probes = probes
        self.constellation = tracing.ConstellationProbe()
        self.spectrum = tracing.SpectrumProbe()
        self.snr_probe = tracing.SnrProbe(alpha=0.05)

    @property
    def in_port(self) -> int:
        return self.source.port

    # -- live reconfiguration (the GUI-variable setters of the reference
    #    top blocks: set_encoding IRS_user.py:221-273, snr/epsilon sliders
    #    IRS_tranceiver.py:370-375,429-434). Attribute stores are atomic;
    #    the radio thread reads them per batch, and SNR/CFO are traced
    #    arguments of the compiled radio function, so already-compiled
    #    (mcs, length) buckets retune on the very next batch. ----------

    def set_encoding(self, mcs: int) -> None:
        """Live MCS change (reference wifi_phy_hier.set_encoding)."""
        self.mcs = int(mcs)

    set_mcs = set_encoding

    def set_snr(self, snr_db: float) -> None:
        self.snr_db = float(snr_db)

    def set_epsilon(self, epsilon: float) -> None:
        self.epsilon = float(epsilon)

    def set_chan_est(self, algo) -> None:
        """Live equalizer-algorithm change (IRS_AP.py:139-141). Changes
        the compiled program, so it keys the jit cache like MCS."""
        from gnuradio_wifi_imagetransfer_tpu.config import ChannelEstimator

        self.chan_est = ChannelEstimator(algo)

    def start(self):
        self.source.start()
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():             # join() before start() raises
            self._thread.join(timeout=5.0)
        self.source.stop()
        self.sink.close()

    # -- the radio loop ----------------------------------------------------

    def _run(self):
        import jax
        import jax.numpy as jnp

        from gnuradio_wifi_imagetransfer_tpu.channel import model as chmodel
        from gnuradio_wifi_imagetransfer_tpu.phy import sync, tx
        from gnuradio_wifi_imagetransfer_tpu.utils.xfer import from_riq, to_host, to_riq

        def to_riq_traced(z):
            # device-side riq split (the axon tunnel cannot fetch complex)
            return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(
                jnp.float32)

        jitted = {}

        def process(payloads: list[bytes]):
            # snapshot the live-tunable attributes ONCE per batch: reading
            # self.mcs/self.chan_est again inside the compile branch would
            # race a concurrent set_encoding()/set_chan_est() and cache a
            # program compiled for the NEW setting under the OLD key —
            # permanently poisoning that bucket
            mcs_now = self.mcs
            algo_now = self.chan_est
            # bucket by equal length so shapes stay static per compile
            by_len: dict[int, list[bytes]] = {}
            for p in payloads:
                by_len.setdefault(len(p), []).append(p)
            for ln, group in by_len.items():
                # pad to the fixed batch size (repeat last payload) so each
                # (mcs, length) bucket compiles exactly once; duplicate
                # decodes are harmless to the idempotent piece receiver
                n_real = len(group)
                while len(group) < self.batch:
                    group.append(group[-1])
                mpdus = np.stack([
                    np.frombuffer(self.mac.frame(p), dtype=np.uint8) for p in group
                ])
                L = mpdus.shape[1]
                # snr/epsilon are TRACED arguments (live retune without
                # recompiling); mcs/length/algo change the program shape
                # and key the cache
                key = (mcs_now, L, mpdus.shape[0], int(algo_now),
                       self.probes)
                if key not in jitted:
                    plan = tx.tx_plan(mcs_now, L)
                    algo = algo_now
                    capture = self.probes

                    def radio_fn(mpdus_in, noise_key, snr_db, foff,
                                 plan=plan, algo=algo, capture=capture):
                        bursts = tx.transmit_traced(mpdus_in, plan)
                        stream = tx.pad_burst(bursts, 100, 400, scale=0.6).reshape(-1)
                        y = chmodel.channel_model(
                            noise_key, stream, noise_voltage=1.0,
                            frequency_offset=foff, snr_db=snr_db)
                        res, cand = sync.receive(y, plan, max_frames=2 * mpdus_in.shape[0],
                                                 cfg=self.cfg, algo=algo)
                        eq_riq = (to_riq_traced(res.eq_symbols) if capture
                                  else jnp.zeros((0, 2)))
                        psd_riq = (to_riq_traced(y[: 1 << 13]) if capture
                                   else jnp.zeros((0, 2)))
                        return (res.psdu,
                                cand.valid.astype(jnp.uint8),
                                res.sig["parity_ok"].astype(jnp.uint8),
                                eq_riq, psd_riq)

                    jitted[key] = jax.jit(radio_fn)
                fn = jitted[key]
                k = jax.random.key(int(self._rng.integers(0, 2**31)))
                foff = chmodel.epsilon_to_frequency_offset(
                    self.epsilon, self.cfg.frequency)
                psdu, valid, parity, eq_riq, psd_riq = map(np.asarray, fn(
                    jnp.asarray(mpdus), k, jnp.float32(self.snr_db),
                    jnp.float32(foff)))
                if self.probes and psd_riq.size:
                    self.spectrum.update(psd_riq[..., 0] + 1j * psd_riq[..., 1])
                for i in range(psdu.shape[0]):
                    if not (valid[i] and parity[i]):
                        continue
                    frame = macmod.parse(psdu[i].tobytes())
                    if not frame.fcs_ok:
                        self.stats["frames_crc_fail"] += 1
                        continue
                    self.stats["frames_ok"] += 1
                    if self.probes and eq_riq.size:
                        syms = eq_riq[i, ..., 0] + 1j * eq_riq[i, ..., 1]
                        self.constellation.push(syms)
                        self.snr_probe.update(syms)
                    self.sink.send_mac_payload(frame.payload)

        while not self._stop.is_set():
            payloads = self.source.drain(self.batch, timeout=0.1)
            if not payloads:
                continue
            self.stats["datagrams_in"] += len(payloads)
            try:
                process(payloads)
            except Exception as e:  # keep the radio alive on bad input
                print(f"LoopbackRadio: dropped batch ({type(e).__name__}: {e})")


# ---------------------------------------------------------------------------
# Split TX / RX radios (the IRS_user / IRS_AP two-node topology)
# ---------------------------------------------------------------------------

_SAMP_CHUNK = 4096      # samples per UDP sample datagram (16 KiB of sc16)


class TxRadio:
    """The IRS_user node: UDP payloads -> MAC -> 802.11a TX -> sc16 I/Q
    sample datagrams (the role of the SoapySDR HackRF sink,
    IRS_user.py:161-173, with UDP standing in for RF).

    Samples leave as raw interleaved int16 I/Q (UHD's native over-the-wire
    format) in _SAMP_CHUNK-sample datagrams.
    """

    def __init__(self, in_port: int = 52001, samp_host: str = "127.0.0.1",
                 samp_port: int = 52100, mcs: int = 2, scale: float = 0.5,
                 batch: int = 4, phy_cfg: PhyConfig = PhyConfig()):
        self.source = make_udp_source(port=in_port)
        self.samp_addr = (samp_host, samp_port)
        self.samp_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.mcs = mcs
        self.scale = scale
        self.batch = batch
        self.cfg = phy_cfg
        self.mac = macmod.Mac()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self.stats = {"datagrams_in": 0, "frames_tx": 0, "samples_tx": 0}

    @property
    def in_port(self) -> int:
        return self.source.port

    def start(self):
        self.source.start()
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():     # join() before start() raises
            self._thread.join(timeout=5.0)
        self.source.stop()
        self.samp_sock.close()

    def _emit(self, samples: np.ndarray):
        from gnuradio_wifi_imagetransfer_tpu.utils.xfer import quantize_sc16, to_riq

        sc16 = quantize_sc16(to_riq(samples))              # (N, 2) int16
        for lo in range(0, sc16.shape[0], _SAMP_CHUNK):
            self.samp_sock.sendto(sc16[lo : lo + _SAMP_CHUNK].tobytes(),
                                  self.samp_addr)
        self.stats["samples_tx"] += int(sc16.shape[0])

    def _run(self):
        import jax
        import jax.numpy as jnp

        from gnuradio_wifi_imagetransfer_tpu.phy import tx
        from gnuradio_wifi_imagetransfer_tpu.utils.xfer import to_host

        while not self._stop.is_set():
            payloads = self.source.drain(self.batch, timeout=0.1)
            if not payloads:
                continue
            self.stats["datagrams_in"] += len(payloads)
            try:
                by_len: dict[int, list[bytes]] = {}
                for p in payloads:
                    by_len.setdefault(len(p), []).append(p)
                for group in by_len.values():
                    n_real = len(group)
                    # pad to the fixed batch so each length bucket compiles
                    # once; duplicate frames are deduped by the receiver
                    while len(group) < self.batch:
                        group.append(group[-1])
                    mpdus = np.stack([
                        np.frombuffer(self.mac.frame(p), dtype=np.uint8)
                        for p in group])
                    bursts = tx.transmit(
                        jnp.asarray(mpdus), self.mcs,
                        scrambler_seed=jnp.arange(1, len(group) + 1))
                    stream = to_host(tx.pad_burst(
                        bursts, 100, 1000, scale=self.scale).reshape(-1))
                    self._emit(stream)
                    self.stats["frames_tx"] += n_real
            except Exception as e:
                print(f"TxRadio: dropped batch ({type(e).__name__}: {e})")


class RxRadio:
    """The IRS_AP node: sc16 I/Q sample datagrams -> SIGNAL-steered
    streaming RX (AdaptiveStreamExecutor) -> MAC parse/FCS -> Extract-Pics
    UDP out (IRS_AP.py:163-316 with UDP standing in for the USRP source).

    Samples accumulate into a ring of super-blocks; each processing pass
    keeps a worst-case-frame tail as overlap and dedups frames across
    passes by their absolute sample index.
    """

    def __init__(self, samp_port: int = 52100, out_host: str = "127.0.0.1",
                 out_port: int = 10010, chunk: int = 1 << 17,
                 exec_cfg=None, phy_cfg: PhyConfig = PhyConfig(),
                 algo=None, probes: bool = True):
        from gnuradio_wifi_imagetransfer_tpu.config import ExecutorConfig
        from gnuradio_wifi_imagetransfer_tpu.parallel.executor import (
            AdaptiveStreamExecutor,
        )
        from gnuradio_wifi_imagetransfer_tpu.phy import params as phyparams
        from gnuradio_wifi_imagetransfer_tpu.phy import sync as syncmod
        from gnuradio_wifi_imagetransfer_tpu.utils import tracing

        self.samp_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # sample datagrams arrive at wire rate: deep kernel buffer so a
        # processing pass doesn't drop the next chunk burst
        self.samp_sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                                  4 * 1024 * 1024)
        self.samp_sock.bind(("0.0.0.0", samp_port))
        self.samp_sock.settimeout(0.1)
        self.samp_port = self.samp_sock.getsockname()[1]
        self.sink = make_udp_sink(out_host, out_port)
        self.chunk = chunk
        if exec_cfg is None:
            exec_cfg = ExecutorConfig(block_size=1 << 15, time_shards=4,
                                      max_frames_per_block=16)
        # headless GUI-sink analogues (IRS_AP's constellation / freq sinks
        # + probe_mpsk_snr_est_c): equalized symbols, PSD, running SNR
        self.probes = probes
        self.constellation = tracing.ConstellationProbe()
        self.spectrum = tracing.SpectrumProbe()
        self.snr_probe = tracing.SnrProbe(alpha=0.05)
        self.ex = AdaptiveStreamExecutor(mesh=None, exec_cfg=exec_cfg,
                                         phy_cfg=phy_cfg, algo=algo,
                                         capture_symbols=probes)
        # overlap tail: the worst-case frame span at the slowest rate
        self.tail = syncmod.window_len(
            phyparams.n_symbols(0, phy_cfg.max_psdu_bytes))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self.stats = {"samples_in": 0, "frames_ok": 0, "frames_crc_fail": 0}

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread.is_alive():     # join() before start() raises
            self._thread.join(timeout=10.0)
        self.samp_sock.close()
        self.sink.close()

    def _run(self):
        from gnuradio_wifi_imagetransfer_tpu.utils.xfer import SC16_FULL_SCALE

        buf = np.zeros(0, np.complex64)
        base = 0                       # absolute index of buf[0]
        seen: set[int] = set()
        last_rx = time.monotonic()
        while not self._stop.is_set():
            try:
                data, _ = self.samp_sock.recvfrom(65536)
                sc16 = np.frombuffer(data, np.int16).reshape(-1, 2)
                samples = ((sc16[:, 0] + 1j * sc16[:, 1])
                           * (SC16_FULL_SCALE / 32767.0)).astype(np.complex64)
                buf = np.concatenate([buf, samples])
                self.stats["samples_in"] += samples.size
                last_rx = time.monotonic()
            except socket.timeout:
                pass
            except OSError:
                break
            idle = time.monotonic() - last_rx > 0.3
            if buf.size >= self.chunk or (idle and buf.size > self.tail):
                try:
                    self._process(buf, base, seen)
                except Exception as e:
                    print(f"RxRadio: dropped chunk ({type(e).__name__}: {e})")
                keep = min(self.tail, buf.size)
                base += buf.size - keep
                buf = buf[-keep:].copy()
                seen = {g for g in seen if g >= base}
                last_rx = time.monotonic()

    def _process(self, buf: np.ndarray, base: int, seen: set[int]):
        if self.probes:
            self.spectrum.update(buf[: 1 << 14])
        for rec in self.ex.run(buf):
            if not rec.parity_ok:
                continue
            if self.probes and rec.eq_symbols is not None:
                self.constellation.push(rec.eq_symbols)
                self.snr_probe.update(rec.eq_symbols)
            gidx = base + rec.global_start
            if gidx in seen or any(abs(gidx - s) <= 2 for s in seen):
                continue
            seen.add(gidx)
            frame = macmod.parse(rec.psdu.tobytes())
            if not frame.fcs_ok:
                self.stats["frames_crc_fail"] += 1
                continue
            self.stats["frames_ok"] += 1
            self.sink.send_mac_payload(frame.payload)
