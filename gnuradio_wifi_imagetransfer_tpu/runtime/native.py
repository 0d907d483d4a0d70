"""ctypes loader + wrappers for the native host runtime (native/gwt_native.cpp).

The reference's host runtime is C++ — GNU Radio's ring-buffer scheduler,
the socket_pdu UDP bridge (IRS_user.grc:299-318), and the ieee802_11.mac
framer/CRC (IRS_user.py:192). This module exposes their TPU-framework
equivalents to Python:

    RingBuffer       lock-free SPSC complex64 sample ring
    NativeUdpSource  threaded UDP PDU receiver (GIL-free recv loop)
    NativeUdpSink    UDP datagram sender
    crc32 / frame_batch / check_fcs_batch   MAC hot loops

The shared library is compiled lazily with g++ on first use and cached next
to the source; `available()` reports whether the native path is usable.
Callers keep a pure-Python fallback (phy/mac.py, runtime/bridge.py) so
correctness never depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "gwt_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libgwt_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.gwt_crc32.restype = ctypes.c_uint32
        lib.gwt_crc32.argtypes = [u8p, ctypes.c_int64]
        lib.gwt_frame_batch.restype = None
        lib.gwt_frame_batch.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_uint32, u8p, u8p, u8p, u8p]
        lib.gwt_check_fcs_batch.restype = None
        lib.gwt_check_fcs_batch.argtypes = [u8p, ctypes.c_int64,
                                            ctypes.c_int64, u8p]

        lib.gwt_ring_create.restype = ctypes.c_void_p
        lib.gwt_ring_create.argtypes = [ctypes.c_uint64]
        lib.gwt_ring_destroy.argtypes = [ctypes.c_void_p]
        for name in ("gwt_ring_capacity", "gwt_ring_available",
                     "gwt_ring_space"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_uint64
            fn.argtypes = [ctypes.c_void_p]
        lib.gwt_ring_write.restype = ctypes.c_uint64
        lib.gwt_ring_write.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint64]
        lib.gwt_ring_read.restype = ctypes.c_uint64
        lib.gwt_ring_read.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint64]

        lib.gwt_udp_source_create.restype = ctypes.c_void_p
        lib.gwt_udp_source_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                              ctypes.c_int, ctypes.c_int]
        lib.gwt_udp_source_port.restype = ctypes.c_int
        lib.gwt_udp_source_port.argtypes = [ctypes.c_void_p]
        lib.gwt_udp_source_drain.restype = ctypes.c_int
        lib.gwt_udp_source_drain.argtypes = [ctypes.c_void_p, u8p,
                                             ctypes.c_int64, i32p,
                                             ctypes.c_int, ctypes.c_int]
        lib.gwt_udp_source_destroy.argtypes = [ctypes.c_void_p]
        lib.gwt_udp_sink_create.restype = ctypes.c_void_p
        lib.gwt_udp_sink_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.gwt_udp_sink_send.restype = ctypes.c_int
        lib.gwt_udp_sink_send.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
        lib.gwt_udp_sink_destroy.argtypes = [ctypes.c_void_p]

        lib.gwt_scatter_bursts.restype = None
        lib.gwt_scatter_bursts.argtypes = [f32p, ctypes.c_int64,
                                           ctypes.c_int64, i64p,
                                           ctypes.c_float, f32p,
                                           ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------------
# MAC hot loops
# ---------------------------------------------------------------------------


def crc32(data: bytes | np.ndarray) -> int:
    lib = _load()
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else np.ascontiguousarray(data, dtype=np.uint8)
    return int(lib.gwt_crc32(_u8(buf), buf.size))


def frame_batch(payloads: np.ndarray, seq0: int, src: bytes, dst: bytes,
                bss: bytes) -> np.ndarray:
    """(B, L) payload bytes -> (B, L+28) MPDUs (native fast path)."""
    lib = _load()
    p = np.ascontiguousarray(payloads, dtype=np.uint8)
    b, l = p.shape
    out = np.empty((b, l + 28), dtype=np.uint8)
    lib.gwt_frame_batch(
        _u8(p), b, l, seq0 & 0xFFF,
        _u8(np.frombuffer(src, dtype=np.uint8)),
        _u8(np.frombuffer(dst, dtype=np.uint8)),
        _u8(np.frombuffer(bss, dtype=np.uint8)), _u8(out))
    return out


def check_fcs_batch(mpdus: np.ndarray) -> np.ndarray:
    lib = _load()
    m = np.ascontiguousarray(mpdus, dtype=np.uint8)
    b, n = m.shape
    ok = np.empty(b, dtype=np.uint8)
    lib.gwt_check_fcs_batch(_u8(m), b, n, _u8(ok))
    return ok.astype(bool)


def scatter_bursts(bursts: np.ndarray, positions: np.ndarray, n_out: int,
                   scale: float = 1.0) -> np.ndarray:
    """(B, L) complex64 bursts + (B,) start samples -> (n_out,) stream."""
    lib = _load()
    bb = np.ascontiguousarray(bursts, dtype=np.complex64)
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    out = np.empty(n_out, dtype=np.complex64)
    lib.gwt_scatter_bursts(
        _f32(bb.view(np.float32)), bb.shape[0], bb.shape[1],
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        float(scale), _f32(out.view(np.float32)), n_out)
    return out


# ---------------------------------------------------------------------------
# Ring buffer
# ---------------------------------------------------------------------------


class RingBuffer:
    """SPSC lock-free complex64 sample ring (GNU Radio buffer analogue)."""

    def __init__(self, capacity: int):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.gwt_ring_create(capacity)

    @property
    def capacity(self) -> int:
        return int(self._lib.gwt_ring_capacity(self._h))

    def available(self) -> int:
        return int(self._lib.gwt_ring_available(self._h))

    def space(self) -> int:
        return int(self._lib.gwt_ring_space(self._h))

    def write(self, samples: np.ndarray) -> int:
        x = np.ascontiguousarray(samples, dtype=np.complex64)
        return int(self._lib.gwt_ring_write(
            self._h, _f32(x.view(np.float32)), x.size))

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.complex64)
        got = int(self._lib.gwt_ring_read(
            self._h, _f32(out.view(np.float32)), n))
        return out[:got]

    def close(self):
        if self._h:
            self._lib.gwt_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# UDP PDU bridge
# ---------------------------------------------------------------------------


class NativeUdpSource:
    """socket_pdu('UDP_SERVER') equivalent with a C++ receive thread."""

    def __init__(self, host: str = "0.0.0.0", port: int = 0,
                 mtu: int = 10000, max_queue: int = 4096):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.gwt_udp_source_create(
            host.encode(), port, mtu, max_queue)
        if not self._h:
            raise OSError(f"could not bind UDP {host}:{port}")
        self.mtu = mtu

    @property
    def port(self) -> int:
        return int(self._lib.gwt_udp_source_port(self._h))

    def start(self):
        return self  # thread starts at construction; API parity with bridge

    def drain(self, max_items: int, timeout: float = 0.05) -> list[bytes]:
        buf = np.empty(max_items * self.mtu, dtype=np.uint8)
        lens = np.empty(max_items, dtype=np.int32)
        n = int(self._lib.gwt_udp_source_drain(
            self._h, _u8(buf), buf.size,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_items, int(timeout * 1000)))
        out, off = [], 0
        for i in range(n):
            out.append(bytes(buf[off:off + lens[i]]))
            off += int(lens[i])
        return out

    def stop(self):
        if self._h:
            self._lib.gwt_udp_source_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass


class NativeUdpSink:
    """UDP datagram sender (Extract-Pics forwarding path)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 10010):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.gwt_udp_sink_create(host.encode(), port)
        if not self._h:
            raise OSError("could not create UDP sink")

    def send(self, data: bytes) -> None:
        buf = np.frombuffer(data, dtype=np.uint8)
        self._lib.gwt_udp_sink_send(self._h, _u8(buf), buf.size)

    def close(self):
        if self._h:
            self._lib.gwt_udp_sink_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
