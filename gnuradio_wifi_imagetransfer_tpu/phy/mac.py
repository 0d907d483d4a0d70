"""802.11 MAC framing: data-MPDU builder, CRC-32 FCS, header parser.

Replicates ieee802_11.mac / decode_mac's CRC check / parse_mac
(IRS_user.py:192, IRS_AP.py:270-272): a 24-byte data-frame MAC header
(frame control 0x0008, duration 0x002E, addr1/2/3, incrementing 12-bit
sequence number) wrapped around the payload with a little-endian CRC-32
FCS. The reference instantiates src/dst/bss = 0x23*6 / 0x42*6 / 0xff*6.

Two implementations of CRC-32:
  * host path (zlib) for app-side framing/validation;
  * a batched JAX path (byte-table scan) so whole frame batches are
    CRC-checked on device without a host round trip.

The app-side "Extract Pics" contract (IRS_AP_epy_block_2.py:27-41) —
payload = mpdu[24:] then strip the sender's 4-byte length prefix — is
implemented in runtime/bridge.py on top of parse().
"""

from __future__ import annotations

import dataclasses
import struct
import zlib

import numpy as np
import jax.numpy as jnp

from gnuradio_wifi_imagetransfer_tpu.phy import params

HEADER_LEN = 24
FCS_LEN = 4

DEFAULT_SRC = bytes([0x23] * 6)
DEFAULT_DST = bytes([0x42] * 6)
DEFAULT_BSS = bytes([0xFF] * 6)

FRAME_CONTROL = 0x0008   # data frame
DURATION = 0x002E


@dataclasses.dataclass
class MacFrame:
    frame_control: int
    duration: int
    addr1: bytes
    addr2: bytes
    addr3: bytes
    seq_no: int
    payload: bytes
    fcs_ok: bool


class Mac:
    """Stateful framer mirroring ieee802_11.mac: sequence number increments
    per frame (12-bit wraparound)."""

    def __init__(self, src: bytes = DEFAULT_SRC, dst: bytes = DEFAULT_DST,
                 bss: bytes = DEFAULT_BSS):
        if not (len(src) == len(dst) == len(bss) == 6):
            raise ValueError("MAC addresses must be 6 bytes")
        self.src, self.dst, self.bss = bytes(src), bytes(dst), bytes(bss)
        self.seq_no = 0

    def frame(self, payload: bytes) -> bytes:
        """payload -> MPDU (header + payload + FCS)."""
        hdr = struct.pack(
            "<HH6s6s6sH",
            FRAME_CONTROL, DURATION, self.dst, self.src, self.bss,
            (self.seq_no & 0xFFF) << 4,
        )
        self.seq_no = (self.seq_no + 1) & 0xFFF
        body = hdr + payload
        fcs = struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
        return body + fcs


def parse(mpdu: bytes) -> MacFrame:
    """Validate FCS and split an MPDU (decode_mac's CRC + parse_mac)."""
    if len(mpdu) < HEADER_LEN + FCS_LEN:
        raise ValueError(f"MPDU too short: {len(mpdu)} bytes")
    body, fcs = mpdu[:-FCS_LEN], mpdu[-FCS_LEN:]
    fcs_ok = struct.unpack("<I", fcs)[0] == (zlib.crc32(body) & 0xFFFFFFFF)
    fc, dur, a1, a2, a3, seq = struct.unpack("<HH6s6s6sH", body[:HEADER_LEN])
    return MacFrame(
        frame_control=fc, duration=dur, addr1=a1, addr2=a2, addr3=a3,
        seq_no=seq >> 4, payload=body[HEADER_LEN:], fcs_ok=fcs_ok,
    )


def frame_batch(payloads: np.ndarray, seq0: int = 0,
                src: bytes = DEFAULT_SRC, dst: bytes = DEFAULT_DST,
                bss: bytes = DEFAULT_BSS) -> np.ndarray:
    """Vectorized framer: (B, L) payload bytes -> (B, L+28) MPDUs with
    consecutive sequence numbers starting at seq0.

    Uses the native C++ framer (native/gwt_native.cpp, the ieee802_11.mac
    hot-loop equivalent) when the toolchain is available; NumPy+zlib
    otherwise."""
    from gnuradio_wifi_imagetransfer_tpu.runtime import native

    if native.available():
        return native.frame_batch(payloads, seq0, src, dst, bss)
    b, l = payloads.shape
    out = np.empty((b, HEADER_LEN + l + FCS_LEN), dtype=np.uint8)
    hdr_fixed = np.frombuffer(
        struct.pack("<HH6s6s6s", FRAME_CONTROL, DURATION, dst, src, bss), dtype=np.uint8
    )
    out[:, :22] = hdr_fixed
    seqs = ((seq0 + np.arange(b)) & 0xFFF) << 4
    out[:, 22] = seqs & 0xFF
    out[:, 23] = seqs >> 8
    out[:, 24 : 24 + l] = payloads
    for i in range(b):
        crc = zlib.crc32(out[i, : 24 + l].tobytes()) & 0xFFFFFFFF
        out[i, 24 + l :] = np.frombuffer(struct.pack("<I", crc), dtype=np.uint8)
    return out


# ---------------------------------------------------------------------------
# On-device CRC-32 for batched frame validation
# ---------------------------------------------------------------------------


def crc32_jax(data: jnp.ndarray) -> jnp.ndarray:
    """Batched CRC-32 (IEEE reflected): (..., n) uint8 -> (...,) uint32.

    Byte-table algorithm as a lax.scan over the byte axis; the whole frame
    batch advances one byte per step, so the scan length is the frame
    length, not batch x length.
    """
    import jax

    table = jnp.asarray(params.crc32_table())
    x = data.astype(jnp.uint32)
    perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
    xs = jnp.transpose(x, perm)                     # (n, ...)
    init = jnp.full(x.shape[:-1], 0xFFFFFFFF, dtype=jnp.uint32)

    def step(crc, byte):
        idx = (crc ^ byte) & 0xFF
        return (crc >> 8) ^ table[idx], None

    crc, _ = jax.lax.scan(step, init, xs)
    return crc ^ jnp.uint32(0xFFFFFFFF)


def check_fcs_batch(mpdus: jnp.ndarray) -> jnp.ndarray:
    """(B, n) uint8 MPDUs -> (B,) bool FCS validity, on device."""
    body = mpdus[..., :-FCS_LEN]
    fcs = mpdus[..., -FCS_LEN:].astype(jnp.uint32)
    stored = (fcs[..., 0] | (fcs[..., 1] << 8) | (fcs[..., 2] << 16) | (fcs[..., 3] << 24))
    return crc32_jax(body) == stored
