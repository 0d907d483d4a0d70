"""Pallas TPU kernel: batched 64-point (I)FFT as one 128x128 MXU matmul.

The RX chain runs fft_vcc(64, forward, rect, shift) on every OFDM symbol
(IRS_AP.py:273,276) and the TX chain its inverse with the 1/sqrt(52) window
(wifi_phy_hier.grc:459-479). A 64-point transform is far below the regime
where split-radix wins on TPU — the MXU does a dense 64x64 DFT in one pass.
This kernel packs the complex transform into a SINGLE real (B, 128) x
(128, 128) matmul per batch tile:

    [yr | yi] = [xr | xi] @ [[ Wr^T, Wi^T],
                            [-Wi^T, Wr^T]]

with the fftshift reordering and the reference's 1/sqrt(52) scaling folded
into the static W matrices at build time — no separate shift/scale passes,
full 128-lane MXU utilization, one HBM round trip per symbol.

phy/ofdm.py's jnp.fft path is the correctness oracle (tests/test_pallas_fft.py);
phy/ofdm.py dispatches here on TPU backends (GWT_PALLAS_FFT=0/1 overrides).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnuradio_wifi_imagetransfer_tpu.phy import params

_TILE = 512          # batch rows per grid step (f32 sublane multiple)


@functools.cache
def _packed_mat(inverse: bool) -> np.ndarray:
    """The static (128, 128) real matrix R with shift + scale folded in.

    forward:  y = fftshift(fft(x)) / IFFT_SCALE      (ofdm.fft_symbols)
    inverse:  y = ifft(ifftshift(x)) * IFFT_SCALE    (ofdm.ifft_symbols)
    """
    n = params.N_FFT
    dft = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    if inverse:
        # ifft(ifftshift(x)) = idft @ P @ x with P the ifftshift permutation
        idft = np.conj(dft) / n
        src = np.fft.ifftshift(np.arange(n))      # ifftshift(x)[i] = x[src[i]]
        shift_p = np.zeros((n, n))
        shift_p[np.arange(n), src] = 1.0
        w = (idft @ shift_p) * params.IFFT_SCALE
    else:
        # fftshift(fft(x)) = row-shifted DFT
        w = np.fft.fftshift(dft, axes=0) / params.IFFT_SCALE
    wr, wi = np.real(w), np.imag(w)
    top = np.concatenate([wr.T, wi.T], axis=1)     # (64, 128)
    bot = np.concatenate([-wi.T, wr.T], axis=1)    # (64, 128)
    return np.concatenate([top, bot], axis=0).astype(np.float32)  # (128, 128)


def _kernel(x_ref, r_ref, y_ref):
    # HIGHEST: the MXU's default bf16 passes are far too coarse for a
    # dense DFT (observed ~1e0 abs error on hardware); fp32 accumulation
    # costs 3 passes and restores ~1e-5 parity with jnp.fft
    y_ref[:] = jnp.dot(x_ref[:], r_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def _transform(x: jnp.ndarray, inverse: bool, interpret: bool) -> jnp.ndarray:
    """x: (..., 64) complex -> (..., 64) complex."""
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xr = jnp.real(x).reshape(b, params.N_FFT).astype(jnp.float32)
    xi = jnp.imag(x).reshape(b, params.N_FFT).astype(jnp.float32)
    packed = jnp.concatenate([xr, xi], axis=-1)            # (B, 128)
    b_pad = -(-b // _TILE) * _TILE
    if b_pad != b:
        packed = jnp.pad(packed, ((0, b_pad - b), (0, 0)))
    r = jnp.asarray(_packed_mat(inverse))

    out = pl.pallas_call(
        _kernel,
        grid=(b_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        interpret=interpret,
    )(packed, r)
    y = (out[:b, :64] + 1j * out[:b, 64:]).astype(jnp.complex64)
    return y.reshape(lead + (params.N_FFT,))


def fft64(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas equivalent of ofdm.fft_symbols: time -> shifted spectrum,
    descaled by the reference's 1/sqrt(52) TX window."""
    return _transform(x, inverse=False, interpret=interpret)


def ifft64(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas equivalent of ofdm.ifft_symbols: shifted spectrum -> time,
    scaled by 1/sqrt(52)."""
    return _transform(x, inverse=True, interpret=interpret)
