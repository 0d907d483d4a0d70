"""Device<->host transfer helpers for backends with dtype gaps.

The axon-tunneled TPU backend cannot transfer complex64 or bool arrays to
the host (UNIMPLEMENTED); compute on device is unaffected. These helpers
split complex arrays into stacked float32 planes / cast bools on device,
transfer, and reassemble on host. On CPU they are plain copies.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def to_riq(x: np.ndarray) -> np.ndarray:
    """Host-side: complex array -> float32 (..., 2) real/imag pairs.

    Use this for anything crossing a jit boundary on the axon TPU backend:
    complex64 device_put / transfers / eager ops fail there, while complex
    math INSIDE compiled programs is fully supported. Recombine inside the
    jitted function with ``from_riq``.
    """
    return np.stack([np.real(x), np.imag(x)], axis=-1).astype(np.float32)


def from_riq(x) -> "jnp.ndarray":
    """Device-side (inside jit): float32 (..., 2) -> complex64."""
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def to_host(x) -> np.ndarray:
    """Fetch a device array to numpy, routing around unsupported dtypes."""
    dt = x.dtype
    if dt == jnp.complex64 or dt == jnp.complex128:
        planes = np.asarray(jnp.stack([x.real, x.imag], axis=-1))
        return (planes[..., 0] + 1j * planes[..., 1]).astype(
            np.complex64 if dt == jnp.complex64 else np.complex128
        )
    if dt == jnp.bool_:
        return np.asarray(x.astype(jnp.uint8)).astype(bool)
    return np.asarray(x)
