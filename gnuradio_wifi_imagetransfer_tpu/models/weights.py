"""Flat-npz weight store for the SOMA-DSCN codec.

The reference ships its JSCE weights as torch .pth checkpoints (stripped
from its repo by a large-blob policy, .MISSING_LARGE_BLOBS) and splits
them into shared_encoder/shared_decoder state dicts at load
(codec/jsce_codec.py:89-96). Here trained weights ship as a single
compressed .npz of float16 leaves keyed by 'collection/path/to/leaf',
small enough to commit; `make_weights.py` regenerates it
deterministically from the Kodak images.

The packaged checkpoint (assets/jsce_soma_dscn.npz) is trained by
make_weights.py; default_checkpoint() resolves it for the demo apps.
"""

from __future__ import annotations

import collections.abc
import importlib.resources
import json
import os
from typing import Optional

import numpy as np
import jax

SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        # Mapping, not dict: flax FrozenDict collections are Mappings but
        # not dict subclasses — treating one as a leaf would np.asarray it
        # into an object array and silently corrupt the npz (ADVICE r3)
        if isinstance(v, collections.abc.Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_soma_npz(variables: dict, path: str, meta: Optional[dict] = None,
                  dtype=np.float16) -> None:
    """SOMANet flax variables -> one compressed npz (float16 by default:
    halves the committed size; inference quality loss is far below the
    channel noise floor)."""
    flat = {k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in _flatten(variables).items()}
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **flat)


def load_soma_npz(path: str) -> tuple[dict, dict]:
    """npz -> (SOMANet flax variables in float32, meta dict)."""
    data = dict(np.load(path))
    meta = json.loads(bytes(data.pop("__meta__").tobytes()).decode()) \
        if "__meta__" in data else {}
    flat = {k: v.astype(np.float32) if np.issubdtype(v.dtype, np.floating)
            else v for k, v in data.items()}
    return _unflatten(flat), meta


def split_soma(variables: dict) -> tuple[dict, dict]:
    """SOMANet variables -> (enc_vars, dec_vars) for the standalone
    Encoder/DecoderPE applies used by the JSCE facade — the same
    state-dict split the reference performs at jsce_codec.py:89-96."""
    enc = {"params": variables["params"]["shared_encoder"]}
    dec = {"params": variables["params"]["shared_decoder"]}
    stats = variables.get("batch_stats", {})
    if "shared_encoder" in stats:
        enc["batch_stats"] = stats["shared_encoder"]
    if "shared_decoder" in stats:
        dec["batch_stats"] = stats["shared_decoder"]
    return enc, dec


def default_checkpoint() -> Optional[str]:
    """Path of the packaged trained checkpoint, or None if absent
    (it ships via [tool.setuptools.package-data] assets)."""
    override = os.environ.get("GWT_JSCE_WEIGHTS")
    if override:
        if not os.path.exists(override):
            # a typo'd override silently falling through to the packaged
            # default would mask the user's intent (ADVICE r3)
            raise FileNotFoundError(
                f"GWT_JSCE_WEIGHTS points at a missing file: {override}")
        return override
    try:
        root = importlib.resources.files("gnuradio_wifi_imagetransfer_tpu")
        # prefer the reference-geometry checkpoint (240x240, c=128 ->
        # (30,30,128) latent, the live demo config at
        # upload_featuremap_udp.py:78-82); fall back to the 4x-smaller
        # 80x80/c=64 checkpoint kept for fast tests
        for name in ("jsce_soma_dscn_240.npz", "jsce_soma_dscn.npz"):
            p = root / "assets" / name
            if p.is_file():
                return str(p)
    except Exception:
        pass
    return None
