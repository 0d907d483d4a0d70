"""Torch-checkpoint -> Flax parameter conversion for the JSCE codec.

The reference ships (stripped) torch .pth checkpoints whose state dict
splits into shared_encoder.* / shared_decoder.* (jsce_codec.py:89-96).
This module converts those state dicts into the Flax variable trees of
models/encoder.py + models/decoder.py, handling layout differences:

  torch Conv2d        (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch depthwise     (C, 1, kh, kw)  -> flax kernel (kh, kw, 1, C)
  torch ConvTranspose (I, O, kh, kw)  -> ConvTransposeTorch kernel (kh, kw, I, O)
  torch Linear        (O, I)          -> flax Dense kernel (I, O)
  torch BatchNorm     weight/bias/running_mean/running_var
                                      -> scale/bias (params), mean/var (batch_stats)
  torch PReLU weight  (C,)            -> alpha
  GDN beta/gamma                      -> identical (reparameterized sqrt form)
"""

from __future__ import annotations

import numpy as np


def _to_np(t):
    import torch

    return t.detach().cpu().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)


def _set(tree: dict, path: list[str], value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = np.asarray(value)


# torch Sequential index -> flax submodule name
_RTCB_PROC = {"0": "convt1", "1": "gdn1", "2": "prelu1", "3": "convt2", "4": "gdn2"}
_RTCB_SHORT = {"0": "skip_convt", "1": "skip_gdn"}


def _convert_entry(params: dict, stats: dict, path: list[str], key: str, w: np.ndarray):
    """Place one torch state-dict entry into the flax trees."""
    leaf = key
    if leaf == "num_batches_tracked":
        return
    mod = path[-1] if path else ""

    # --- decoder RTCB sequential renames -------------------------------
    if len(path) >= 2 and path[-2].startswith("convBlock") and path[-1] in _RTCB_PROC and "proc" in path:
        pass  # handled by pre-mapping in convert_module
    # --- convolutions ---------------------------------------------------
    if leaf == "weight" and w.ndim == 4:
        o, i, kh, kw = w.shape
        if mod.startswith("convt") or mod == "skip_convt":
            # torch ConvTranspose2d weight is (I, O, kh, kw); the flax-side
            # ConvTransposeTorch stores (kh, kw, O, I) for transpose_kernel
            _set(params, path + ["kernel"], w.transpose(2, 3, 1, 0))
        else:
            _set(params, path + ["kernel"], w.transpose(2, 3, 1, 0))
        return
    if leaf == "weight" and w.ndim == 2:
        _set(params, path + ["kernel"], w.T)
        return
    if leaf == "weight" and w.ndim == 1:
        if mod.startswith("bn") or mod.startswith("skip_bn") or mod == "bn1":
            _set(params, path + ["scale"], w)
        elif mod.startswith("prelu") or mod == "prelu_out":
            _set(params, path + ["alpha"], w)
        else:  # BatchNorm in SE etc.
            _set(params, path + ["scale"], w)
        return
    if leaf == "bias":
        _set(params, path + ["bias"], w)
        return
    if leaf == "running_mean":
        _set(stats, path + ["mean"], w)
        return
    if leaf == "running_var":
        _set(stats, path + ["var"], w)
        return
    if leaf in ("beta", "gamma"):
        _set(params, path + [leaf], w)
        return
    if leaf == "alpha":
        _set(params, path + ["alpha"], w)
        return
    raise ValueError(f"unhandled torch entry {'.'.join(path)}.{key} shape {w.shape}")


def _map_path(parts: list[str], is_decoder: bool) -> list[str]:
    """Rename torch module paths to the flax module names."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if is_decoder and p == "proc":
            out.append(_RTCB_PROC[parts[i + 1]])
            i += 2
            continue
        if is_decoder and p == "shortcut":
            out.append(_RTCB_SHORT[parts[i + 1]])
            i += 2
            continue
        if is_decoder and p == "fn":
            out.append("prelu_out")
            i += 1
            continue
        if not is_decoder and p == "skip":
            idx = int(parts[i + 1])
            # Sequential [conv, bn] or [dwconv, bn, conv, bn]
            name = ["skip_conv0", "skip_bn0", "skip_conv1", "skip_bn1"][idx]
            out.append(name)
            i += 2
            continue
        if not is_decoder and p == "se" and parts[i + 1].isdigit():
            # SeModule Sequential: 1=conv1, 2=bn1, 4=conv2
            name = {1: "conv1", 2: "bn1", 4: "conv2"}[int(parts[i + 1])]
            out.extend(["semodule", name])
            i += 2
            continue
        if p in ("IRS_compress",):
            out.append("irs_compress")
            i += 1
            continue
        out.append(p)
        i += 1
    return out


def convert_module(state_dict: dict, is_decoder: bool):
    """torch state dict (one module) -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}
    for key, val in state_dict.items():
        w = _to_np(val)
        parts = key.split(".")
        leaf = parts[-1]
        path = _map_path(parts[:-1], is_decoder)
        _convert_entry(params, stats, path, leaf, w)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def load_torch_checkpoint(weight_path: str, compressed_channel: int = 128):
    """Load a reference-format .pth and split into (enc_vars, dec_vars)
    exactly as jsce_codec.py:89-96 does."""
    import torch

    ckpt = torch.load(weight_path, map_location="cpu")
    enc_sd = {k[len("shared_encoder."):]: v for k, v in ckpt.items()
              if k.startswith("shared_encoder.")}
    dec_sd = {k[len("shared_decoder."):]: v for k, v in ckpt.items()
              if k.startswith("shared_decoder.")}
    return convert_module(enc_sd, is_decoder=False), convert_module(dec_sd, is_decoder=True)
