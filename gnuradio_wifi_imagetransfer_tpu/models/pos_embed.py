"""2-D sine-cosine position embeddings (MAE-style) and checkpoint
pos-embed interpolation.

Behavioral port of codec/models/basic_blocks/util/pos_embed.py:20-95
(get_2d_sincos_pos_embed :20-36, .._from_grid :39-47, 1d :50-68,
interpolate_pos_embed :76-95). Pure numpy/jax — the tables are static
constants folded into the jit graph, never traced.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) interleaved [sin | cos] embedding."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega                                 # (D/2,)
    pos = pos.reshape(-1)                                      # (M,)
    out = np.einsum("m,d->md", pos, omega)                     # (M, D/2)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)              # (H*W, D)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """(grid*grid[, +1 cls], embed_dim) fixed sin-cos table; w varies
    fastest (np.meshgrid with w first, pos_embed.py:27-29)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    grid = grid.reshape([2, 1, grid_size, grid_size])
    pos_embed = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim], np.float32), pos_embed], axis=0)
    return pos_embed


def interpolate_pos_embed(pos_embed_checkpoint: np.ndarray, num_patches: int,
                          num_extra_tokens: int = 1) -> np.ndarray:
    """Bilinearly resample a (1, T, D) checkpoint position table to a new
    patch-grid size, keeping cls/dist tokens unchanged
    (pos_embed.py:76-95; bicubic there, bilinear here via jax.image)."""
    import jax

    embedding_size = pos_embed_checkpoint.shape[-1]
    orig_size = int((pos_embed_checkpoint.shape[-2] - num_extra_tokens) ** 0.5)
    new_size = int(num_patches**0.5)
    if orig_size == new_size:
        return pos_embed_checkpoint
    extra = pos_embed_checkpoint[:, :num_extra_tokens]
    toks = pos_embed_checkpoint[:, num_extra_tokens:].reshape(
        -1, orig_size, orig_size, embedding_size)
    toks = jax.image.resize(jnp.asarray(toks),
                            (toks.shape[0], new_size, new_size, embedding_size),
                            method="cubic")
    toks = np.asarray(toks).reshape(-1, new_size * new_size, embedding_size)
    return np.concatenate([extra, toks], axis=1)
