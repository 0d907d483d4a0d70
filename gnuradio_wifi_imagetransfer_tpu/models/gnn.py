"""Graph neural network: 2-layer GCN over user-position graphs.

Behavioral port of codec/models/basic_blocks/GNN.py:8-19 (a
torch_geometric GCNConv stack). torch_geometric isn't available (and
wouldn't be TPU-native anyway), so GCNConv's propagation rule
x' = D^-1/2 (A+I) D^-1/2 x W + b is implemented directly as dense
matmuls — the right shape for the MXU at the reference's scale
(user graphs of ~6 nodes, GNN.py:27-34).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def normalized_adjacency(edge_index: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Dense D^-1/2 (A + I) D^-1/2 from a (2, E) COO edge list.

    Matches torch_geometric GCNConv defaults (add_self_loops=True,
    symmetric normalization). Duplicate edges accumulate, as in a
    scatter-add message pass.
    """
    a = jnp.zeros((num_nodes, num_nodes), jnp.float32)
    a = a.at[edge_index[0], edge_index[1]].add(1.0)
    a = a + jnp.eye(num_nodes, dtype=jnp.float32)
    deg = jnp.clip(a.sum(axis=1), 1e-12, None)
    d_inv_sqrt = deg**-0.5
    return d_inv_sqrt[:, None] * a * d_inv_sqrt[None, :]


class GCNConv(nn.Module):
    """One graph-convolution layer: aggregate neighbors then project."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj_norm: jnp.ndarray) -> jnp.ndarray:
        # x: (..., N, F) — leading batch dims broadcast through the matmul
        x = nn.Dense(self.features, name="lin")(x)
        return jnp.einsum("ij,...jf->...if", adj_norm, x)


class GNN(nn.Module):
    """conv -> ReLU -> conv (GNN.py:9-19)."""

    hidden_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, node_features: jnp.ndarray,
                 edge_index: jnp.ndarray) -> jnp.ndarray:
        n = node_features.shape[-2]
        adj = normalized_adjacency(edge_index, n)
        x = nn.relu(GCNConv(self.hidden_channels, name="conv1")(node_features, adj))
        return GCNConv(self.out_channels, name="conv2")(x, adj)
