"""Graph Laplacian / Chebyshev polynomial precompute for the GCN decoder.

The reference rebuilds the normalized Laplacian and its Chebyshev polynomial
stack from the fixed 21-joint skeleton on *every forward pass*
(src/models/layers.py:387-427). The graph is static, so here the whole
basis is precomputed once in numpy and baked into the jitted graph as a
constant — the decoder then reduces to two tiny matmuls per layer.

Pipeline replicated numerically from the reference:
  1. symmetric adjacency from edges (src/models/utils.py:108-120)
  2. row-normalize (A + I)  (src/models/utils.py:89-96)
  3. "laplacian" L = I - D^-1/2 G D^-1/2 of that normalized graph G
     (src/models/layers.py:429-445)
  4. Chebyshev recurrence T_0=I, T_1=L, T_k = 2 L T_{k-1} - T_{k-2}
     (src/models/layers.py:405-427)
"""

from __future__ import annotations

import numpy as np


def normalized_adjacency(num_nodes: int, edges) -> np.ndarray:
    """Row-normalized adjacency with self-loops, float32 [N, N]."""
    a = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    for i, j in edges:
        a[i, j] = 1.0
    # symmetrize: A + A^T * (A^T > A) - A * (A^T > A)
    gt = (a.T > a)
    a = a + a.T * gt - a * gt
    a = a + np.eye(num_nodes)
    rowsum = a.sum(axis=1)
    rinv = np.where(rowsum > 0, 1.0 / rowsum, 0.0)
    return (a * rinv[:, None]).astype(np.float32)


def graph_laplacian(graph: np.ndarray, normalize: bool = True) -> np.ndarray:
    g = graph.astype(np.float64)
    if normalize:
        d = np.diag(np.sum(g, axis=-1) ** (-0.5))
        lap = np.eye(g.shape[0]) - d @ g @ d
    else:
        lap = np.diag(np.sum(g, axis=-1)) - g
    return lap.astype(np.float32)


def cheb_basis(num_nodes: int, edges, order: int, normalize: bool = True) -> np.ndarray:
    """Stacked Chebyshev polynomials of the skeleton Laplacian.

    Args:
      num_nodes: N.
      edges: iterable of (i, j).
      order: K; returns K+1 polynomial terms (reference ChebConv K=2 -> 3 terms).

    Returns:
      [K+1, N, N] float32 basis, constant-foldable by XLA.
    """
    graph = normalized_adjacency(num_nodes, edges)
    lap = graph_laplacian(graph, normalize).astype(np.float64)
    n = num_nodes
    terms = [np.eye(n)]
    if order >= 1:
        terms.append(lap)
    for _ in range(2, order + 1):
        terms.append(2.0 * lap @ terms[-1] - terms[-2])
    return np.stack(terms).astype(np.float32)
