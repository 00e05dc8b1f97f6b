"""Planar pose-graph optimization (loop closure backend, BASELINE config 4).

Generalizes the reference's redirection/loop mechanism (C13,
SLAM.cpp:948-1015, 1354-1428) — which splices saved feature blocks back into
the filter — into a real graph optimization over keyframes: nodes are
(x, y, theta) poses, edges are relative-pose constraints from odometry
(consecutive) and from loop events (stored-feature re-identification).

TPU-first: a fixed-capacity edge table with a validity mask, batched
residual/Jacobian evaluation over all edges at once, dense (3N, 3N) normal
equations assembled with one-hot incidence matmuls (scatter-free), solved
by Cholesky inside a `lax.scan` over Gauss-Newton iterations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry import transforms as tf


@dataclasses.dataclass(frozen=True)
class PoseGraph:
    nodes: jnp.ndarray      # (N, 3) initial poses
    edges_ij: jnp.ndarray   # (E, 2) int32 node indices
    edges_rel: jnp.ndarray  # (E, 3) measured relative pose of j in i's frame
    edges_w: jnp.ndarray    # (E, 3) per-component information weights
    edge_mask: jnp.ndarray  # (E,) bool
    node_mask: jnp.ndarray  # (N,) bool


def _edge_residual(pi: jnp.ndarray, pj: jnp.ndarray,
                   rel: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(pi[2]), jnp.sin(pi[2])
    d = pj[:2] - pi[:2]
    pred = jnp.stack([c * d[0] + s * d[1],
                      -s * d[0] + c * d[1],
                      pj[2] - pi[2]])
    r = pred - rel
    return r.at[2].set(tf.wrap_angle(r[2]))


def _gn_step(nodes, g: PoseGraph, damping, prior_w):
    N = nodes.shape[0]
    E = g.edges_ij.shape[0]
    dtype = nodes.dtype

    def one(e):
        i, j = g.edges_ij[e, 0], g.edges_ij[e, 1]
        pi, pj = nodes[i], nodes[j]
        r = _edge_residual(pi, pj, g.edges_rel[e])
        Ji = jax.jacfwd(lambda p: _edge_residual(p, pj, g.edges_rel[e]))(pi)
        Jj = jax.jacfwd(lambda p: _edge_residual(pi, p, g.edges_rel[e]))(pj)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one)(jnp.arange(E))               # (E,3[,3])
    wm = (g.edge_mask & g.node_mask[g.edges_ij[:, 0]]
          & g.node_mask[g.edges_ij[:, 1]]).astype(dtype)
    iw = g.edges_w * wm[:, None]                            # (E,3)

    # one-hot incidence (E, N): scatter-free normal equations on the MXU
    onehot_i = (g.edges_ij[:, 0:1] ==
                jnp.arange(N)[None, :]).astype(dtype)       # (E,N)
    onehot_j = (g.edges_ij[:, 1:2] == jnp.arange(N)[None, :]).astype(dtype)

    def blocks(Ja, Jb, oa, ob):
        # H[a,b] += sum_e oa[e,a] ob[e,b] Ja_e^T diag(iw_e) Jb_e
        JtWJ = jnp.einsum("eki,ek,ekj->eij", Ja, iw, Jb)    # (E,3,3)
        return jnp.einsum("ea,eb,eij->abij", oa, ob, JtWJ)

    H = (blocks(Ji, Ji, onehot_i, onehot_i)
         + blocks(Jj, Jj, onehot_j, onehot_j)
         + blocks(Ji, Jj, onehot_i, onehot_j)
         + blocks(Jj, Ji, onehot_j, onehot_i))              # (N,N,3,3)
    JtWr_i = jnp.einsum("eki,ek,ek->ei", Ji, iw, r)
    JtWr_j = jnp.einsum("eki,ek,ek->ei", Jj, iw, r)
    b = -(jnp.einsum("ea,ei->ai", onehot_i, JtWr_i)
          + jnp.einsum("ea,ei->ai", onehot_j, JtWr_j))      # (N,3)

    eye3 = jnp.eye(3, dtype=dtype)
    diag = jnp.arange(N)
    H = H.at[diag, diag].add(damping * eye3[None])
    # gauge prior on node 0
    H = H.at[0, 0].add(prior_w * eye3)
    # empty nodes: identity rows
    off = ~g.node_mask
    H = jnp.where((off[:, None] | off[None, :])[..., None, None], 0.0, H)
    H = H.at[diag, diag].add(jnp.where(off[:, None, None], eye3[None], 0.0))
    b = jnp.where(off[:, None], 0.0, b)

    Hd = H.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N)
    dx = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(N, 3)
    dx = jnp.where(g.node_mask[:, None], dx, 0.0)
    cost = 0.5 * jnp.sum(r * r * iw)
    return nodes + dx, cost


def pose_graph_solve(g: PoseGraph, *, iters: int = 10,
                     damping: float = 1e-6, prior_w: float = 1e8):
    """Batched Gauss-Newton. Returns (optimized nodes (N, 3), costs)."""

    def body(nodes, _):
        nodes, cost = _gn_step(nodes, g, damping, prior_w)
        return nodes, cost

    # full f32 matmul precision (see ba.ba_solve: default TPU dot precision
    # destabilizes the normal-equation solve)
    with jax.default_matmul_precision("highest"):
        nodes, costs = jax.lax.scan(body, g.nodes, None, length=iters)
    nodes = nodes.at[:, 2].set(tf.wrap_angle(nodes[:, 2]))
    return nodes, costs
