"""Hungarian trajectory matching — fully on device.

The reference builds the cost matrix on GPU but solves the assignment with
``scipy.optimize.linear_sum_assignment`` on the host every step and for every
auxiliary decoder layer (reference ``models/matcher.py:35-141``, called from
``models/model.py:519,537``) — a device→host sync in the middle of the train
step. Here the cost is built batched/padded and the LSAP is solved by a
Jonker-Volgenant shortest-augmenting-path solver written in JAX
(``lax.while_loop``), so the whole train step stays one XLA program. A scipy
``pure_callback`` variant is kept for cross-checking.

Cost semantics match reference ``HungarianMatcher.forward`` term by term
(class / root / root-vis / root-depth / joint / joint-vis / joint-depth,
``matcher.py:88-130``) with eps = 1e-5 (the reference's ``10e-6``).

Padded-target convention: targets are padded to ``max_persons``; ``match``
zeroes the cost columns of invalid (padding) slots explicitly. Zero
visibility alone does NOT make every term constant — ``c_joint_vis`` /
``c_root_vis`` are ``mean(pred_vis**2)`` per query for an all-zero target,
which varies across queries and would let padding slots compete with real
targets for queries. Masking with ``targets['valid']`` makes padding columns
truly constant (zero), so they never perturb the optimal assignment of the
real rows when ``num_queries >= max_persons``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5
_INF = 1e30


# --------------------------------------------------------------------------
# cost matrix
# --------------------------------------------------------------------------
def cost_matrix(
    pred_logits: jnp.ndarray,   # [B, n, T, 2]
    pred_kpts2d: jnp.ndarray,   # [B, n, T, K, 3]
    pred_depth: jnp.ndarray,    # [B, n, T, K, 1]
    tgt_kpts2d: jnp.ndarray,    # [B, m, T, K, 3]
    tgt_depth: jnp.ndarray,     # [B, m, T, K, 2] (value, exists)
    max_depth: float,
    weights: Dict[str, float],
) -> jnp.ndarray:
    """Batched matching cost ``[B, n, m]``."""
    f32 = jnp.float32
    prob = jax.nn.softmax(pred_logits.astype(f32), -1)[..., 1]   # [B, n, T]

    # predictions expanded over targets: [B, n, 1, ...]
    p_kpts = pred_kpts2d.astype(f32)[:, :, None]
    p_depth = pred_depth.astype(f32)[:, :, None]
    p_root = p_kpts[:, :, :, :, :1]                    # [B,n,1,T,1,3]
    p_joint_vis = p_kpts[:, :, :, :, 1:, 2:3]
    p_joint = p_kpts[:, :, :, :, 1:, 0:2] + p_root[..., 0:2]
    p_root_d = p_depth[:, :, :, :, :1]
    p_joint_d = p_root_d + p_depth[:, :, :, :, 1:] / max_depth

    # targets expanded over predictions: [B, 1, m, ...]
    t_kpts = tgt_kpts2d.astype(f32)[:, None]
    t_depth = tgt_depth.astype(f32)[:, None]
    t_root = t_kpts[:, :, :, :, :1]
    t_root_vis = t_root[..., 2:3]
    t_joint = t_kpts[:, :, :, :, 1:, 0:2]
    t_joint_vis = t_kpts[:, :, :, :, 1:, 2:3]
    t_root_d = t_depth[:, :, :, :, :1, 0:1]
    t_root_d_exist = t_depth[:, :, :, :, :1, 1:2]
    t_joint_d = t_depth[:, :, :, :, 1:, 0:1]
    t_joint_d_exist = t_depth[:, :, :, :, 1:, 1:2]

    def norm_l1(err, w, axes=(-1, -2, -3)):
        return jnp.sum(jnp.abs(w * err), axes) / (jnp.sum(w, axes) + EPS)

    # class: -(prob * frame_vis).sum / frame_vis.sum
    frame_vis = (jnp.sum(t_joint_vis, (-2, -1)) > 0).astype(f32)  # [B,1,m,T]
    c_class = -jnp.sum(prob[:, :, None] * frame_vis, -1) / (
        jnp.sum(frame_vis, -1) + EPS)

    c_joint = norm_l1(p_joint - t_joint, t_joint_vis)
    c_joint_vis = jnp.mean((p_joint_vis - t_joint_vis) ** 2, (-1, -2, -3))
    c_joint_d = norm_l1(p_joint_d - t_joint_d, t_joint_d_exist)
    c_root = norm_l1(p_root[..., 0:2] - t_root[..., 0:2], t_root_vis)
    c_root_vis = jnp.mean((p_root[..., 2:3] - t_root_vis) ** 2, (-1, -2, -3))
    c_root_d = norm_l1(p_root_d - t_root_d, t_root_d_exist)

    return (weights["is_human"] * c_class
            + weights["root"] * c_root
            + weights["root_vis"] * c_root_vis
            + weights["root_depth"] * c_root_d
            + weights["joint"] * c_joint
            + weights["joint_vis"] * c_joint_vis
            + weights["joint_depth"] * c_joint_d)


# --------------------------------------------------------------------------
# Jonker-Volgenant LSAP on device
# --------------------------------------------------------------------------
def _lsa_rows(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment of each ROW of ``cost [M, N]`` (M <= N) to a
    distinct column. Returns ``col4row [M]`` — assigned column per row.

    Shortest-augmenting-path (Jonker-Volgenant) with dual potentials, the
    same algorithm family scipy's ``linear_sum_assignment`` uses.
    """
    M, N = cost.shape
    cost = cost.astype(jnp.float32)

    def outer(cur_row, state):
        u, v, col4row, row4col = state
        sp = jnp.full((N,), _INF, jnp.float32)
        path = jnp.full((N,), -1, jnp.int32)
        SR = jnp.zeros((M,), bool)
        SC = jnp.zeros((N,), bool)

        def dj_cond(c):
            return c[0] < 0

        def dj_body(c):
            sink, i, minval, sp, path, SR, SC = c
            SR = SR.at[i].set(True)
            red = minval + cost[i] - u[i] - v              # [N]
            upd = (red < sp) & (~SC)
            sp = jnp.where(upd, red, sp)
            path = jnp.where(upd, i, path)
            masked = jnp.where(SC, _INF, sp)
            j = jnp.argmin(masked).astype(jnp.int32)
            minval = masked[j]
            SC = SC.at[j].set(True)
            free = row4col[j] < 0
            sink = jnp.where(free, j, jnp.int32(-1))
            i = jnp.where(free, i, row4col[j])
            return (sink, i, minval, sp, path, SR, SC)

        init = (jnp.int32(-1), jnp.int32(cur_row), jnp.float32(0.0),
                sp, path, SR, SC)
        sink, _, minval, sp, path, SR, SC = jax.lax.while_loop(
            dj_cond, dj_body, init)

        # dual updates
        u = u.at[cur_row].add(minval)
        rows = jnp.arange(M)
        extra = jnp.where(
            SR & (rows != cur_row),
            minval - sp[jnp.clip(col4row, 0, N - 1)], 0.0)
        u = u + extra
        v = jnp.where(SC, v - (minval - sp), v)

        # augment along the alternating path ending at sink
        def aug_cond(c):
            return ~c[0]

        def aug_body(c):
            done, j, col4row, row4col = c
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return (i == cur_row, j_next, col4row, row4col)

        _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body, (False, sink, col4row, row4col))
        return (u, v, col4row, row4col)

    state = (jnp.zeros((M,), jnp.float32), jnp.zeros((N,), jnp.float32),
             jnp.full((M,), -1, jnp.int32), jnp.full((N,), -1, jnp.int32))
    _, _, col4row, _ = jax.lax.fori_loop(0, M, outer, state)
    return col4row


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched LSAP: ``cost [B, n_queries, m_targets]`` (m <= n). Returns
    ``src_idx [B, m]`` — the query assigned to each target."""
    # rows = targets (the smaller side), columns = queries
    return jax.vmap(_lsa_rows)(jnp.swapaxes(cost, 1, 2))


def hungarian_scipy(cost: jnp.ndarray) -> jnp.ndarray:
    """Host scipy solver via pure_callback (cross-check / fallback)."""
    from scipy.optimize import linear_sum_assignment

    def _solve(c):
        out = np.zeros(c.shape[:1] + (c.shape[2],), np.int32)
        for b in range(c.shape[0]):
            rows, cols = linear_sum_assignment(c[b])
            out[b, cols] = rows.astype(np.int32)
        return out

    shape = jax.ShapeDtypeStruct((cost.shape[0], cost.shape[2]), jnp.int32)
    return jax.pure_callback(_solve, shape, cost)


def match(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    max_depth: float,
    weights: Dict[str, float],
    solver: str = "jax",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute matching for a padded batch.

    Args:
      outputs: dict with pred_logits/pred_kpts2d/pred_depth.
      targets: padded dict with ``kpts2d [B, M, T, K, 3]``,
        ``depth [B, M, T, K, 2]``, ``valid [B, M]`` (bool).

    Returns:
      ``(src_idx [B, M] int32, valid [B, M] bool)`` — query index matched to
      each (padded) target slot.
    """
    if solver not in ("jax", "scipy"):
        # a typo must not silently select the host-callback path (it would
        # break the one-XLA-program invariant and add a device->host sync
        # to every step)
        raise ValueError(f"unknown solver {solver!r}; choose 'jax' "
                         "(on-device JV) or 'scipy' (host callback)")
    cost = cost_matrix(outputs["pred_logits"], outputs["pred_kpts2d"],
                       outputs["pred_depth"], targets["kpts2d"],
                       targets["depth"], max_depth, weights)
    # Zero the columns of padding slots: with an all-zero padded target the
    # vis/MSE terms still vary across queries (mean(pred_vis^2)), so without
    # this mask padding slots would steal queries from real targets.
    cost = cost * targets["valid"][:, None, :].astype(cost.dtype)
    solve = hungarian if solver == "jax" else hungarian_scipy
    src_idx = solve(jax.lax.stop_gradient(cost))
    return src_idx, targets["valid"]
