"""Tests for the device-side Hungarian matcher."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from snipper_tpu.matching.matcher import cost_matrix, hungarian, match

WEIGHTS = dict(is_human=1.0, root=1.0, root_vis=0.1, root_depth=1.0,
               joint=1.0, joint_vis=0.1, joint_depth=1.0)
EPS = 1e-5


@pytest.mark.parametrize("n,m", [(8, 8), (12, 5), (60, 32), (7, 1)])
def test_hungarian_matches_scipy_cost(n, m):
    rng = np.random.default_rng(0)
    cost = rng.standard_normal((4, n, m)).astype(np.float32)
    got = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(cost.shape[0]):
        rows, cols = linear_sum_assignment(cost[b])
        want_total = cost[b][rows, cols].sum()
        got_total = cost[b][got[b], np.arange(m)].sum()
        # optimal assignments may differ on ties; totals must match
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5)
        # and the assignment must be a valid injection
        assert len(set(got[b].tolist())) == m


def test_hungarian_integer_ties():
    rng = np.random.default_rng(1)
    cost = rng.integers(0, 3, (8, 10, 6)).astype(np.float32)
    got = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(8):
        rows, cols = linear_sum_assignment(cost[b])
        want = cost[b][rows, cols].sum()
        have = cost[b][got[b], np.arange(6)].sum()
        assert abs(want - have) < 1e-4
        assert len(set(got[b].tolist())) == 6


def _numpy_reference_cost(prob, kpts, depth, t_kpts, t_depth, max_depth, w):
    """Independent per-sample re-computation of the reference cost formulas
    (reference models/matcher.py:57-130)."""
    n = kpts.shape[0]
    m = t_kpts.shape[0]
    C = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            pj_vis = kpts[i, :, 1:, 2:3]
            tj = t_kpts[j, :, 1:, 0:2]
            tj_vis = t_kpts[j, :, 1:, 2:3]
            proot = kpts[i, :, :1]
            troot = t_kpts[j, :, :1]
            troot_vis = troot[..., 2:3]
            pjoint = kpts[i, :, 1:, 0:2] + proot[..., 0:2]

            frame_vis = (tj_vis.sum((-2, -1)) > 0).astype(np.float64)
            c_class = -(prob[i] * frame_vis).sum() / (frame_vis.sum() + EPS)

            c_joint = np.abs(tj_vis * (pjoint - tj)).sum() / (tj_vis.sum() + EPS)
            c_jvis = ((pj_vis - tj_vis) ** 2).mean()
            c_root = np.abs(troot_vis * (proot[..., 0:2] - troot[..., 0:2])).sum() / (troot_vis.sum() + EPS)
            c_rvis = ((proot[..., 2:3] - troot_vis) ** 2).mean()

            prd = depth[i, :, :1]
            pjd = prd + depth[i, :, 1:] / max_depth
            trd, trde = t_depth[j, :, :1, 0:1], t_depth[j, :, :1, 1:2]
            tjd, tjde = t_depth[j, :, 1:, 0:1], t_depth[j, :, 1:, 1:2]
            c_rd = np.abs(trde * (prd - trd)).sum() / (trde.sum() + EPS)
            c_jd = np.abs(tjde * (pjd - tjd)).sum() / (tjde.sum() + EPS)

            C[i, j] = (w["is_human"] * c_class + w["root"] * c_root
                       + w["root_vis"] * c_rvis + w["root_depth"] * c_rd
                       + w["joint"] * c_joint + w["joint_vis"] * c_jvis
                       + w["joint_depth"] * c_jd)
    return C


def test_cost_matrix_matches_reference_formulas():
    rng = np.random.default_rng(2)
    B, n, m, T, K = 2, 6, 3, 4, 5
    logits = rng.standard_normal((B, n, T, 2)).astype(np.float32)
    kpts = rng.uniform(0, 1, (B, n, T, K, 3)).astype(np.float32)
    depth = rng.uniform(0, 1, (B, n, T, K, 1)).astype(np.float32)
    t_kpts = rng.uniform(0, 1, (B, m, T, K, 3)).astype(np.float32)
    t_kpts[..., 2] = (t_kpts[..., 2] > 0.3)  # binary visibility
    t_depth = rng.uniform(0, 1, (B, m, T, K, 2)).astype(np.float32)
    t_depth[..., 1] = (t_depth[..., 1] > 0.3)

    got = np.asarray(cost_matrix(
        jnp.asarray(logits), jnp.asarray(kpts), jnp.asarray(depth),
        jnp.asarray(t_kpts), jnp.asarray(t_depth), 15.0, WEIGHTS))

    for b in range(B):
        prob = np.exp(logits[b]) / np.exp(logits[b]).sum(-1, keepdims=True)
        want = _numpy_reference_cost(prob[..., 1], kpts[b], depth[b],
                                     t_kpts[b], t_depth[b], 15.0, WEIGHTS)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", range(30))
def test_padding_rows_do_not_perturb_real_assignment(seed):
    """Padded slots must never change which queries the REAL targets get.

    Uses PARTIAL visibility: with all-zero padded targets the vis-MSE cost
    terms equal mean(pred_vis^2) per query — non-constant across queries —
    so an unmasked cost lets padding slots steal queries (the round-1 bug;
    reproduced in 26/300 random instances before the valid-mask fix)."""
    rng = np.random.default_rng(seed)
    B, n, m, M, T, K = 1, 10, 4, 8, 2, 4
    outputs = {
        "pred_logits": jnp.asarray(rng.standard_normal((B, n, T, 2)), jnp.float32),
        "pred_kpts2d": jnp.asarray(rng.uniform(0, 1, (B, n, T, K, 3)), jnp.float32),
        "pred_depth": jnp.asarray(rng.uniform(0, 1, (B, n, T, K, 1)), jnp.float32),
    }
    kpts = np.zeros((B, M, T, K, 3), np.float32)
    depth = np.zeros((B, M, T, K, 2), np.float32)
    kpts[:, :m] = rng.uniform(0, 1, (B, m, T, K, 3))
    # partial visibility/existence — each real target sees ~60% of joints,
    # but keep at least one visible joint per frame so frame_vis stays sane
    vis = (rng.uniform(size=(B, m, T, K)) > 0.4).astype(np.float32)
    vis[..., 0] = 1.0
    kpts[:, :m, ..., 2] = vis
    depth[:, :m] = rng.uniform(0, 1, (B, m, T, K, 2))
    depth[:, :m, ..., 1] = (rng.uniform(size=(B, m, T, K)) > 0.4)
    valid = np.zeros((B, M), bool)
    valid[:, :m] = True

    tgt_pad = {"kpts2d": jnp.asarray(kpts), "depth": jnp.asarray(depth),
               "valid": jnp.asarray(valid)}
    tgt_exact = {"kpts2d": jnp.asarray(kpts[:, :m]),
                 "depth": jnp.asarray(depth[:, :m]),
                 "valid": jnp.asarray(valid[:, :m])}
    src_pad, _ = match(outputs, tgt_pad, 15.0, WEIGHTS)
    src_exact, _ = match(outputs, tgt_exact, 15.0, WEIGHTS)

    # the real slots must receive exactly the queries scipy assigns on the
    # UNPADDED cost (totals may tie; compare assignment cost totals)
    cost_exact = np.asarray(cost_matrix(
        outputs["pred_logits"], outputs["pred_kpts2d"], outputs["pred_depth"],
        tgt_exact["kpts2d"], tgt_exact["depth"], 15.0, WEIGHTS))
    for b in range(B):
        rows, cols = linear_sum_assignment(cost_exact[b])
        want_total = cost_exact[b][rows, cols].sum()
        got_pad = cost_exact[b][np.asarray(src_pad)[b, :m], np.arange(m)].sum()
        got_exact = cost_exact[b][np.asarray(src_exact)[b], np.arange(m)].sum()
        np.testing.assert_allclose(got_pad, want_total, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_exact, want_total, rtol=1e-5, atol=1e-6)
        # padded assignment must still be a valid injection over ALL slots
        assert len(set(np.asarray(src_pad)[b].tolist())) == M


def test_unknown_solver_raises():
    """A solver typo must raise, not silently select the host-callback
    path (which would break the one-XLA-program step invariant)."""
    import pytest

    from snipper_tpu.matching.matcher import match

    with pytest.raises(ValueError, match="unknown solver"):
        match({"pred_logits": None, "pred_kpts2d": None, "pred_depth": None},
              {}, 15.0, {}, solver="JAX")


def test_max_persons_capped_by_num_queries():
    """The JV solver needs m <= n; Config.validate must reject padding caps
    above the query count (the panoptic preset previously shipped
    max_persons=32 with 20 queries — an on-device hang)."""
    import pytest

    from snipper_tpu.config import Config

    with pytest.raises(ValueError, match="max_persons"):
        Config.tiny().replace(max_persons=9).validate()  # tiny has 8 queries
    assert Config.panoptic().max_persons <= Config.panoptic().num_queries
