"""Parity tests: padded/masked losses vs an independent ragged (per-sample)
torch implementation of the reference formulas, and blur vs torchvision."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.data.skeleton import ROOT_JOINT_CONT
from snipper_tpu.losses.criterion import SetCriterion
from snipper_tpu.losses.heatmap import (blur_matrix, gaussian_blur_maps,
                                        heatmap_kernel_size,
                                        scatter_keypoint_maps)

EPS = 1e-5
B, N_Q, T, K, M_PAD = 2, 9, 3, 15, 5
MAXD = 15.0


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    outputs = {
        "pred_logits": rng.standard_normal((B, N_Q, T, 2)).astype(np.float32),
        "pred_kpts2d": rng.uniform(0, 1, (B, N_Q, T, K, 3)).astype(np.float32),
        "pred_depth": rng.uniform(0, 1, (B, N_Q, T, K, 1)).astype(np.float32),
    }
    m_per = [3, 1]
    kpts = np.zeros((B, M_PAD, T, K, 3), np.float32)
    depth = np.zeros((B, M_PAD, T, K, 2), np.float32)
    valid = np.zeros((B, M_PAD), bool)
    for b, m in enumerate(m_per):
        kpts[b, :m] = rng.uniform(0, 1, (m, T, K, 3))
        kpts[b, :m, ..., 2] = (kpts[b, :m, ..., 2] > 0.3).astype(np.float32)
        depth[b, :m] = rng.uniform(0, 1, (m, T, K, 2))
        depth[b, :m, ..., 1] = (depth[b, :m, ..., 1] > 0.3).astype(np.float32)
        valid[b, :m] = True
    targets = {"kpts2d": kpts, "depth": depth, "valid": valid}
    return outputs, targets, m_per


def _ragged_reference_losses(outputs, targets, m_per, src_idx, eos_coef):
    """Per-sample torch re-computation following the reference equations
    (models/model.py:266-427)."""
    import torch
    import torch.nn.functional as F

    logits = torch.from_numpy(outputs["pred_logits"])
    kpts = torch.from_numpy(outputs["pred_kpts2d"])
    depth = torch.from_numpy(outputs["pred_depth"])
    num_traj = max(sum(m_per), 1)

    # gather matched rows (b*m, ...)
    ps, ts = [], []
    for b, m in enumerate(m_per):
        for j in range(m):
            ps.append(src_idx[b, j])
            ts.append((b, j))
    src_k = torch.stack([kpts[b_i[0], p] for p, b_i in zip(ps, ts)])
    src_d = torch.stack([depth[b_i[0], p] for p, b_i in zip(ps, ts)])
    tgt_k = torch.stack([torch.from_numpy(targets["kpts2d"][b, j])
                         for b, j in ts])
    tgt_d = torch.stack([torch.from_numpy(targets["depth"][b, j])
                         for b, j in ts])

    out = {}
    # is_human
    tgt_vis = (tgt_k[:, :, :, 2].sum(2) > 0).long()
    target_classes = torch.zeros(B, N_Q, T, dtype=torch.long)
    r = 0
    for b, m in enumerate(m_per):
        for j in range(m):
            target_classes[b, src_idx[b, j], :] = tgt_vis[r]
            r += 1
    w = torch.tensor([eos_coef, 1.0])
    ce = F.cross_entropy(logits.flatten(0, 2), target_classes.flatten(),
                         w, reduction="none")
    out["loss_is_human"] = ce.mean().item()

    # root
    t_root = tgt_k[:, :, :1]
    t_root_vis = t_root[..., 2:3]
    err = t_root_vis * (src_k[:, :, :1, 0:2] - t_root[..., 0:2]).abs()
    out["loss_root"] = (err.sum((-2, -3)) / (t_root_vis.sum((-2, -3)) + EPS)).sum().item() / num_traj
    trd, trde = tgt_d[:, :, :1, 0:1], tgt_d[:, :, :1, 1:2]
    err = trde * (src_d[:, :, :1] - trd).abs()
    out["loss_root_depth"] = (err.sum((-2, -3)) / (trde.sum((-2, -3)) + EPS)).sum().item() / num_traj
    out["loss_root_vis"] = ((src_k[:, :, :1, 2:3] - t_root_vis) ** 2).mean((-2, -3)).sum().item() / num_traj

    # joint
    t_joint = tgt_k[:, :, 1:, 0:2]
    t_jvis = tgt_k[:, :, 1:, 2:3]
    s_joint = src_k[:, :, 1:, 0:2] + src_k[:, :, :1, 0:2]
    err = t_jvis * (s_joint - t_joint).abs()
    out["loss_joint"] = (err.sum((-2, -3)) / (t_jvis.sum((-2, -3)) + EPS)).sum().item() / num_traj
    tjd, tjde = tgt_d[:, :, 1:, 0:1], tgt_d[:, :, 1:, 1:2]
    s_jd = src_d[:, :, :1] + src_d[:, :, 1:] / MAXD
    err = tjde * (s_jd - tjd).abs()
    out["loss_joint_depth"] = (err.sum((-2, -3)) / (tjde.sum((-2, -3)) + EPS)).sum().item() / num_traj
    out["loss_joint_vis"] = ((src_k[:, :, 1:, 2:3] - t_jvis) ** 2).mean((-2, -3)).sum().item() / num_traj

    # joint_disp
    dvis = t_jvis * t_root_vis
    t_disp = t_joint - t_root[..., 0:2]
    err = dvis * (src_k[:, :, 1:, 0:2] - t_disp).abs()
    out["loss_joint_disp"] = (err.sum((-2, -3)) / (dvis.sum((-2, -3)) + EPS)).sum().item() / num_traj
    de = tjde * trde
    t_dd = tjd - trd
    err = de * (src_d[:, :, 1:] - t_dd).abs()
    out["loss_joint_depth_disp"] = (err.sum((-2, -3)) / (de.sum((-2, -3)) + EPS)).sum().item() / num_traj

    # joint_cont
    sd = src_d.clone()
    sd[:, :, 1:] = sd[:, :, :1] + sd[:, :, 1:] / MAXD
    kep = torch.cat([src_k[..., 0:2], sd], -1)
    kep2 = kep.clone()
    kep2[:, :, 1:] = kep[:, :, 1:] - kep[:, :, :1]
    cvis = tgt_k[:, 1:, :, 2:3] * tgt_k[:, :-1, :, 2:3]
    cw = torch.from_numpy(ROOT_JOINT_CONT).reshape(1, 1, K, 1)
    err = cw * cvis * ((kep2[:, 1:] - kep2[:, :-1]) ** 2)
    out["loss_cont"] = (err.sum((-2, -3)) / (cvis.sum((-2, -3)) + EPS)).sum().item() / num_traj
    return out


def test_losses_match_ragged_reference(problem):
    outputs, targets, m_per = problem
    cfg = Config(num_queries=N_Q, num_kpts=K, max_persons=M_PAD,
                 num_frames=T, num_future_frames=0)
    crit = SetCriterion(cfg)
    out_j = {k: jnp.asarray(v) for k, v in outputs.items()}
    tgt_j = {k: jnp.asarray(v) for k, v in targets.items()}
    total, losses, src_idx = jax.jit(
        lambda o, t: crit(o, t))(out_j, tgt_j)
    src_idx = np.asarray(src_idx)

    want = _ragged_reference_losses(outputs, targets, m_per, src_idx,
                                    cfg.eos_coef)
    for k, v in want.items():
        np.testing.assert_allclose(float(losses[k]), v, rtol=1e-4, atol=1e-6,
                                   err_msg=k)
    # total is finite and includes aux-free weighting
    assert np.isfinite(float(total))


def test_empty_targets_no_nan(problem):
    outputs, _, _ = problem
    cfg = Config(num_queries=N_Q, num_kpts=K, max_persons=M_PAD,
                 num_frames=T, num_future_frames=0)
    crit = SetCriterion(cfg)
    out_j = {k: jnp.asarray(v) for k, v in outputs.items()}
    tgt_j = {
        "kpts2d": jnp.zeros((B, M_PAD, T, K, 3)),
        "depth": jnp.zeros((B, M_PAD, T, K, 2)),
        "valid": jnp.zeros((B, M_PAD), bool),
    }
    total, losses, _ = crit(out_j, tgt_j)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_blur_matches_torch_conv_oracle():
    """Oracle: torchvision.gaussian_blur's documented algorithm (sigma =
    0.3*((k-1)*0.5 - 1) + 0.8, normalized kernel, reflect pad, separable
    conv) implemented directly with torch.conv2d."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    h, w = 20, 31
    ksize = heatmap_kernel_size(h, w)
    maps = rng.uniform(0, 1, (1, 2, h, w, 3)).astype(np.float32)
    got = np.asarray(gaussian_blur_maps(jnp.asarray(maps), ksize))

    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    xs = torch.linspace(-half, half, ksize)
    pdf = torch.exp(-0.5 * (xs / sigma) ** 2)
    k1d = pdf / pdf.sum()
    x = torch.from_numpy(maps).permute(0, 1, 4, 2, 3).reshape(6, 1, h, w)
    pad = ksize // 2
    x = F.pad(x, [pad, pad, pad, pad], mode="reflect")
    x = F.conv2d(x, k1d.reshape(1, 1, ksize, 1))
    x = F.conv2d(x, k1d.reshape(1, 1, 1, ksize))
    want = x.reshape(1, 2, 3, h, w).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scatter_keypoint_maps():
    kpts = np.zeros((1, 2, 2, 3, 3), np.float32)
    # person 0 visible at pixel (x=3, y=1) for joint 0, frame 0 (w=8, h=4)
    kpts[0, 0, 0, 0] = [3.4 / 8, 1.2 / 4, 1.0]
    # person 1 invalid (masked)
    kpts[0, 1, 0, 0] = [0.1, 0.1, 1.0]
    valid = np.array([[True, False]])
    maps = np.asarray(scatter_keypoint_maps(
        jnp.asarray(kpts), jnp.asarray(valid), 2, 4, 8))
    assert maps[0, 0, 1, 3, 0] == 1.0
    assert maps.sum() == 1.0  # invalid person and invisible joints excluded


def test_criterion_matching_ignores_padding_slots(problem):
    """The criterion's internal matching must apply the same valid-mask fix
    as matcher.match: with PARTIAL visibility the padded slots' vis-MSE
    terms vary across queries, and an unmasked cost lets them steal queries
    from real targets (ADVICE round-1 high finding; the fix must cover this
    direct cost_matrix+hungarian path, not just matcher.match)."""
    from scipy.optimize import linear_sum_assignment

    from snipper_tpu.losses.criterion import matcher_weight_dict
    from snipper_tpu.matching.matcher import cost_matrix

    outputs, targets, m_per = problem
    cfg = Config(num_queries=N_Q, num_kpts=K, max_persons=M_PAD,
                 num_frames=T, num_future_frames=0)
    crit = SetCriterion(cfg)
    out_j = {k: jnp.asarray(v) for k, v in outputs.items()}
    tgt_j = {k: jnp.asarray(v) for k, v in targets.items()}
    _, _, src_idx = crit(out_j, tgt_j)
    src_idx = np.asarray(src_idx)

    w = matcher_weight_dict(cfg)
    for b, m in enumerate(m_per):
        cost = np.asarray(cost_matrix(
            out_j["pred_logits"][b:b + 1], out_j["pred_kpts2d"][b:b + 1],
            out_j["pred_depth"][b:b + 1], tgt_j["kpts2d"][b:b + 1, :m],
            tgt_j["depth"][b:b + 1, :m], cfg.max_depth, w))[0]
        rows, cols = linear_sum_assignment(cost)
        want_total = cost[rows, cols].sum()
        got_total = cost[src_idx[b, :m], np.arange(m)].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5,
                                   atol=1e-6)
