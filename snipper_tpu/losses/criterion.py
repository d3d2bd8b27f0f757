"""Set criterion: Hungarian matching + the six Snipper losses, fully padded
and masked so a train step is ONE XLA program.

Loss-by-loss parity with the reference ``SetCriterion``
(``models/model.py:240-545``):

- ``is_human``   — CE over (query, frame) with empty-class weight ``eos_coef``
                   (reference ``:266-286``)
- ``root``       — visibility-weighted L1 on root xy + depth, MSE on vis
                   (``:288-324``)
- ``joint``      — L1 on recomposed joints (root + displacement) (``:326-362``)
- ``joint_disp`` — L1 on raw displacements, root-gated visibility (``:364-399``)
- ``joint_cont`` — per-joint-weighted temporal continuity MSE (``:401-427``)
- ``heatmap``    — MSE (sum) vs Gaussian-blurred GT maps per level/head
                   (``:429-482``)

The ragged per-sample target lists of the reference are replaced by padding
to ``max_persons`` with a ``valid`` mask; every normalizer (per-target
visibility sums with eps, the global ``num_traj``) reproduces the reference
exactly because padded rows carry zero visibility. ``num_traj`` is psum-med
over the data-parallel axis when ``axis_name`` is given (the reference
all-reduces it, ``models/model.py:521-526``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from snipper_tpu.config import Config
from snipper_tpu.data.skeleton import ROOT_JOINT_CONT
from snipper_tpu.losses.heatmap import heatmap_targets
from snipper_tpu.matching.matcher import match

EPS = 1e-5


def loss_weight_dict(cfg: Config) -> Dict[str, float]:
    """Reference ``build_model`` weight_dict (models/model.py:643-660);
    ``max_depth == -1`` disables all depth terms (``:638-641``)."""
    depth_on = cfg.depth_enabled
    return {
        "loss_is_human": cfg.is_human_loss_coef,
        "loss_root": cfg.root_loss_coef,
        "loss_root_vis": cfg.root_vis_loss_coef,
        "loss_root_depth": cfg.root_depth_loss_coef if depth_on else 0.0,
        "loss_joint_disp": cfg.joint_disp_loss_coef,
        "loss_joint_depth_disp": (cfg.joint_disp_depth_loss_coef
                                  if depth_on else 0.0),
        "loss_joint": cfg.joint_loss_coef,
        "loss_joint_vis": cfg.joint_vis_loss_coef,
        "loss_joint_depth": cfg.joint_depth_loss_coef if depth_on else 0.0,
        "loss_cont": cfg.cont_loss_coef,
        "loss_heatmap": cfg.heatmap_loss_coef,
    }


def matcher_weight_dict(cfg: Config) -> Dict[str, float]:
    depth_on = cfg.depth_enabled
    return {
        "is_human": cfg.set_cost_is_human,
        "root": cfg.set_cost_root,
        "root_vis": cfg.set_cost_root_vis,
        "root_depth": cfg.set_cost_root_depth if depth_on else 0.0,
        "joint": cfg.set_cost_joint,
        "joint_vis": cfg.set_cost_joint_vis,
        "joint_depth": cfg.set_cost_joint_depth if depth_on else 0.0,
    }


def _gather_matched(pred: jnp.ndarray, src_idx: jnp.ndarray) -> jnp.ndarray:
    """``pred [B, n, ...]`` gathered at ``src_idx [B, M]`` -> ``[B, M, ...]``."""
    idx = src_idx.reshape(src_idx.shape + (1,) * (pred.ndim - 2))
    idx = jnp.broadcast_to(idx, src_idx.shape + pred.shape[2:])
    return jnp.take_along_axis(pred, idx, axis=1)


class SetCriterion:
    """Functional criterion; construct once from a Config, call inside jit."""

    def __init__(self, cfg: Config, dp_size: int = 1):
        self.cfg = cfg
        self.weights = loss_weight_dict(cfg)
        self.match_weights = matcher_weight_dict(cfg)
        # number of data-parallel shards the global batch spans. Every
        # num_traj-normalized loss is automatically equivalent to the
        # reference's per-rank-loss + DDP gradient averaging, but the
        # heatmap loss is a bare SUM (reference model.py:441-443:
        # mse_loss(reduction='sum')/nhead per rank, then DDP averages
        # over W ranks -> global_sum/(nhead*W)) — so the global-batch sum
        # must be divided by dp_size to match.
        self.dp_size = max(int(dp_size), 1)
        # per-joint continuity weights are defined for JOINT15 (reference
        # ROOTJOINTCONT); slice for smaller test joint sets
        self.cont_weights = jnp.asarray(
            ROOT_JOINT_CONT[: cfg.num_kpts])[None, None, :, None]
        # max_depth==-1 still divides displacements by it in recomposition;
        # the reference keeps the raw value (losses are zero-weighted instead)
        self.max_depth = cfg.max_depth

    # ---------------------------------------------------------------- losses
    def _loss_set(
        self,
        logits: jnp.ndarray,     # [B, n, T, 2]
        kpts2d: jnp.ndarray,     # [B, n, T, K, 3]
        depth: jnp.ndarray,      # [B, n, T, K, 1]
        targets: Dict[str, jnp.ndarray],
        src_idx: jnp.ndarray,    # [B, M]
        num_traj: jnp.ndarray,   # scalar
    ) -> Dict[str, jnp.ndarray]:
        t_kpts = targets["kpts2d"].astype(jnp.float32)   # [B, M, T, K, 3]
        t_depth = targets["depth"].astype(jnp.float32)   # [B, M, T, K, 2]
        valid = targets["valid"].astype(jnp.float32)     # [B, M]
        B, n, T, _ = logits.shape
        M = t_kpts.shape[1]

        p_kpts = _gather_matched(kpts2d, src_idx).astype(jnp.float32)
        p_depth = _gather_matched(depth, src_idx).astype(jnp.float32)

        losses = {}

        # ---- is_human (reference :266-286) --------------------------------
        tgt_vis_frame = (jnp.sum(t_kpts[..., 2], axis=3) > 0).astype(jnp.int32)
        onehot = ((src_idx[:, :, None] == jnp.arange(n)[None, None, :])
                  & targets["valid"][:, :, None])         # [B, M, n]
        target_classes = jnp.sum(
            onehot[..., None].astype(jnp.int32) * tgt_vis_frame[:, :, None, :],
            axis=1)                                       # [B, n, T]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        class_w = jnp.asarray([self.cfg.eos_coef, 1.0], jnp.float32)
        picked = jnp.take_along_axis(logp, target_classes[..., None], -1)[..., 0]
        ce = -picked * class_w[target_classes]
        losses["loss_is_human"] = jnp.mean(ce)

        # ---- shared target slices -----------------------------------------
        t_root = t_kpts[:, :, :, :1]
        t_root_vis = t_root[..., 2:3]
        t_joint = t_kpts[:, :, :, 1:, 0:2]
        t_joint_vis = t_kpts[:, :, :, 1:, 2:3]
        t_root_d = t_depth[:, :, :, :1, 0:1]
        t_root_d_exist = t_depth[:, :, :, :1, 1:2]
        t_joint_d = t_depth[:, :, :, 1:, 0:1]
        t_joint_d_exist = t_depth[:, :, :, 1:, 1:2]

        p_root = p_kpts[:, :, :, :1]
        p_root_d = p_depth[:, :, :, :1]
        p_joint_vis = p_kpts[:, :, :, 1:, 2:3]
        p_joint = p_kpts[:, :, :, 1:, 0:2] + p_root[..., 0:2]
        p_joint_disp = p_kpts[:, :, :, 1:, 0:2]
        p_joint_d = p_root_d + p_depth[:, :, :, 1:] / self.max_depth
        p_joint_d_disp = p_depth[:, :, :, 1:]

        vmask = valid[:, :, None]  # [B, M, 1] for per-target [B, M, c] terms

        def norm_sum(err, w):
            # err, w: [B, M, T, J, c]; per-target normalize, sum, / num_traj
            per = (jnp.sum(w * err, (-2, -3))
                   / (jnp.sum(w, (-2, -3)) + EPS))        # [B, M, c]
            return jnp.sum(per * vmask) / num_traj

        # ---- root (:288-324) ----------------------------------------------
        losses["loss_root"] = norm_sum(
            jnp.abs(p_root[..., 0:2] - t_root[..., 0:2]), t_root_vis)
        losses["loss_root_depth"] = norm_sum(
            jnp.abs(p_root_d - t_root_d), t_root_d_exist)
        losses["loss_root_vis"] = jnp.sum(
            jnp.mean((p_root[..., 2:3] - t_root_vis) ** 2, (-2, -3))
            * vmask) / num_traj

        # ---- joint (:326-362) ---------------------------------------------
        losses["loss_joint"] = norm_sum(
            jnp.abs(p_joint - t_joint), t_joint_vis)
        losses["loss_joint_depth"] = norm_sum(
            jnp.abs(p_joint_d - t_joint_d), t_joint_d_exist)
        losses["loss_joint_vis"] = jnp.sum(
            jnp.mean((p_joint_vis - t_joint_vis) ** 2, (-2, -3))
            * vmask) / num_traj

        # ---- joint displacement (:364-399) --------------------------------
        disp_vis = t_joint_vis * t_root_vis
        t_disp = t_joint - t_root[..., 0:2]
        losses["loss_joint_disp"] = norm_sum(
            jnp.abs(p_joint_disp - t_disp), disp_vis)
        d_exist = t_joint_d_exist * t_root_d_exist
        t_d_disp = t_joint_d - t_root_d
        losses["loss_joint_depth_disp"] = norm_sum(
            jnp.abs(p_joint_d_disp - t_d_disp), d_exist)

        # ---- temporal continuity (:401-427) -------------------------------
        d_abs = jnp.concatenate([p_root_d, p_joint_d], axis=3)  # [B,M,T,K,1]
        kepts = jnp.concatenate([p_kpts[..., 0:2], d_abs], -1)  # [B,M,T,K,3]
        root_sg = jax.lax.stop_gradient(kepts[:, :, :, :1])
        kepts = jnp.concatenate(
            [kepts[:, :, :, :1], kepts[:, :, :, 1:] - root_sg], axis=3)
        cont_vis = t_kpts[:, :, 1:, :, 2:3] * t_kpts[:, :, :-1, :, 2:3]
        err = (self.cont_weights[None] * cont_vis
               * (kepts[:, :, 1:] - kepts[:, :, :-1]) ** 2)
        per = (jnp.sum(err, (-2, -3))
               / (jnp.sum(cont_vis, (-2, -3)) + EPS))
        losses["loss_cont"] = jnp.sum(per * vmask) / num_traj
        return losses

    def _loss_heatmap(self, heatmaps, targets) -> jnp.ndarray:
        """Reference ``loss_heatmap`` (:429-446): per level, MSE *sum* against
        the blurred GT maps repeated per head, divided by nhead."""
        total = jnp.float32(0.0)
        for hm in heatmaps:
            B, t, h, w, nhead, K = hm.shape
            tgt = heatmap_targets(targets["kpts2d"], targets["valid"], t, h, w)
            err = (hm.astype(jnp.float32) - tgt[:, :, :, :, None, :]) ** 2
            total = total + jnp.sum(err) / nhead
        # dp equivalence: the reference sums per rank and DDP-averages
        # gradients over ranks; our sum runs over the GLOBAL batch
        return total / self.dp_size

    # ---------------------------------------------------------------- call
    def __call__(
        self,
        outputs: Dict[str, jnp.ndarray],
        targets: Dict[str, jnp.ndarray],
        axis_name: Optional[str] = None,
        solver: str = "jax",
        num_traj: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        """Returns (total_weighted_loss, loss_dict, src_idx_of_final_layer).

        ``num_traj``: optional externally-computed normalizer, used AS-IS
        (no re-clamp). Gradient accumulation passes the window's
        ``max(total_valid / k, 1)`` here so k microbatches reproduce the
        reference's k-rank all-reduced normalizer exactly
        (``models/model.py:521-526``; ``train/engine.py::
        inject_window_num_traj``). num_traj is a pure function of the
        targets, so the window total is computable up front on the host."""
        if num_traj is None:
            num_traj = jnp.sum(targets["valid"].astype(jnp.float32))
            if axis_name is not None:
                num_traj = jax.lax.pmean(num_traj, axis_name)
            num_traj = jnp.clip(num_traj, 1.0, None)
        else:
            num_traj = jnp.asarray(num_traj, jnp.float32)

        def run_layer(logits, kpts2d, depth):
            # one shared matching implementation (cost + padding-column
            # masking + solve) — see matcher.match for the masking rationale
            src_idx, _ = match(
                {"pred_logits": logits, "pred_kpts2d": kpts2d,
                 "pred_depth": depth}, targets, self.max_depth,
                self.match_weights, solver=solver)
            ld = self._loss_set(logits, kpts2d, depth, targets, src_idx,
                                num_traj)
            return ld, src_idx

        losses, src_idx = run_layer(outputs["pred_logits"],
                                    outputs["pred_kpts2d"],
                                    outputs["pred_depth"])
        if "heatmaps" in outputs:
            losses["loss_heatmap"] = self._loss_heatmap(
                outputs["heatmaps"], targets)

        if "aux_logits" in outputs:
            n_aux = outputs["aux_logits"].shape[0]
            for i in range(n_aux):
                aux_ld, _ = run_layer(outputs["aux_logits"][i],
                                      outputs["aux_kpts2d"][i],
                                      outputs["aux_depth"][i])
                for k, v in aux_ld.items():
                    losses[f"{k}_{i}"] = v

        total = jnp.float32(0.0)
        for k, v in losses.items():
            base = k.rsplit("_", 1)
            w = self.weights.get(k)
            if w is None and base[-1].isdigit():
                w = self.weights.get(base[0])
            total = total + jnp.float32(w if w is not None else 0.0) * v
        return total, losses, src_idx
