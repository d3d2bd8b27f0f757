"""Video demo entry point (counterpart of reference ``inference.py``):
snippet-wise forward over a frame directory, cross-snippet association, and
2D/3D visualization renders."""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from snipper_tpu.cli.common import add_config_args, build_config
from snipper_tpu.infer.pipeline import (ExactnessGuard, associate_snippets,
                                        iter_snippet_samples,
                                        prefetched, snippet_index)
from snipper_tpu.models.snipper import build_model, init_model
from snipper_tpu.train.checkpoint import (load_torch_checkpoint,
                                          restore_checkpoint)


def main():
    parser = argparse.ArgumentParser("snipper_tpu inference")
    add_config_args(parser)
    parser.add_argument("--data_dir", type=str, default=None,
                        help="directory of video frames")
    parser.add_argument("--video", type=str, default=None,
                        help="video file; frames are extracted to "
                             "{output_dir}/frames and the pipeline runs on "
                             "them (the reference requires pre-extracted "
                             "frames)")
    parser.add_argument("--output_dir", type=str, default="./demo_out")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--pretrained_torch", type=str, default=None)
    parser.add_argument("--seq_gap", type=int, default=5)
    parser.add_argument("--save_visuals", action="store_true")
    parser.add_argument("--vis_heatmap_frame_name", type=str, default=None,
                        help="render the heatmap overlay for THIS frame "
                             "(filename, e.g. 000012.jpg) instead of the "
                             "first snippet; errors if the frame is not "
                             "part of any predicted snippet (reference "
                             "inference.py:31,209-219)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard snippets over the device mesh (snippets "
                             "are independent; composes with "
                             "--snippet_batch for per-chip batching)")
    parser.add_argument("--device_preprocess", action="store_true",
                        help="warp/normalize frames on the TPU (fused XLA "
                             "preprocessing graph); host only decodes")
    parser.add_argument("--snippet_batch", type=int, default=1,
                        help="snippets per forward call (per chip with "
                             "--data_parallel). Canonical configs are "
                             "compute-bound (batch scaling flat/negative), "
                             "but light_t1 gains ~1.4-1.6x at 4 (dispatch "
                             "overhead amortized; BASELINE.md)")
    parser.add_argument("--preset", type=str, default="canonical_t4")
    from snipper_tpu.infer.fast import PROFILE_HELP
    parser.add_argument("--fast", type=str, default=None, help=PROFILE_HELP)
    args = parser.parse_args()
    if args.snippet_batch < 1:
        parser.error("--snippet_batch must be >= 1")
    if bool(args.data_dir) == bool(args.video):
        parser.error("exactly one of --data_dir / --video is required")
    if args.vis_heatmap_frame_name and not args.save_visuals:
        parser.error("--vis_heatmap_frame_name requires --save_visuals")
    from snipper_tpu.cli.common import respect_platform_env
    respect_platform_env()
    cfg = build_config(args)
    # inference is forward-only: default to the windowed sampling fast path
    # (exact while the runtime overflow counter stays zero; guarded below).
    # An explicit --deform_impl on the command line wins over this default.
    if args.deform_impl is None and cfg.deform_impl in ("pmerged", "xla"):
        cfg = cfg.replace(deform_impl="windowed")
    # serving profiles: the checkpoint loads under the ORIGINAL config and
    # is then transformed to the profile architecture (infer/fast.py)
    load_cfg, fast_transform = cfg, None
    if args.fast:
        from snipper_tpu.infer.fast import fast_profiles

        cfg, fast_transform = fast_profiles(cfg, args.fast)
        print(f"fast profiles {args.fast}: input "
              f"{cfg.input_height}x{cfg.input_width}, enc {cfg.enc_layers}, "
              f"points {cfg.enc_n_points}/{cfg.dec_n_points}, margin "
              f"{cfg.sampling_margin}", flush=True)
    os.makedirs(args.output_dir, exist_ok=True)
    if args.video:
        from snipper_tpu.infer.pipeline import extract_video_frames

        args.data_dir = os.path.join(args.output_dir, "frames")
        n = extract_video_frames(args.video, args.data_dir)
        print(f"extracted {n} frames from {args.video} -> {args.data_dir}",
              flush=True)

    if args.pretrained_torch:
        model = build_model(cfg)
        params = load_torch_checkpoint(args.pretrained_torch, load_cfg)
    elif args.resume:
        model = build_model(cfg)
        params = restore_checkpoint(args.resume, None)["params"]
    else:
        # demo/random-init run: the one case that needs an init pass; the
        # init tree is already profile-shaped — no transform
        model, params = init_model(cfg, jax.random.PRNGKey(0))
        fast_transform = None
    if fast_transform is not None:
        params = fast_transform(params)

    frame_indices, all_files = snippet_index(args.data_dir, cfg.num_frames,
                                             args.seq_gap)
    # lazy decode + background prefetch: JPEG decoding overlaps the device
    # forward, and long videos stream with O(1) host memory
    sample_iter = prefetched(iter_snippet_samples(
        args.data_dir, cfg.num_frames, args.seq_gap, cfg.input_shape,
        warp_on_device=args.device_preprocess,
        # the SAME listing association will index into (no re-listdir race)
        index=(frame_indices, all_files)), depth=2)
    print(f"{len(frame_indices)} snippets over {len(all_files)} frames",
          flush=True)
    first_sample = None
    vis_sample = None  # the snippet holding --vis_heatmap_frame_name

    def to_device(s):
        if args.device_preprocess:
            from snipper_tpu.data.device_preprocess import (
                preprocess_snippet_device)

            return preprocess_snippet_device(s["raw_imgs"], s["trans"],
                                             cfg.input_shape)
        return jnp.asarray(s["imgs"])

    w, h = float(cfg.input_width), float(cfg.input_height)

    def decode_one(logits, kpts, depth, s):
        """Decode one snippet's outputs to PostProcess schema (reference
        inference.py:141-189 decode block) via the SHARED decode helper."""
        from snipper_tpu.infer.postprocess import decode_predictions

        prob, score, k2, d = decode_predictions(logits, kpts, depth,
                                                cfg.max_depth, (w, h))
        return {
            "human_score": prob,
            "pred_kpt_scores": score,
            "pred_kpts": k2,
            "pred_depth": d,
            "inv_trans": s["inv_trans"],
            "img_size": s["img_size"],
            "filenames": s["filenames"],
        }

    results = []
    if args.data_parallel and jax.device_count() > 1:
        # snippets are independent: shard them over the mesh (reference
        # loops serially at batch 1, inference.py:141-189); --snippet_batch
        # sets the per-chip batch (canonical configs are compute-bound,
        # light_t1 gains ~1.4-1.6x at 4 — BASELINE.md)
        from snipper_tpu.infer.pipeline import make_data_parallel_forward
        from snipper_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp_size=-1, tp_size=1)
        dp = mesh.shape["data"]

        def build_fwd(c):
            nonlocal model
            model = build_model(c)  # params already exist; no init pass
            return make_data_parallel_forward(model, params, mesh)[0]
    else:
        dp = 1

        def build_fwd(c):
            nonlocal model
            model = build_model(c)  # params already exist; no init pass
            jitted = jax.jit(lambda p, x: model.apply({"params": p}, x))
            return lambda x: jitted(params, x)

    # exactness checked on EVERY dispatch (offsets are input-dependent;
    # any snippet can overflow the window margin, not just the first)
    guard = ExactnessGuard(cfg, build_fwd)
    gsz = dp * args.snippet_batch   # snippets per dispatch (B = dp * batch)
    if dp > 1:
        print(f"data-parallel inference over {dp} devices "
              f"(batch {gsz // dp}/chip)", flush=True)
    done = False
    while not done:
        group = []
        for s in sample_iter:
            if first_sample is None:
                first_sample = s
            if (vis_sample is None and args.vis_heatmap_frame_name
                    and args.vis_heatmap_frame_name in s["filenames"]):
                vis_sample = s
            group.append(s)
            if len(group) == gsz:
                break
        else:
            done = True
        if not group:
            break
        if gsz == 1:
            imgs = to_device(group[0])[None]  # no host round-trip at B=1
        else:
            if args.device_preprocess:
                # device-warped frames round-trip through the host once per
                # group to assemble the batch — negligible next to decode on
                # PCIe-attached hosts
                imgs = np.stack([np.asarray(to_device(s)) for s in group])
            else:
                # host-warped frames are already numpy: stack and upload
                # ONCE (uploading each snippet then reading it back would
                # triple the transfer volume)
                imgs = np.stack([s["imgs"] for s in group])
            if imgs.shape[0] < gsz:  # pad the tail; padded outputs dropped
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], gsz - imgs.shape[0], 0)], 0)
        out = guard(imgs)
        cfg = guard.cfg
        logits = np.asarray(out["pred_logits"])
        kpts = np.asarray(out["pred_kpts2d"])
        depth = np.asarray(out["pred_depth"])
        for b, s in enumerate(group):
            results.append(decode_one(logits[b], kpts[b], depth[b], s))

    frames, max_pid = associate_snippets(
        results, frame_indices, all_files, cfg.num_frames, args.seq_gap,
        cfg.max_depth)
    print(f"tracked {max_pid} identities over {len(frames)} frames",
          flush=True)
    with open(os.path.join(args.output_dir, "tracks.pkl"), "wb") as f:
        pickle.dump({"frames": frames, "max_pid": max_pid}, f)

    if args.save_visuals and first_sample is not None:
        from snipper_tpu.infer.visualize import (save_as_videos,
                                                 save_visual_results,
                                                 visualize_attention,
                                                 visualize_heatmaps)

        save_visual_results(frames, all_files, args.data_dir,
                            args.output_dir, max_pid, cfg.max_depth,
                            gap=args.seq_gap)
        save_as_videos(args.output_dir, sorted(frames.keys()), all_files)
        # heatmap + attention-sampling overlays from the first snippet, or
        # from the snippet holding --vis_heatmap_frame_name (reference
        # visualize_heatmaps + frame selection, inference.py:209-219 /
        # inference_utils.py:622-644; the attention plumbing the reference
        # collects but never draws, ms_deform_attn.py:167-233)
        if args.vis_heatmap_frame_name and vis_sample is None:
            # reference inference.py:217 raises the same way
            raise ValueError(f"frame {args.vis_heatmap_frame_name} is not "
                             "used for prediction")
        s0 = vis_sample if vis_sample is not None else first_sample
        imgs0 = np.asarray(to_device(s0))
        out0 = model.apply({"params": params}, jnp.asarray(imgs0)[None],
                           return_attn=True)
        hms = [np.asarray(h) for h in out0["heatmaps"]]
        hm_imgs, hm_names = imgs0, s0["filenames"]
        if args.vis_heatmap_frame_name:
            # only the requested frame, like the reference's named branch
            t = s0["filenames"].index(args.vis_heatmap_frame_name)
            hms = [h[:, t:t + 1] for h in hms]
            hm_imgs, hm_names = imgs0[t:t + 1], [s0["filenames"][t]]
        visualize_heatmaps(hms, hm_imgs,
                           os.path.join(args.output_dir, "heatmaps"),
                           filenames=hm_names)
        prob0 = np.asarray(
            jax.nn.softmax(out0["pred_logits"], -1))[0, :, :, 1].mean(-1)
        visualize_attention(
            [(np.asarray(l), np.asarray(a)) for l, a in out0["attn_data"]],
            imgs0,
            os.path.join(args.output_dir, "attention"),
            query_scores=prob0)
    print(f"results written to {args.output_dir}", flush=True)


if __name__ == "__main__":
    main()
