"""Device (XLA) preprocessing parity vs the host warp (cv2 semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from snipper_tpu.data.device_preprocess import (invert_axis_aligned,
                                                preprocess_snippet_device,
                                                warp_affine_device)
from snipper_tpu.data.transforms import (gen_trans_from_patch,
                                         generate_patch_image, warp_affine)


def test_device_warp_matches_host_center_crop():
    """The inference center crop-resize must match the host path
    (warp + /255, zero border) to float tolerance."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    out_h, out_w = 30, 40
    scale = max(64 / out_w, 48 / out_h)
    trans = gen_trans_from_patch(32.0, 24.0, out_w * scale, out_h * scale,
                                 out_w, out_h, 0.0)
    want = generate_patch_image(img, False, trans, (out_h, out_w))
    got = np.asarray(preprocess_snippet_device(img[None], trans,
                                               (out_h, out_w)))[0]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_device_warp_zero_border_and_flip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 20, 3), np.uint8)
    # zoom OUT so the destination needs out-of-source samples (zero border)
    trans = gen_trans_from_patch(10.0, 10.0, 60.0, 60.0, 24, 24, 0.0)
    want = warp_affine(img, trans, (24, 24)) / 255.0
    inv = invert_axis_aligned(trans)
    got = np.asarray(warp_affine_device(jnp.asarray(img), jnp.asarray(inv),
                                        (24, 24)))
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert np.allclose(got[0, 0], 0.0)  # border really is zero

    # flip: compare against host warp of the flipped image
    want_f = warp_affine(img[:, ::-1], trans, (24, 24)) / 255.0
    got_f = np.asarray(warp_affine_device(jnp.asarray(img), jnp.asarray(inv),
                                          (24, 24), do_flip=True))
    np.testing.assert_allclose(got_f, want_f, atol=2e-3)


def test_device_warp_batched_snippet():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (4, 36, 60, 3), np.uint8)
    out_h, out_w = 24, 40
    scale = max(60 / out_w, 36 / out_h)
    trans = gen_trans_from_patch(30.0, 18.0, out_w * scale, out_h * scale,
                                 out_w, out_h, 0.0)
    got = np.asarray(preprocess_snippet_device(imgs, trans, (out_h, out_w)))
    assert got.shape == (4, out_h, out_w, 3)
    for t in range(4):
        want = generate_patch_image(imgs[t], False, trans, (out_h, out_w))
        np.testing.assert_allclose(got[t], want, atol=2e-3)


def test_host_warp_matches_cv2_warpaffine_oracle():
    """generate_patch_image vs the reference's literal op —
    cv2.warpAffine(INTER_LINEAR) + /255 (reference transforms.py:137-144).
    cv2 interpolates in 5-bit fixed point, so agreement is ~2^-5/255."""
    cv2 = pytest.importorskip("cv2")

    from snipper_tpu.data.transforms import (gen_trans_from_patch,
                                             generate_patch_image)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (120, 160, 3), np.uint8)
    # rotated + scaled crop, partially out of bounds (zero border)
    trans = gen_trans_from_patch(60.0, 50.0, 200.0, 150.0, 96, 64, 25.0)

    ours = generate_patch_image(img, False, trans, (64, 96))
    ref = cv2.warpAffine(img, trans, (96, 64),
                         flags=cv2.INTER_LINEAR).astype(np.float32) / 255

    err = np.abs(ours - ref)
    assert err.max() < 4.0 / 255, err.max()
    assert err.mean() < 0.5 / 255, err.mean()

    # flipped path too (reference flips the source first)
    ours_f = generate_patch_image(img, True, trans, (64, 96))
    ref_f = cv2.warpAffine(img[:, ::-1, :], trans, (96, 64),
                           flags=cv2.INTER_LINEAR).astype(np.float32) / 255
    assert np.abs(ours_f - ref_f).max() < 4.0 / 255


def test_affine_construction_matches_cv2_oracle():
    """gen_trans_from_patch vs the reference's cv2.getAffineTransform
    3-point construction (transforms.py:155-185): center + rotated
    down/right direction triangles, forward and inverse."""
    cv2 = pytest.importorskip("cv2")

    from snipper_tpu.data.transforms import gen_trans_from_patch

    def reference_trans(cx, cy, sw, sh, dw, dh, rot, inv):
        r = np.pi * rot / 180
        rot2d = lambda p: np.array(  # noqa: E731
            [p[0] * np.cos(r) - p[1] * np.sin(r),
             p[0] * np.sin(r) + p[1] * np.cos(r)], np.float32)
        sc = np.array([cx, cy], np.float32)
        src = np.stack([sc, sc + rot2d([0, sh * 0.5]),
                        sc + rot2d([sw * 0.5, 0])])
        dc = np.array([dw * 0.5, dh * 0.5], np.float32)
        dst = np.stack([dc, dc + [0, dh * 0.5], dc + [dw * 0.5, 0]])
        a, b = (dst, src) if inv else (src, dst)
        return cv2.getAffineTransform(np.float32(a), np.float32(b))

    for cx, cy, sw, sh, dw, dh, rot in (
            (960.0, 540.0, 1920.0, 1080.0, 800, 600, 0.0),
            (300.0, 200.0, 500.0, 400.0, 96, 64, 25.0),
            (100.0, 400.0, 777.0, 333.0, 128, 96, -17.5)):
        for inv in (False, True):
            ours = gen_trans_from_patch(cx, cy, sw, sh, dw, dh, rot, inv=inv)
            want = reference_trans(cx, cy, sw, sh, dw, dh, rot, inv)
            np.testing.assert_allclose(ours, want, rtol=0, atol=1e-3,
                                       err_msg=f"{(cx, rot, inv)}")


# ---------------------------------------------------------------------------
# General (rotation-capable) train-path device warp (round 5)
# ---------------------------------------------------------------------------
def test_general_device_warp_matches_host_warp_patch():
    """warp_train_batch_device must reproduce the host fused op
    (native_ops.warp_patch: flip + ROTATED bilinear warp + /255 + color +
    clip) — the train augmentation includes ±25° rotation, which the
    separable inference warp cannot express."""
    from snipper_tpu.data.device_preprocess import warp_train_batch_device
    from snipper_tpu.data.native_ops import warp_patch
    from snipper_tpu.data.transforms import fold_flip_inverse

    rng = np.random.default_rng(3)
    out_h, out_w = 32, 48
    cases = [
        # (rot_deg, do_flip, color)
        (0.0, False, (1.0, 1.0, 1.0)),
        (17.0, False, (0.9, 1.1, 1.05)),
        (-25.0, True, (1.2, 0.8, 1.0)),
        (8.0, True, (1.0, 1.3, 0.7)),   # color clips at 1.0
    ]
    H, W = 40, 56
    raws, invs, colors, wants = [], [], [], []
    for rot, do_flip, color in cases:
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        scale = max(W / out_w, H / out_h) * rng.uniform(0.8, 1.2)
        cx, cy = W * rng.uniform(0.4, 0.6), H * rng.uniform(0.4, 0.6)
        trans = gen_trans_from_patch(cx, cy, out_w * scale, out_h * scale,
                                     out_w, out_h, rot)
        wants.append(warp_patch(img, trans, (out_h, out_w), do_flip, color))
        raws.append(np.repeat(img[None], 2, 0))        # T=2 same frame
        invs.append(np.repeat(fold_flip_inverse(trans, do_flip, W)[None],
                              2, 0))
        colors.append(np.asarray(color, np.float32))
    got = np.asarray(warp_train_batch_device(
        jnp.asarray(np.stack(raws)), jnp.asarray(np.stack(invs)),
        jnp.asarray(np.stack(colors)), (out_h, out_w)))
    assert got.shape == (len(cases), 2, out_h, out_w, 3)
    for b, want in enumerate(wants):
        for t in range(2):
            np.testing.assert_allclose(got[b, t], want, atol=2e-3,
                                       err_msg=f"case {b}")


def test_general_device_warp_zero_padding_is_zero_border():
    """Zero-padding raw frames to a shared batch shape must not change the
    result: padding IS the warp's zero border (the property stack_batch's
    size-free padding relies on)."""
    from snipper_tpu.data.device_preprocess import warp_train_batch_device
    from snipper_tpu.data.transforms import fold_flip_inverse

    rng = np.random.default_rng(4)
    H, W, out_h, out_w = 30, 44, 24, 32
    img = rng.integers(0, 256, (H, W, 3), np.uint8)
    # zoom OUT with rotation so taps cross the true border
    trans = gen_trans_from_patch(W / 2, H / 2, 3.0 * W, 3.0 * H,
                                 out_w, out_h, 12.0)
    inv = fold_flip_inverse(trans, False, W)

    def run(h_pad, w_pad):
        raw = np.zeros((1, 1, h_pad, w_pad, 3), np.uint8)
        raw[0, 0, :H, :W] = img
        return np.asarray(warp_train_batch_device(
            jnp.asarray(raw), jnp.asarray(inv)[None, None],
            jnp.ones((1, 3), np.float32), (out_h, out_w)))[0, 0]

    np.testing.assert_allclose(run(H, W), run(H + 34, W + 20), atol=1e-6)


def test_train_step_device_preprocess_matches_host_images():
    """The jitted train step fed raw uint8 frames + warp params must
    produce the SAME loss/gradients as the host-warped images path (the
    warp is fused into the XLA program; exactness = the parity above)."""
    import jax

    from snipper_tpu.config import Config
    from snipper_tpu.data.native_ops import warp_patch
    from snipper_tpu.data.transforms import fold_flip_inverse
    from snipper_tpu.losses.criterion import SetCriterion
    from snipper_tpu.models.snipper import init_model
    from snipper_tpu.train.state import create_train_state
    from snipper_tpu.train.step import make_train_step

    cfg = Config.tiny().replace(dropout=0.0)
    model, params = init_model(cfg, jax.random.PRNGKey(0))
    crit = SetCriterion(cfg)
    rng_np = np.random.default_rng(5)
    B, T = 2, cfg.num_frames
    H, W = 80, 112
    out_h, out_w = cfg.input_height, cfg.input_width

    raws = rng_np.integers(0, 256, (B, T, H, W, 3), np.uint8)
    invs = np.zeros((B, T, 2, 3), np.float32)
    colors = rng_np.uniform(0.8, 1.2, (B, 3)).astype(np.float32)
    host_imgs = np.zeros((B, T, out_h, out_w, 3), np.float32)
    for b in range(B):
        rot = float(rng_np.uniform(-20, 20))
        do_flip = bool(b % 2)
        scale = max(W / out_w, H / out_h)
        trans = gen_trans_from_patch(W / 2, H / 2, out_w * scale,
                                     out_h * scale, out_w, out_h, rot)
        for t in range(T):
            invs[b, t] = fold_flip_inverse(trans, do_flip, W)
            host_imgs[b, t] = warp_patch(raws[b, t], trans, (out_h, out_w),
                                         do_flip, colors[b])

    T1, Kj, M = cfg.total_frames, cfg.num_kpts, cfg.max_persons
    kpts = np.zeros((B, M, T1, Kj, 3), np.float32)
    depth = np.zeros((B, M, T1, Kj, 2), np.float32)
    valid = np.zeros((B, M), bool)
    kpts[:, 0, ..., 0:2] = rng_np.uniform(0.2, 0.8, (B, T1, Kj, 2))
    kpts[:, 0, ..., 2] = 1.0
    depth[:, 0, ..., 1] = 1.0
    valid[:, 0] = True
    targets = {"kpts2d": jnp.asarray(kpts), "depth": jnp.asarray(depth),
               "valid": jnp.asarray(valid)}

    rng = jax.random.PRNGKey(1)
    state, tx = create_train_state(cfg, params, steps_per_epoch=10)
    step = make_train_step(model, crit, tx, donate=False,
                           mixed_precision=False)
    _, m_host = step(state, {"images": jnp.asarray(host_imgs),
                             "targets": targets}, rng)
    state2, _ = create_train_state(cfg, params, steps_per_epoch=10)
    _, m_dev = step(state2, {"raw_images": jnp.asarray(raws),
                             "warp_inv": jnp.asarray(invs),
                             "color_scale": jnp.asarray(colors),
                             "targets": targets}, rng)
    np.testing.assert_allclose(float(m_dev["loss_total"]),
                               float(m_host["loss_total"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_dev["grad_norm"]),
                               float(m_host["grad_norm"]), rtol=2e-3)
