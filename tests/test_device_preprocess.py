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
