"""Device (XLA) preprocessing parity vs the host warp (cv2 semantics)."""

import numpy as np
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
