"""Native extension parity: C++ warp/LSA vs the numpy/scipy references."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from snipper_tpu.data import native_ops
from snipper_tpu.data.transforms import gen_trans_from_patch, generate_patch_image

pytestmark = pytest.mark.skipif(not native_ops.have_native(),
                                reason="native extension not built")


def test_warp_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (90, 120, 3), dtype=np.uint8).astype(np.uint8)
    trans = gen_trans_from_patch(60, 45, 120, 90, 64, 48, rot=17.0)
    for flip in (False, True):
        got = native_ops.warp_patch(img, trans, (48, 64), do_flip=flip,
                                    color_scale=(1.1, 0.9, 1.0))
        want = generate_patch_image(img, flip, trans, (48, 64))
        for c, s in enumerate((1.1, 0.9, 1.0)):
            want[:, :, c] = np.clip(want[:, :, c] * s, 0, 1)
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_lsa_matches_scipy():
    rng = np.random.default_rng(1)
    for m, n in ((5, 9), (8, 8), (1, 4)):
        cost = rng.standard_normal((m, n))
        got = native_ops.lsa(cost)
        rows, cols = linear_sum_assignment(cost)
        want_total = cost[rows, cols].sum()
        got_total = cost[np.arange(m), got].sum()
        assert abs(got_total - want_total) < 1e-9
        assert len(set(got.tolist())) == m
