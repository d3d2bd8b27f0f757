"""Multi-process data sharding (DistributedSampler analog).

The reference shards train/val indices across ranks with
``DistributedSampler`` (reference ``main.py:229-231``). These tests simulate
N processes by constructing loaders with explicit ``process_index`` /
``process_count`` and assert (a) shard disjointness/coverage, (b) the union
of per-host batches equals the single-process batch stream, and (c) a
data-sharded global batch yields the same loss as the replicated one.
"""

import numpy as np
import pytest

from snipper_tpu.data.loader import DataLoader


class _ArrayDataset:
    """Minimal map-style dataset: each item is a dict of arrays."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"images": np.full((2, 4, 4, 3), i, np.float32),
                "targets": {"kpts2d": np.zeros((2, 2, 3, 3), np.float32),
                            "depth": np.zeros((2, 2, 3, 2), np.float32),
                            "valid": np.zeros((2,), bool)}}


def _batch_ids(batch):
    return batch["images"][:, 0, 0, 0, 0].astype(np.int64)


@pytest.mark.parametrize("n,count", [(16, 2), (17, 2), (30, 4), (7, 4)])
def test_shards_disjoint_and_cover(n, count):
    ds = _ArrayDataset(n)
    shards = []
    for rank in range(count):
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        drop_last=False, process_index=rank,
                        process_count=count)
        dl.set_epoch(1)
        shards.append(dl._indices())
    lens = {len(s) for s in shards}
    assert len(lens) == 1  # equal-length shards on every process
    all_idx = np.concatenate(shards)
    # union covers the dataset; overlap only from wrap-around padding
    assert set(all_idx.tolist()) == set(range(n))
    pad = len(all_idx) - n
    counts = np.bincount(all_idx, minlength=n)
    assert (counts >= 1).all() and (counts <= 2).all()
    assert (counts == 2).sum() == pad


def test_per_host_batches_union_to_global_stream():
    n, count, bs = 16, 2, 2
    ds = _ArrayDataset(n)
    # single-process loader with the GLOBAL per-step batch (count * bs)
    global_dl = DataLoader(ds, batch_size=count * bs, shuffle=True, seed=5,
                           process_index=0, process_count=1)
    host_dls = [DataLoader(ds, batch_size=bs, shuffle=True, seed=5,
                           process_index=r, process_count=count)
                for r in range(count)]
    for dl in [global_dl] + host_dls:
        dl.set_epoch(2)
    host_iters = [iter(dl) for dl in host_dls]
    for gbatch in global_dl:
        hosts = [next(it) for it in host_iters]
        # global batch index set == union of the per-host batch index sets
        got = np.sort(np.concatenate([_batch_ids(h) for h in hosts]))
        want = np.sort(_batch_ids(gbatch))
        np.testing.assert_array_equal(got, want)
        # and per-host batches are disjoint
        assert len(set(got.tolist())) == count * bs


def test_epoch_reshuffle_changes_order_not_coverage():
    ds = _ArrayDataset(12)
    dl = DataLoader(ds, 3, shuffle=True, seed=0, process_index=1,
                    process_count=2)
    dl.set_epoch(0)
    a = dl._indices().copy()
    dl.set_epoch(1)
    b = dl._indices().copy()
    assert not np.array_equal(a, b)
    assert len(a) == len(b) == 6


def test_sharded_global_batch_loss_matches_replicated():
    """A data-sharded global batch through a jitted loss == replicated."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snipper_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp_size=8, tp_size=1)
    x = np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((16, 4)).astype(np.float32)

    @jax.jit
    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    repl = loss(w, jax.device_put(x, NamedSharding(mesh, P())))
    shrd = loss(w, jax.device_put(x, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(repl), np.asarray(shrd), rtol=1e-6)


def test_checkpoint_retention(tmp_path):
    from snipper_tpu.train.checkpoint import (restore_checkpoint,
                                              save_checkpoint)

    state = {"w": np.arange(4, dtype=np.float32)}
    paths = [save_checkpoint(str(tmp_path), state, e, keep=3)
             for e in range(5)]
    import os

    kept = sorted(d for d in os.listdir(tmp_path)
                  if d.startswith("checkpoint"))
    assert kept == ["checkpoint0002", "checkpoint0003", "checkpoint0004"]
    got = restore_checkpoint(paths[-1], state)
    np.testing.assert_array_equal(got["w"], state["w"])


def test_num_workers_same_batches():
    ds = _ArrayDataset(12)
    a = DataLoader(ds, 3, shuffle=True, seed=4, process_index=0,
                   process_count=1, num_workers=0)
    b = DataLoader(ds, 3, shuffle=True, seed=4, process_index=0,
                   process_count=1, num_workers=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(_batch_ids(x), _batch_ids(y))


def test_device_prefetch_order_and_completeness():
    from snipper_tpu.data.loader import device_prefetch

    seen = []
    out = list(device_prefetch(iter(range(7)),
                               lambda x: (seen.append(x), x * 10)[1]))
    assert out == [0, 10, 20, 30, 40, 50, 60]
    assert seen == list(range(7))


def test_early_break_releases_worker_thread():
    """Abandoning the iterator mid-epoch (max_steps, preemption) must not
    leak the producer thread blocked on the bounded queue."""
    import threading
    import time

    from snipper_tpu.config import Config
    from snipper_tpu.data.loader import DataLoader
    from snipper_tpu.data.synthetic import SyntheticDataset

    cfg = Config.tiny()
    loader = DataLoader(SyntheticDataset(cfg, n_samples=32), 2,
                        shuffle=False, prefetch=1,
                        process_index=0, process_count=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # what an early `break` does via GeneratorExit
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        "loader worker thread leaked after early break")


def test_num_workers_deterministic_and_thread_safe(tmp_path):
    """Multi-threaded sample decode must produce byte-identical batches to
    single-threaded iteration (per-sample generators; numpy Generators are
    not thread-safe when shared)."""
    import pickle

    import numpy as np
    from PIL import Image

    from snipper_tpu.config import Config
    from snipper_tpu.data.datasets import HybridDataset
    from snipper_tpu.data.loader import DataLoader

    root = tmp_path / "pt"
    rng = np.random.default_rng(1)
    seq = []
    for i in range(16):
        fn = f"images/val/000001_x/{i:06d}.jpg"
        p = root / fn
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (96, 128, 3),
                                     dtype=np.int64).astype("uint8")
                        ).save(p)
        kpts = rng.uniform(10, 80, (2, 18, 3))
        kpts[..., 2] = 1.0
        seq.append({"filename": fn, "kpts2d": kpts,
                    "bboxes": rng.uniform(0, 50, (2, 4)),
                    "track_id": np.array([0, 1]), "is_label": True})
    with open(root / "train_filled.pkl", "wb") as f:
        pickle.dump({"000001_x": seq}, f)

    cfg = Config.tiny()

    def batches(num_workers):
        ds = HybridDataset(cfg, mode="train", posetrack_dir=str(root))
        loader = DataLoader(ds, 2, shuffle=True, seed=3,
                            num_workers=num_workers,
                            process_index=0, process_count=1)
        loader.set_epoch(1)
        return list(loader)

    a = batches(0)
    b = batches(4)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["images"], bb["images"])
        np.testing.assert_array_equal(ba["targets"]["kpts2d"],
                                      bb["targets"]["kpts2d"])
