"""Multi-host utilities.

The reference aggregates eval results through a filesystem rendezvous: each
rank pickles ``intermediate_results_{rank}.pkl`` and rank 0 sleeps 10 s and
merges (reference ``main.py:291-322``). The TPU-native replacement is an
all-gather of pickled host objects over the device mesh
(``multihost_utils``-style), with a trivial single-process fast path.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object from every host process; returns the list
    ordered by process index (identical on every host)."""
    n = jax.process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # exchange lengths, pad to the max, then all-gather bytes
    ln = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    max_len = int(ln.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(ln[i, 0])].tobytes())
            for i in range(n)]


def merge_eval_results(local_results: List[dict]) -> List[dict]:
    """Concatenate per-host eval result lists (rank order)."""
    out: List[dict] = []
    for chunk in all_gather_objects(local_results):
        out.extend(chunk)
    return out


def is_main_process() -> bool:
    return jax.process_index() == 0
