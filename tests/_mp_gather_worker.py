"""Worker for the real two-process multihost test (not a test module).

Launched twice by ``test_aux_subsystems.py::test_all_gather_objects_two_real_processes``
with a shared coordinator address; each process has ONE local CPU device, so
``jax.process_count() == 2`` and the gathers run over a real gloo process
group — the TPU-native stand-in for the reference's NCCL multi-process init
(reference ``util/misc.py:400-439``).
"""

import sys

import jax

# the machine sitecustomize pins jax_platforms to the TPU tunnel; repin
# BEFORE any backend use (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")


def main():
    addr, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    from snipper_tpu.parallel.multihost import (all_gather_objects,
                                                is_main_process,
                                                merge_eval_results)

    assert jax.process_count() == nproc, jax.process_count()
    assert is_main_process() == (pid == 0)

    # unequal payload sizes exercise the length-exchange + padding path
    obj = {"rank": pid, "payload": "x" * (10 if pid == 0 else 1000)}
    got = all_gather_objects(obj)
    assert [g["rank"] for g in got] == list(range(nproc)), got
    assert [len(g["payload"]) for g in got] == [10, 1000], got

    merged = merge_eval_results([{"r": pid, "i": i} for i in range(pid + 1)])
    assert merged == [{"r": 0, "i": 0}, {"r": 1, "i": 0},
                      {"r": 1, "i": 1}], merged
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
