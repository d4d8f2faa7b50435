"""A/B the background-fetch-thread against the blocking fetch, interleaved
in ONE process so the service phase hits both arms equally.  Real chip."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import bench as benchmod  # reuse bench.py's simulation
    from mapper_tpu import Api, AlignmentParameters
    from mapper_tpu.align.query import Query
    from mapper_tpu.batch.engine import BatchAligner

    ref_text, reads = benchmod.simulate()
    index = Api.new_database({"chr1": ref_text})
    params = AlignmentParameters.defaults()
    engine = BatchAligner(index, params)
    queries = [Query(r) for r in reads]
    engine.process_batch(queries)  # warmup/compile

    arms = {"async": [], "blocking": []}
    for round_ in range(4):
        for arm, env in (("async", "1"), ("blocking", "0")):
            os.environ["MAPPER_TPU_ASYNC_FETCH"] = env
            t0 = time.perf_counter()
            engine.process_batch(queries, notify=False)
            dt = time.perf_counter() - t0
            arms[arm].append(dt)
            print(f"round {round_} {arm}: {dt:.3f}s ({len(queries) / dt:.0f} reads/s)")
    for arm, ts in arms.items():
        print(
            f"{arm}: min {min(ts):.3f}s best {len(queries) / min(ts):.0f} reads/s, "
            f"median {sorted(ts)[len(ts) // 2]:.3f}s"
        )


if __name__ == "__main__":
    import bench  # noqa: F401  (path setup)

    main()
