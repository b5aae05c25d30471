#!/usr/bin/env python
"""Scaling-measurement worker: runs the full quality pipeline at a given
parallelism and prints the warm steady-state seconds as one float line.

Invoked by bench.py under ``taskset -c 0..N-1`` so that "N cores" means N
physical CPUs for JVM *and* Python workers together — the honest sandbox
proxy for an N-core cluster (without pinning, a local[8] session borrows
idle cores for its UDF workers and the N vs 4N comparison is meaningless).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spec = sys.argv[1]
    path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # partition count of the JOB, passed by the pair driver so BOTH
    # levels of an N vs 4N pair run the identical plan (a real cluster
    # comparison scales the cluster, not the job: partitioning comes
    # from the data, so the small side must pay the same per-task
    # overheads, not 1/4 of them). 0 → legacy per-level cores*4.
    partitions = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from data_quality_automated_evaluator_spark.session import get_spark
    from data_quality_automated_evaluator_spark.pipeline.quality import run_quality_pipeline

    if spec.isdigit():
        # "8" → local[8]: one JVM, 8 task threads. Heap scales with the
        # core count (2 GB per task slot, 4 GB floor): an N vs 4N
        # cluster comparison gives the 4N side 4x the total memory — a
        # shared fixed-size heap would starve the big side's concurrent
        # tasks (4x the young-gen pressure per GB) and misattribute GC
        # stalls to coordination overhead.
        cores = int(spec)
        master = f"local[{cores}]"
        # heap scales with the task-slot count but is capped at half the
        # host's physical RAM: an uncapped 2 GB/core request asks for
        # -Xmx64g at local[32], which on a smaller host gets the JVM
        # OOM-killed or swapping under GC mid-measurement
        try:
            with open("/proc/meminfo") as f:
                total_gb = int(f.readline().split()[1]) // (1024 * 1024)
        except OSError:
            total_gb = 16
        heap = max(4, min(2 * cores, max(total_gb // 2, 4)))
        extra: dict[str, str] = {
            "spark.driver.memory": f"{heap}g",
        }
    else:
        # full master spec, e.g. local-cluster[4,4,1024]: REAL separate
        # executor JVMs (one Worker+Executor pair each) with netty
        # shuffle — the honest "N executors" shape for the north rule's
        # N→4N criterion. Executor python workers are fresh processes,
        # so the package path must travel via executorEnv.
        master = spec
        w, c, _m = spec.split("[")[1].rstrip("]").split(",")
        cores = int(w) * int(c)
        extra = {
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.abspath(__file__)
            ),
            "spark.driver.memory": "4g",
        }

    if partitions <= 0:
        partitions = max(cores * 4, 32)
    # A/B lever: the post-shuffle (conversation-window) stage gets
    # AQE-coalesced to ~core-count partitions by default; 0 keeps the
    # full fixed partition count there so the reduce stage runs the
    # same multi-wave balance as the map stage
    if os.environ.get("SPARK_GRAFT_COALESCE") == "0":
        extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
    spark = get_spark(
        app_name=f"bench-worker-{spec}",
        master=master,
        shuffle_partitions=partitions,
        extra_conf=extra,
    )
    df = spark.read.parquet(path).repartition(partitions)
    res = run_quality_pipeline(df)
    # TWO warm-up passes: the first pays JIT + Python-worker + Arrow
    # spin-up, the second still runs 10-20% slow while the worker pool
    # finishes warming — and the high-parallelism side has MORE workers
    # to warm, so a single warmup biases its per-run mean upward and
    # the N->4N efficiency downward
    res.write.format("noop").mode("overwrite").save()
    res.write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        res.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    spark.stop()
    # min for single-level steady-state probes; MEAN for concurrent
    # pair ratios (a best-of-N vs best-of-1 comparison would let the
    # side with more runs cherry-pick its luckiest minute)
    print(f"RESULT {min(times):.4f} {sum(times) / len(times):.4f}")


if __name__ == "__main__":
    main()
