"""Driver-thread job overlap for independent eager materializations.

Spark's scheduler is thread-safe and interleaves concurrently-submitted
jobs' stages; with FIFO scheduling, idle cores from one job's
coordination gaps run the other job's tasks. This attacks the serial
coordination floor quantified by the Amdahl fit in BENCH.md (~120 s at
37M facts) without changing any plan: each thunk's DAG is exactly what
the serial code built. Used by the PARIS iteration checkpoints
(paris.py), the two-KG pair build (pipeline.py / __spark_entry__), and
the node/predicate dict-encodes inside one KG build (kgbuild.py).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor


def materialize_concurrently(*thunks):
    """Run independent eager-materialization thunks (localCheckpoint /
    persist-count) as CONCURRENT Spark jobs from driver threads.

    ``PRASE_SERIAL_CHECKPOINTS=1`` falls back to sequential execution
    (A/B lever; also the escape hatch if a cluster's scheduler pools are
    configured to starve concurrent jobs)."""
    if len(thunks) == 1 or os.environ.get("PRASE_SERIAL_CHECKPOINTS") == "1":
        return tuple(t() for t in thunks)
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)
