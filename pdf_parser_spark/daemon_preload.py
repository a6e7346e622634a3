"""Python-worker daemon with the Arrow stack preloaded before the fork.

PySpark's worker daemon (``pyspark.daemon``) forks one process per
worker; each fork then imports pandas/numpy/pyarrow on its first Arrow
UDF batch.  That import is kernel-heavy (mmap/page-fault bound): on
this sandbox's microVM kernel it measures 3-7 s *system* time per
worker, so a 32-thread executor pays minutes of aggregate startup —
and on a real 1000-executor cluster it is per-worker cold-start that
recurs on every executor allocation.

Importing the heavy modules HERE — in the daemon, before any fork —
lets every worker inherit the already-initialized modules through
copy-on-write for free.  Safe to preload: pandas/numpy/pyarrow start
no threads at import time (fork-safety would break with live
threads), which is why this classic preload trick is limited to the
import, not e.g. opening Arrow memory pools.

Wired via ``spark.python.daemon.module`` (session.get_spark); disable
with SPARK_GRAFT_PRELOAD=0 if a future dependency added here turns out
to start threads at import.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
