"""Multi-device SPMD execution layer.

* :class:`DistExecutor` — the ownership-partitioned distributed tier
  (per-device pools, boundary-only ragged-psum exchange; SURVEY §7E);
* :class:`ShardedSupernodalExecutor` / :class:`ShardedSimplicialExecutor`
  — the simpler update-stream-sharded tier (replicated pools).
"""
from parsy_bench_tpu.parallel.dist import DistExecutor
from parsy_bench_tpu.parallel.sharded import (
    ShardedSimplicialExecutor, ShardedSupernodalExecutor)

__all__ = ["DistExecutor", "ShardedSimplicialExecutor",
           "ShardedSupernodalExecutor"]
