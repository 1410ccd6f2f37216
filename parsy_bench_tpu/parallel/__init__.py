"""Multi-device SPMD execution layer (mesh, sharded executors)."""
from parsy_bench_tpu.parallel.sharded import (
    ShardedSimplicialExecutor, ShardedSupernodalExecutor)

__all__ = ["ShardedSimplicialExecutor", "ShardedSupernodalExecutor"]
