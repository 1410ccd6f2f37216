from parsy_bench_tpu.ops.simplicial import SimplicialExecutor

__all__ = ["SimplicialExecutor"]
