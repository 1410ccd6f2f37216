from parsy_bench_tpu.core.csc import CSC
from parsy_bench_tpu.core import generate, io

__all__ = ["CSC", "generate", "io"]
