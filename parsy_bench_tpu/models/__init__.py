from parsy_bench_tpu.models.solver import (CholeskySolver,
                                           NotPositiveDefiniteError,
                                           TriangularSolver)

__all__ = ["CholeskySolver", "NotPositiveDefiniteError", "TriangularSolver"]
