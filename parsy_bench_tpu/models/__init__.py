from parsy_bench_tpu.models.solver import CholeskySolver, TriangularSolver

__all__ = ["CholeskySolver", "TriangularSolver"]
