"""parsy_bench_tpu — TPU-native sparse direct-solver framework.

A brand-new framework (not a port) with the capabilities of ParSy
(cheshmi/parsy_bench): sparse lower-triangular solve (CSC + supernodal BCSC)
and supernodal left-looking Cholesky factorization, designed TPU-first:

* the *symbolic* phase (elimination tree, postorder, column counts,
  fill-reducing ordering, supernode amalgamation, reach sets) runs on the
  host — vectorised NumPy with a C++ fast path — and emits a **static
  schedule** (reference: the inspector of LSparsity.h:256 `analyze_p2`);
* the *numeric* phase is a single jitted XLA computation: batched dense
  GEMM/SYRK/POTRF/TRSM panel operations sized for the 128x128 MXU, scheduled
  level-by-level with `lax.scan`, scatter/gather via precomputed static index
  arrays (reference: the executor of parallel_PB_Cholesky_05.h:27);
* multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with XLA
  collectives over ICI, replacing the reference's OpenMP shared memory.
"""

__version__ = "0.1.0"

from parsy_bench_tpu.config import SolverConfig
from parsy_bench_tpu.core.csc import CSC

__all__ = ["CSC", "SolverConfig", "__version__"]
