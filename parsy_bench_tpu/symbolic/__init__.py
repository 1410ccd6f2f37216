from parsy_bench_tpu.symbolic.etree import (
    etree, postorder, tree_levels, tree_children, tree_height, subtree_sizes,
)
from parsy_bench_tpu.symbolic.colcounts import col_counts, symbolic_pattern
from parsy_bench_tpu.symbolic.reach import ereach, reach
from parsy_bench_tpu.symbolic.ordering import compute_ordering

__all__ = [
    "etree", "postorder", "tree_levels", "tree_children", "tree_height",
    "subtree_sizes", "col_counts", "symbolic_pattern", "ereach", "reach",
    "compute_ordering",
]
