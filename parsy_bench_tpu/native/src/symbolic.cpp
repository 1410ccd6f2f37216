// Native host-side symbolic kernels for parsy_bench_tpu.
//
// These are the irregular pointer-chasing graph algorithms of the inspector
// (elimination tree, postorder, column counts, row-subtree pattern, tree
// passes).  The reference keeps its whole inspector in C++
// (cholesky/Etree.h, common/PostOrder.h, common/ColumnCount.h,
// common/TreeUtils.h); this library is the equivalent fast path.  The NumPy
// implementations in parsy_bench_tpu.symbolic are the specification — every
// function here must match them bit-for-bit (tests/test_native.py enforces
// this).
//
// Flat C ABI, loaded via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Elimination tree of an SPD matrix, given row-wise access to the lower
// half (== CSC of the upper half): column i of (indptr, indices) holds the
// entries j <= i of row i.  Liu's algorithm with path compression.
// (spec: parsy_bench_tpu/symbolic/etree.py::etree; reference analogue:
// cholesky/Etree.h:56 etreeC)
void pbt_etree(int64_t n, const int64_t* indptr, const int32_t* indices,
               int32_t* parent) {
  std::vector<int32_t> ancestor(n, -1);
  for (int64_t i = 0; i < n; ++i) parent[i] = -1;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      while (j != -1 && j < i) {
        int32_t nxt = ancestor[j];
        ancestor[j] = (int32_t)i;
        if (nxt == -1) parent[j] = (int32_t)i;
        j = nxt;
      }
    }
  }
}

// Postorder from CSR-style children lists; children/roots already ordered.
// (spec: etree.py::postorder; reference: common/PostOrder.h:11)
void pbt_postorder(int64_t n, const int64_t* childptr, const int32_t* children,
                   const int32_t* roots, int64_t nroots, int32_t* post) {
  std::vector<int64_t> cursor(n);
  std::vector<int32_t> stack(n + 1);
  for (int64_t v = 0; v < n; ++v) cursor[v] = childptr[v];
  int64_t k = 0;
  for (int64_t r = 0; r < nroots; ++r) {
    int64_t top = 0;
    stack[0] = roots[r];
    while (top >= 0) {
      int32_t v = stack[top];
      if (cursor[v] < childptr[v + 1]) {
        stack[++top] = children[cursor[v]++];
      } else {
        post[k++] = v;
        --top;
      }
    }
  }
}

// out[parent[j]] += out[j], ascending j (parent[j] > j invariant).
// (spec: etree.py::subtree_accumulate; reference: common/TreeUtils.h:103)
void pbt_subtree_accumulate(int64_t n, const int32_t* parent, double* out) {
  for (int64_t j = 0; j < n; ++j)
    if (parent[j] >= 0) out[parent[j]] += out[j];
}

// depth[j] = depth[parent[j]] + 1, descending j.
// (spec: etree.py::tree_depths; reference: common/TreeUtils.h:58)
void pbt_tree_depths(int64_t n, const int32_t* parent, int64_t* depth) {
  for (int64_t j = n - 1; j >= 0; --j)
    depth[j] = parent[j] >= 0 ? depth[parent[j]] + 1 : 0;
}

// Wavefront level: lev[p] = max(lev[p], lev[j]+1) ascending j.
// (spec: etree.py::tree_levels; reference level sets: TreeUtils.h:119)
void pbt_tree_wavefront(int64_t n, const int32_t* parent, int64_t* lev) {
  for (int64_t j = 0; j < n; ++j) lev[j] = 0;
  for (int64_t j = 0; j < n; ++j) {
    int32_t p = parent[j];
    if (p >= 0 && lev[j] + 1 > lev[p]) lev[p] = lev[j] + 1;
  }
}

// Column counts of L (diagonal included) by row-subtree marking.
// (spec: colcounts.py::col_counts; reference: common/ColumnCount.h:141)
void pbt_col_counts(int64_t n, const int64_t* indptr, const int32_t* indices,
                    const int32_t* parent, int64_t* cc) {
  std::vector<int64_t> mark(n, -1);
  for (int64_t j = 0; j < n; ++j) cc[j] = 1;
  for (int64_t i = 0; i < n; ++i) {
    mark[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      while (j != -1 && mark[j] != i) {
        ++cc[j];
        mark[j] = i;
        j = parent[j];
      }
    }
  }
}

// Row-wise pattern of L (CSR with column indices), diagonal included, by the
// same row-subtree walk.  Two-pass: caller first obtains sizes via
// pbt_col_counts -> sum, then provides rind of that size.  rptr has n+1
// entries.  Row i's entries are emitted in walk order (caller sorts when
// converting to CSC).  (spec: colcounts.py::symbolic_pattern; reference:
// cholesky/Inspection_BlockC.h:684-752 Ls construction)
void pbt_symbolic_pattern(int64_t n, const int64_t* indptr,
                          const int32_t* indices, const int32_t* parent,
                          int64_t* rptr, int32_t* rind) {
  std::vector<int64_t> mark(n, -1);
  int64_t cnt = 0;
  rptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    mark[i] = i;
    rind[cnt++] = (int32_t)i;  // diagonal
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      while (j != -1 && mark[j] != i) {
        rind[cnt++] = j;
        mark[j] = i;
        j = parent[j];
      }
    }
    rptr[i + 1] = cnt;
  }
}

// ereach_sn: supernodal row pattern for one supernode block [col1, col2):
// the set of descendant supernodes whose columns update this block, i.e.
// the supernodes hit on etree paths from A-pattern entries of rows
// col1..col2-1 up to (below) col1.  Returns count; out gets ascending
// supernode ids.  marked is a caller scratch of sNo ints initialized once
// to -1 (stamped with col1).  (reference: common/Reach.h:112 ereach_sn)
int64_t pbt_ereach_sn(int64_t col1, int64_t col2, const int64_t* aptr,
                      const int32_t* aind, const int32_t* col2sup,
                      const int32_t* sparent, int64_t* marked, int32_t* out,
                      int32_t* stack) {
  int64_t top = 0;
  int64_t cnt = 0;
  int32_t cur_sn = col2sup[col1];
  for (int64_t col = col1; col < col2; ++col) {
    for (int64_t p = aptr[col]; p < aptr[col + 1]; ++p) {
      int32_t r = aind[p];
      if (r >= col1) continue;  // inside/below the block: not a descendant
      int32_t s = col2sup[r];
      int64_t depth = 0;
      while (s != -1 && s < cur_sn && marked[s] != col1) {
        stack[depth++] = s;
        marked[s] = col1;
        s = sparent[s];
      }
      for (int64_t k = 0; k < depth; ++k) out[cnt++] = stack[k];
    }
  }
  (void)top;
  return cnt;
}

// Longest-path level of each node in the DAG of a lower-triangular pattern
// (edge j -> i for every off-diagonal entry i of column j).  Caller zeroes
// lev.  Used for level-set trisolve scheduling of general (non-chordal) L.
// (reference: triangularSolve/Inspection_Level.h:12 buildLevelSet_CSC)
void pbt_dag_levels(int64_t n, const int64_t* lptr, const int32_t* lind,
                    int64_t* lev) {
  for (int64_t j = 0; j < n; ++j) {
    int64_t lj = lev[j] + 1;
    for (int64_t p = lptr[j]; p < lptr[j + 1]; ++p) {
      int32_t i = lind[p];
      if (i != j && lev[i] < lj) lev[i] = lj;
    }
  }
}

// Left-looking update triples for simplicial Cholesky.  For each source
// column k with off-diagonal rows o_0 < ... < o_{m-1}, and each ordered pair
// (jj <= ii), emit the rank-1 update  L[o_ii, o_jj] -= L[o_ii,k]*L[o_jj,k]:
//   srca = position of (o_ii, k), srcb = position of (o_jj, k),
//   dst  = position of (o_ii, o_jj)  in the L value array.
// Emission is in source-column order; per-column counts are m(m+1)/2 so the
// caller sizes the outputs from column counts and regroups by level.
// dst exists because the factor pattern is closed (Liu).  Binary search
// locates dst inside the target column.
// (spec: symbolic/plan.py::_updates_numpy; reference executor analogue:
// cholesky/sereial_Cholesky_01.h:13 cholesky_left_01's inner loop)
void pbt_cholesky_updates(int64_t n, const int64_t* lptr, const int32_t* lind,
                          int32_t* srca, int32_t* srcb, int32_t* dst) {
  int64_t c = 0;
  for (int64_t k = 0; k < n; ++k) {
    int64_t base = lptr[k];
    int64_t m = lptr[k + 1] - base - 1;  // off-diagonal count
    for (int64_t jj = 0; jj < m; ++jj) {
      int32_t j = lind[base + 1 + jj];  // target column
      const int32_t* cb = lind + lptr[j];
      const int32_t* ce = lind + lptr[j + 1];
      for (int64_t ii = jj; ii < m; ++ii) {
        int32_t i = lind[base + 1 + ii];  // target row
        // lower_bound: pattern closure guarantees presence
        const int32_t* it = cb;
        int64_t len = ce - cb;
        while (len > 1) {
          int64_t half = len / 2;
          if (it[half] <= i) { it += half; len -= half; }
          else len = half;
        }
        srca[c] = (int32_t)(base + 1 + ii);
        srcb[c] = (int32_t)(base + 1 + jj);
        dst[c] = (int32_t)(lptr[j] + (it - (lind + lptr[j])));
        ++c;
      }
    }
  }
}

}  // extern "C"
