// Native ELL-pattern / scatter-map builder.
//
// Replaces the numpy path in topology.build_pattern for large meshes: instead
// of two global sorts of E*edof^2 keys (np.unique + np.argsort), this does a
// counting sort by row (two linear passes) followed by tiny per-row sorts --
// O(n) for the bulk of the work.  Exposed through ctypes (see loader.py).
//
// Reference behaviour being accelerated: the sparsity pattern the reference
// builds per-row on the host in pure Python (stiffnessMtrx.py:79-107).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <new>
#include <utility>
#include <vector>

namespace {

struct Pattern {
  int64_t n_contrib = 0;
  int64_t n_dof = 0;
  int64_t nnz = 0;
  int32_t width = 0;
  // bucketed by row, each row's slice sorted by (col, original index)
  std::vector<int32_t> col_b;   // column of each contribution
  std::vector<int32_t> idx_b;   // original contribution index
  std::vector<int64_t> offsets; // row -> bucket start (n_dof + 1)
  std::vector<int32_t> row_counts; // unique columns per row
};

}  // namespace

extern "C" {

void* pattern_build(const int32_t* elements, int64_t n_ele, int32_t npe,
                    int32_t dm, int64_t n_dof) {
  const int32_t edof = npe * dm;
  auto* p = new (std::nothrow) Pattern();
  if (!p) return nullptr;
  p->n_dof = n_dof;
  p->n_contrib = n_ele * (int64_t)edof * edof;

  // global dof of each (element, local dof)
  std::vector<int32_t> gdof((size_t)n_ele * edof);
  for (int64_t e = 0; e < n_ele; ++e) {
    const int32_t* conn = elements + e * npe;
    int32_t* out = gdof.data() + e * edof;
    for (int32_t a = 0; a < npe; ++a)
      for (int32_t d = 0; d < dm; ++d) out[a * dm + d] = conn[a] * dm + d;
  }

  // pass 1: count contributions per row
  p->offsets.assign(n_dof + 1, 0);
  for (int64_t e = 0; e < n_ele; ++e) {
    const int32_t* rd = gdof.data() + e * edof;
    for (int32_t i = 0; i < edof; ++i) p->offsets[rd[i] + 1] += edof;
  }
  for (int64_t r = 0; r < n_dof; ++r) p->offsets[r + 1] += p->offsets[r];

  // pass 2: bucket (col, original index) by row
  p->col_b.resize(p->n_contrib);
  p->idx_b.resize(p->n_contrib);
  {
    std::vector<int64_t> cursor(p->offsets.begin(), p->offsets.end() - 1);
    for (int64_t e = 0; e < n_ele; ++e) {
      const int32_t* rd = gdof.data() + e * edof;
      const int64_t base = e * (int64_t)edof * edof;
      for (int32_t i = 0; i < edof; ++i) {
        int64_t& c = cursor[rd[i]];
        const int64_t orig0 = base + (int64_t)i * edof;
        for (int32_t j = 0; j < edof; ++j) {
          p->col_b[c] = rd[j];
          p->idx_b[c] = (int32_t)(orig0 + j);
          ++c;
        }
      }
    }
  }

  // per-row: sort slice by (col, original index); count unique cols
  p->row_counts.assign(n_dof, 0);
  std::vector<std::pair<int32_t, int32_t>> tmp;
  int32_t width = 0;
  for (int64_t r = 0; r < n_dof; ++r) {
    const int64_t lo = p->offsets[r], hi = p->offsets[r + 1];
    tmp.resize(hi - lo);
    for (int64_t k = lo; k < hi; ++k)
      tmp[k - lo] = {p->col_b[k], p->idx_b[k]};
    std::sort(tmp.begin(), tmp.end());
    int32_t uniq = 0;
    int32_t prev = -1;
    for (size_t k = 0; k < tmp.size(); ++k) {
      p->col_b[lo + k] = tmp[k].first;
      p->idx_b[lo + k] = tmp[k].second;
      if (tmp[k].first != prev) {
        ++uniq;
        prev = tmp[k].first;
      }
    }
    p->row_counts[r] = uniq;
    width = std::max(width, uniq);
    p->nnz += uniq;
  }
  p->width = width;
  return p;
}

int64_t pattern_nnz(void* h) { return static_cast<Pattern*>(h)->nnz; }
int32_t pattern_width(void* h) { return static_cast<Pattern*>(h)->width; }
int64_t pattern_n_contrib(void* h) { return static_cast<Pattern*>(h)->n_contrib; }

// Fill caller-allocated buffers:
//   targets: [n_contrib] int32 -- flat slot of each contribution, in the
//            original (element-stiffness layout) order
//   colidx: [n_dof*width] int32 (zero-padded), row_counts: [n_dof] int32
//   diag_slot: [n_dof] int64
//   csr_indices: [nnz] int32, csr_slots: [nnz] int64, csr_indptr: [n_dof+1] int64
// Returns 0 on success, nonzero if a row is missing its diagonal.
int32_t pattern_export(void* h, int32_t* targets,
                       int32_t* colidx, int32_t* row_counts, int64_t* diag_slot,
                       int32_t* csr_indices, int64_t* csr_slots,
                       int64_t* csr_indptr) {
  Pattern* p = static_cast<Pattern*>(h);
  const int64_t n_dof = p->n_dof;
  const int32_t width = p->width;
  std::memset(colidx, 0, sizeof(int32_t) * (size_t)n_dof * width);
  std::memcpy(row_counts, p->row_counts.data(), sizeof(int32_t) * n_dof);

  int32_t status = 0;
  int64_t csr_pos = 0;
  csr_indptr[0] = 0;
  for (int64_t r = 0; r < n_dof; ++r) {
    const int64_t lo = p->offsets[r], hi = p->offsets[r + 1];
    int32_t pos = -1;
    int32_t prev = -1;
    int64_t diag = -1;
    for (int64_t k = lo; k < hi; ++k) {
      const int32_t col = p->col_b[k];
      if (col != prev) {
        ++pos;
        prev = col;
        colidx[r * width + pos] = col;
        csr_indices[csr_pos] = col;
        csr_slots[csr_pos] = r * (int64_t)width + pos;
        ++csr_pos;
        if (col == (int32_t)r) diag = r * (int64_t)width + pos;
      }
      targets[p->idx_b[k]] = (int32_t)(r * (int64_t)width + pos);
    }
    if (diag < 0) status = 1;
    diag_slot[r] = diag;
    csr_indptr[r + 1] = csr_pos;
  }
  return status;
}

// Optional second export for the Pallas tiled segment-sum kernel:
//   perm_sorted: [n_contrib] int32 -- original contribution index of each
//                entry in (row, col)-sorted order
//   csr_counts: [nnz] int32 -- contributions per unique (row, col) entry
void pattern_export_sorted(void* h, int32_t* perm_sorted, int32_t* csr_counts) {
  Pattern* p = static_cast<Pattern*>(h);
  std::memcpy(perm_sorted, p->idx_b.data(), sizeof(int32_t) * p->n_contrib);
  int64_t csr_pos = -1;
  for (int64_t r = 0; r < p->n_dof; ++r) {
    const int64_t lo = p->offsets[r], hi = p->offsets[r + 1];
    int32_t prev = -1;
    for (int64_t k = lo; k < hi; ++k) {
      const int32_t col = p->col_b[k];
      if (col != prev) {
        prev = col;
        csr_counts[++csr_pos] = 0;
      }
      ++csr_counts[csr_pos];
    }
  }
}

void pattern_free(void* h) { delete static_cast<Pattern*>(h); }

}  // extern "C"
