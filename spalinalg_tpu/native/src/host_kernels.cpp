// Native host-side symbolic kernels for spalinalg_tpu.
//
// The TPU framework splits every structure-changing operation into a
// host-side symbolic phase and a device-side numeric phase (SURVEY.md §7).
// The symbolic phase is pure pointer-chasing/sorting work — exactly what
// the reference implements natively in Rust — so the hot symbolic paths are
// native here too, exposed through a C ABI consumed via ctypes
// (spalinalg_tpu.native.lib). NumPy fallbacks exist for every entry point.
//
// Index type: int64 throughout (host side; device uses int32).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// compress: sort COO triplets by (major, minor), optionally merging
// duplicates (summing values) and dropping exact zeros. Mirrors
// convert/engine.compress_host. Returns the output nnz; fills ptr
// (n_major+1), out_minor, out_values (caller-allocated, size nnz_in).
// ---------------------------------------------------------------------
int64_t spal_compress(
    const int64_t* major, const int64_t* minor, const double* values,
    int64_t nnz, int64_t n_major,
    int32_t dedup, int32_t drop_zeros,
    int64_t* ptr, int64_t* out_minor, double* out_values) {
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [major, minor](int64_t a, int64_t b) {
                     if (major[a] != major[b]) return major[a] < major[b];
                     return minor[a] < minor[b];
                   });

  // Pass 1: write sorted triplets; pass 2 merges/drops in place.
  int64_t out = nnz;
  std::vector<int64_t> maj(nnz);
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t e = order[k];
    maj[k] = major[e];
    out_minor[k] = minor[e];
    out_values[k] = values[e];
  }

  int64_t w = 0;
  for (int64_t k = 0; k < out;) {
    int64_t m = maj[k], c = out_minor[k];
    double v = out_values[k];
    int64_t j = k + 1;
    if (dedup) {
      while (j < out && maj[j] == m && out_minor[j] == c) {
        v += out_values[j];
        ++j;
      }
    }
    if (!(drop_zeros && v == 0.0)) {
      maj[w] = m;
      out_minor[w] = c;
      out_values[w] = v;
      ++w;
    }
    k = j;
  }

  std::memset(ptr, 0, sizeof(int64_t) * (n_major + 1));
  for (int64_t k = 0; k < w; ++k) ptr[maj[k] + 1]++;
  for (int64_t i = 0; i < n_major; ++i) ptr[i + 1] += ptr[i];
  return w;
}

// ---------------------------------------------------------------------
// RCM ordering. adjacency = CSR structure (assumed structurally
// symmetric). Writes perm (n). Matches linalg/ordering.rcm_ordering.
// ---------------------------------------------------------------------
void spal_rcm(const int64_t* ptr, const int64_t* ind, int64_t n,
              int64_t* perm) {
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = ptr[i + 1] - ptr[i];
  std::vector<uint8_t> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int64_t> nbrs;

  auto bfs = [&](int64_t start, std::vector<int64_t>& out) {
    out.clear();
    visited[start] = 1;
    std::queue<int64_t> q;
    q.push(start);
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      out.push_back(u);
      nbrs.clear();
      for (int64_t k = ptr[u]; k < ptr[u + 1]; ++k) {
        int64_t v = ind[k];
        if (!visited[v]) nbrs.push_back(v);
      }
      std::stable_sort(nbrs.begin(), nbrs.end(),
                       [&](int64_t a, int64_t b) { return deg[a] < deg[b]; });
      for (int64_t v : nbrs)
        if (!visited[v]) {
          visited[v] = 1;
          q.push(v);
        }
    }
  };

  std::vector<int64_t> comp;
  for (int64_t s = 0; s < n; ++s) {
    if (visited[s]) continue;
    bfs(s, comp);                       // first sweep
    for (int64_t u : comp) visited[u] = 0;
    bfs(comp.back(), comp);             // restart from pseudo-periphery
    order.insert(order.end(), comp.begin(), comp.end());
  }
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// ---------------------------------------------------------------------
// Level schedule for triangular solves. Writes lev (n); returns n_levels.
// ---------------------------------------------------------------------
int64_t spal_level_schedule(const int64_t* ptr, const int64_t* ind,
                            int64_t n, int32_t lower, int64_t* lev) {
  int64_t max_lev = -1;
  if (lower) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t l = 0;
      for (int64_t k = ptr[i]; k < ptr[i + 1]; ++k)
        if (ind[k] < i && lev[ind[k]] + 1 > l) l = lev[ind[k]] + 1;
      lev[i] = l;
      if (l > max_lev) max_lev = l;
    }
  } else {
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t l = 0;
      for (int64_t k = ptr[i]; k < ptr[i + 1]; ++k)
        if (ind[k] > i && lev[ind[k]] + 1 > l) l = lev[ind[k]] + 1;
      lev[i] = l;
      if (l > max_lev) max_lev = l;
    }
  }
  return max_lev + 1;
}

// ---------------------------------------------------------------------
// SpGEMM symbolic phase: expand product terms of C = A·B (both CSR),
// sort by output coordinate, group into unique slots. Two-call protocol:
// first call with out_* null pointers returns the term count; second call
// fills a_idx/b_idx/gid (size n_terms) + out_rowptr (nrows_a+1) +
// out_colind (>= n_out) and returns n_out.
// ---------------------------------------------------------------------
int64_t spal_spgemm_symbolic(
    const int64_t* aptr, const int64_t* acol, int64_t nrows_a,
    const int64_t* bptr, const int64_t* bcol, int64_t ncols_b,
    int64_t* a_idx, int64_t* b_idx, int64_t* gid,
    int64_t* out_rowptr, int64_t* out_colind) {
  // term count
  int64_t total = 0;
  for (int64_t e = 0; e < aptr[nrows_a]; ++e) {
    int64_t k = acol[e];
    total += bptr[k + 1] - bptr[k];
  }
  if (a_idx == nullptr) return total;

  struct Term {
    int64_t row, col, ai, bi;
  };
  std::vector<Term> terms;
  terms.reserve(total);
  for (int64_t i = 0; i < nrows_a; ++i)
    for (int64_t e = aptr[i]; e < aptr[i + 1]; ++e) {
      int64_t k = acol[e];
      for (int64_t f = bptr[k]; f < bptr[k + 1]; ++f)
        terms.push_back({i, bcol[f], e, f});
    }
  std::stable_sort(terms.begin(), terms.end(),
                   [](const Term& a, const Term& b) {
                     if (a.row != b.row) return a.row < b.row;
                     return a.col < b.col;
                   });
  int64_t n_out = 0;
  std::memset(out_rowptr, 0, sizeof(int64_t) * (nrows_a + 1));
  for (int64_t t = 0; t < total; ++t) {
    if (t == 0 || terms[t].row != terms[t - 1].row ||
        terms[t].col != terms[t - 1].col) {
      out_colind[n_out] = terms[t].col;
      out_rowptr[terms[t].row + 1]++;
      ++n_out;
    }
    a_idx[t] = terms[t].ai;
    b_idx[t] = terms[t].bi;
    gid[t] = n_out - 1;
  }
  for (int64_t i = 0; i < nrows_a; ++i) out_rowptr[i + 1] += out_rowptr[i];
  (void)ncols_b;
  return n_out;
}

}  // extern "C"
