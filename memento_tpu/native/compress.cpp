// Native unique-value compression kernel (C8 in SURVEY.md).
//
// Packs each gene's (expression value, size-factor bin) combinations into
// padded tiles for the device bootstrap — the host-side hot op of the
// framework.  Equivalent semantics to the numpy path in
// memento_tpu/ops/compress.py (its tests are the oracle for this code);
// the reference's per-gene np.unique random-hash version is at
// /root/reference/memento/bootstrap.py:40-71.
//
// Layout contract (mirrors CompressedGroup):
//   slots [0, n_z)           : zero-expression combos, one per populated bin
//   slots [n_z, n_z + n_nz)  : nonzero (value, bin) combos, code-sorted
//   slots beyond             : padding (counts 0, inv_sf 1)
//
// Parallelized over genes with OpenMP; each gene's work is a sort +
// run-length encoding of its nonzeros, O(nnz_g log nnz_g).

#include <algorithm>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// First pass: number of unique combos per gene (zeros-bins + nonzero codes).
void count_unique(int64_t n_cells, int64_t n_genes, int32_t nbins,
                  const int64_t* indptr, const int64_t* indices,
                  const int64_t* data, const int32_t* bins,
                  int32_t* n_unique) {
  // global bin occupancy
  std::vector<int64_t> bin_total(nbins, 0);
  for (int64_t c = 0; c < n_cells; ++c) bin_total[bins[c]]++;

#pragma omp parallel
  {
    std::vector<int64_t> codes;
    std::vector<int64_t> nz_bin(nbins);
#pragma omp for schedule(dynamic, 64)
    for (int64_t g = 0; g < n_genes; ++g) {
      const int64_t lo = indptr[g], hi = indptr[g + 1];
      codes.clear();
      codes.reserve(hi - lo);
      std::fill(nz_bin.begin(), nz_bin.end(), 0);
      for (int64_t k = lo; k < hi; ++k) {
        const int32_t b = bins[indices[k]];
        nz_bin[b]++;
        codes.push_back(data[k] * nbins + b);
      }
      std::sort(codes.begin(), codes.end());
      int64_t uniq = 0;
      for (size_t i = 0; i < codes.size(); ++i)
        if (i == 0 || codes[i] != codes[i - 1]) uniq++;
      int64_t zbins = 0;
      for (int32_t b = 0; b < nbins; ++b)
        if (bin_total[b] - nz_bin[b] > 0) zbins++;
      n_unique[g] = static_cast<int32_t>(uniq + zbins);
    }
  }
}

// Second pass: pack values/counts/inv_sf into padded [n_genes, u_max] tiles.
void pack_unique(int64_t n_cells, int64_t n_genes, int32_t nbins,
                 int64_t u_max, const int64_t* indptr, const int64_t* indices,
                 const int64_t* data, const int32_t* bins,
                 const double* bin_values, float* values, float* counts,
                 float* inv_sf) {
  std::vector<int64_t> bin_total(nbins, 0);
  for (int64_t c = 0; c < n_cells; ++c) bin_total[bins[c]]++;

#pragma omp parallel
  {
    std::vector<int64_t> codes;
    std::vector<int64_t> nz_bin(nbins);
#pragma omp for schedule(dynamic, 64)
    for (int64_t g = 0; g < n_genes; ++g) {
      const int64_t lo = indptr[g], hi = indptr[g + 1];
      codes.clear();
      codes.reserve(hi - lo);
      std::fill(nz_bin.begin(), nz_bin.end(), 0);
      for (int64_t k = lo; k < hi; ++k) {
        const int32_t b = bins[indices[k]];
        nz_bin[b]++;
        codes.push_back(data[k] * nbins + b);
      }
      std::sort(codes.begin(), codes.end());

      float* vrow = values + g * u_max;
      float* crow = counts + g * u_max;
      float* srow = inv_sf + g * u_max;
      int64_t slot = 0;
      // zero-expression combos
      for (int32_t b = 0; b < nbins; ++b) {
        const int64_t z = bin_total[b] - nz_bin[b];
        if (z > 0) {
          vrow[slot] = 0.0f;
          crow[slot] = static_cast<float>(z);
          srow[slot] = static_cast<float>(1.0 / bin_values[b]);
          slot++;
        }
      }
      // nonzero combos: run-length encode sorted codes
      size_t i = 0;
      while (i < codes.size()) {
        size_t j = i;
        while (j < codes.size() && codes[j] == codes[i]) j++;
        const int64_t code = codes[i];
        vrow[slot] = static_cast<float>(code / nbins);
        crow[slot] = static_cast<float>(j - i);
        srow[slot] = static_cast<float>(1.0 / bin_values[code % nbins]);
        slot++;
        i = j;
      }
      // padding slots already initialized by the caller (counts 0, inv_sf 1)
    }
  }
}

}  // extern "C"
