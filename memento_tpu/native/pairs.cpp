// Native joint unique-value compression for gene pairs (2D bootstrap path).
//
// The differential-correlation test compresses each pair's joint
// (x1, x2, size-factor bin) combinations over the union of the two genes'
// nonzero cells (ref /root/reference/memento/bootstrap.py:119-157 applies
// _unique_expr to two-column slices).  The numpy path in
// memento_tpu/ops/compress.py (its tests are the oracle for this code)
// concatenates and lexsorts every pair's nonzeros at once — O(total_nnz log)
// with several full-size temporaries, which dominated the whole 2D test on
// the 2-core host.  Here each pair is one independent merge of two sorted
// CSC columns plus a sort of its ~|union| codes, OpenMP over pairs.
//
// Layout contract (mirrors CompressedPairGroup):
//   slots [0, n_z)           : zero-zero combos, one per populated sf bin
//   slots [n_z, n_z + n_nz)  : nonzero (x1, x2, bin) combos, code-sorted
//   slots beyond             : padding (counts 0, inv_sf 1)

#include <algorithm>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Merge the two sorted columns of pair p into per-union-row codes
// (x1 * (v2max+1) + x2) * nbins + bin, and tally per-bin union occupancy.
// Returns the number of union rows.
int64_t merge_pair_codes(const int64_t* indptr, const int64_t* indices,
                         const int64_t* data, const int32_t* bins,
                         int32_t nbins, int64_t a, int64_t b,
                         std::vector<int32_t>& x1, std::vector<int32_t>& x2,
                         std::vector<int32_t>& ub,
                         std::vector<int64_t>& nz_bin) {
  x1.clear();
  x2.clear();
  ub.clear();
  std::fill(nz_bin.begin(), nz_bin.end(), 0);
  int64_t ka = indptr[a], ea = indptr[a + 1];
  int64_t kb = indptr[b], eb = indptr[b + 1];
  if (a == b) {
    for (; ka < ea; ++ka) {
      const int32_t bin = bins[indices[ka]];
      x1.push_back(static_cast<int32_t>(data[ka]));
      x2.push_back(static_cast<int32_t>(data[ka]));
      ub.push_back(bin);
      nz_bin[bin]++;
    }
    return static_cast<int64_t>(x1.size());
  }
  while (ka < ea || kb < eb) {
    int64_t ra = ka < ea ? indices[ka] : INT64_MAX;
    int64_t rb = kb < eb ? indices[kb] : INT64_MAX;
    int32_t v1 = 0, v2 = 0;
    int64_t row;
    if (ra < rb) {
      v1 = static_cast<int32_t>(data[ka]);
      row = ra;
      ++ka;
    } else if (rb < ra) {
      v2 = static_cast<int32_t>(data[kb]);
      row = rb;
      ++kb;
    } else {
      v1 = static_cast<int32_t>(data[ka]);
      v2 = static_cast<int32_t>(data[kb]);
      row = ra;
      ++ka;
      ++kb;
    }
    const int32_t bin = bins[row];
    x1.push_back(v1);
    x2.push_back(v2);
    ub.push_back(bin);
    nz_bin[bin]++;
  }
  return static_cast<int64_t>(x1.size());
}

// Sorted codes of the union entries; `codes` is reused scratch.
void build_codes(const std::vector<int32_t>& x1, const std::vector<int32_t>& x2,
                 const std::vector<int32_t>& ub, int32_t nbins,
                 std::vector<int64_t>& codes, int64_t* v2cap_out) {
  int32_t v2max = 0;
  for (int32_t v : x2)
    if (v > v2max) v2max = v;
  const int64_t v2cap = static_cast<int64_t>(v2max) + 1;
  codes.resize(x1.size());
  for (size_t i = 0; i < x1.size(); ++i)
    codes[i] =
        (static_cast<int64_t>(x1[i]) * v2cap + x2[i]) * nbins + ub[i];
  std::sort(codes.begin(), codes.end());
  *v2cap_out = v2cap;
}

}  // namespace

extern "C" {

// First pass: number of unique joint combos per pair (zero-zero bins +
// distinct nonzero codes), to size the padded output tiles.
void count_unique_pairs(int64_t n_cells, int64_t n_pairs, int32_t nbins,
                        const int64_t* indptr, const int64_t* indices,
                        const int64_t* data, const int32_t* bins,
                        const int64_t* idx1, const int64_t* idx2,
                        int32_t* n_unique) {
  std::vector<int64_t> bin_total(nbins, 0);
  for (int64_t c = 0; c < n_cells; ++c) bin_total[bins[c]]++;

#pragma omp parallel
  {
    std::vector<int32_t> x1, x2, ub;
    std::vector<int64_t> codes, nz_bin(nbins);
#pragma omp for schedule(dynamic, 16)
    for (int64_t p = 0; p < n_pairs; ++p) {
      merge_pair_codes(indptr, indices, data, bins, nbins, idx1[p], idx2[p],
                       x1, x2, ub, nz_bin);
      int64_t v2cap;
      build_codes(x1, x2, ub, nbins, codes, &v2cap);
      int64_t n_nz = 0;
      for (size_t i = 0; i < codes.size(); ++i)
        if (i == 0 || codes[i] != codes[i - 1]) n_nz++;
      int64_t zbins = 0;
      for (int32_t b = 0; b < nbins; ++b)
        if (bin_total[b] - nz_bin[b] > 0) zbins++;
      n_unique[p] = static_cast<int32_t>(n_nz + zbins);
    }
  }
}

// Second pass: pack into padded [n_pairs, u_max] tiles.  sf_bin (optional,
// may be null): uint8 compact-transport ids, 0 = padding, 1+b = sf bin b.
void pack_unique_pairs_bins(int64_t n_cells, int64_t n_pairs, int32_t nbins,
                            int64_t u_max, const int64_t* indptr,
                            const int64_t* indices, const int64_t* data,
                            const int32_t* bins, const double* bin_values,
                            const int64_t* idx1, const int64_t* idx2,
                            float* values_1, float* values_2, float* counts,
                            float* inv_sf, uint8_t* sf_bin) {
  std::vector<int64_t> bin_total(nbins, 0);
  for (int64_t c = 0; c < n_cells; ++c) bin_total[bins[c]]++;

#pragma omp parallel
  {
    std::vector<int32_t> x1, x2, ub;
    std::vector<int64_t> codes, nz_bin(nbins);
#pragma omp for schedule(dynamic, 16)
    for (int64_t p = 0; p < n_pairs; ++p) {
      merge_pair_codes(indptr, indices, data, bins, nbins, idx1[p], idx2[p],
                       x1, x2, ub, nz_bin);
      int64_t v2cap;
      build_codes(x1, x2, ub, nbins, codes, &v2cap);

      float* v1row = values_1 + p * u_max;
      float* v2row = values_2 + p * u_max;
      float* crow = counts + p * u_max;
      float* srow = inv_sf + p * u_max;
      uint8_t* brow = sf_bin ? sf_bin + p * u_max : nullptr;
      int64_t slot = 0;
      for (int32_t b = 0; b < nbins; ++b) {
        const int64_t z = bin_total[b] - nz_bin[b];
        if (z > 0) {
          v1row[slot] = 0.0f;
          v2row[slot] = 0.0f;
          crow[slot] = static_cast<float>(z);
          srow[slot] = static_cast<float>(1.0 / bin_values[b]);
          if (brow) brow[slot] = static_cast<uint8_t>(b + 1);
          slot++;
        }
      }
      for (size_t i = 0; i < codes.size();) {
        size_t j = i;
        while (j < codes.size() && codes[j] == codes[i]) ++j;
        const int64_t code = codes[i];
        const int32_t b = static_cast<int32_t>(code % nbins);
        const int64_t xy = code / nbins;
        v1row[slot] = static_cast<float>(xy / v2cap);
        v2row[slot] = static_cast<float>(xy % v2cap);
        crow[slot] = static_cast<float>(j - i);
        srow[slot] = static_cast<float>(1.0 / bin_values[b]);
        if (brow) brow[slot] = static_cast<uint8_t>(b + 1);
        slot++;
        i = j;
      }
      // padding slots already initialized by the caller (counts 0, inv_sf 1)
    }
  }
}

}  // extern "C"
