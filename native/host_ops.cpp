// Native host-side metric kernels for dvae_tpu.
//
// The reference framework's only native code is inside PyTorch itself
// (SURVEY.md §0); its own consensus path is per-sample python loops
// (mmidas/cpl_mixvae.py:802-818).  Host-side metric work in this framework
// (checkpoint-epoch consensus over full datasets, cross-run studies over
// many (A, N) label arrays) runs through these C++ kernels via ctypes —
// single pass, cache-friendly, no temporary one-hot matrices.
//
// Build: make -C native   (g++ -O3 -shared -fPIC host_ops.cpp)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// K×K co-occurrence matrix of two integer label vectors.
// out must hold K*K doubles (zeroed here).
void confmat(const int64_t* l1, const int64_t* l2, int64_t n, int64_t K,
             double* out) {
  std::memset(out, 0, sizeof(double) * K * K);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t a = l1[i], b = l2[i];
    if (a >= 0 && a < K && b >= 0 && b < K) out[a * K + b] += 1.0;
  }
}

// Normalize a confusion matrix in place: column j divided by
// max(row_j sum, col_j sum); 0 where the max is 0
// (semantics of mmidas/_utils.py:96-98).
void confmat_normalize_inplace(double* cm, int64_t K) {
  std::vector<double> row(K, 0.0), col(K, 0.0);
  for (int64_t i = 0; i < K; ++i)
    for (int64_t j = 0; j < K; ++j) {
      row[i] += cm[i * K + j];
      col[j] += cm[i * K + j];
    }
  for (int64_t j = 0; j < K; ++j) {
    const double m = std::max(row[j], col[j]);
    if (m == 0.0) {
      for (int64_t i = 0; i < K; ++i) cm[i * K + j] = 0.0;
    } else {
      for (int64_t i = 0; i < K; ++i) cm[i * K + j] /= m;
    }
  }
}

// Mean pairwise consensus of (A, N) labels: for every arm pair build the
// confusion matrix, normalize, take the mean diagonal; writes the (A, A)
// score matrix (diagonal = 1) and returns the mean over the upper triangle.
double pairwise_consensus(const int64_t* labels, int64_t A, int64_t N,
                          int64_t K, double* out_scores) {
  std::vector<double> cm(K * K);
  double total = 0.0;
  int64_t n_pairs = 0;
  for (int64_t a = 0; a < A; ++a) {
    out_scores[a * A + a] = 1.0;
    for (int64_t b = a + 1; b < A; ++b) {
      confmat(labels + a * N, labels + b * N, N, K, cm.data());
      confmat_normalize_inplace(cm.data(), K);
      double diag = 0.0;
      for (int64_t k = 0; k < K; ++k) diag += cm[k * K + k];
      const double score = diag / static_cast<double>(K);
      out_scores[a * A + b] = out_scores[b * A + a] = score;
      total += score;
      ++n_pairs;
    }
  }
  return n_pairs ? total / static_cast<double>(n_pairs) : 1.0;
}

// Per-category agreement: mean over arm pairs of the normalized-confmat
// diagonal (the pruning criterion, build/lib/mmidas/cpl_mixvae.py:355-391).
// out must hold K doubles.
void per_category_agreement(const int64_t* labels, int64_t A, int64_t N,
                            int64_t K, double* out) {
  std::vector<double> cm(K * K);
  std::vector<double> acc(K, 0.0);
  int64_t n_pairs = 0;
  for (int64_t a = 0; a < A; ++a)
    for (int64_t b = a + 1; b < A; ++b) {
      confmat(labels + a * N, labels + b * N, N, K, cm.data());
      confmat_normalize_inplace(cm.data(), K);
      for (int64_t k = 0; k < K; ++k) acc[k] += cm[k * K + k];
      ++n_pairs;
    }
  for (int64_t k = 0; k < K; ++k)
    out[k] = n_pairs ? acc[k] / static_cast<double>(n_pairs) : 1.0;
}

}  // extern "C"
