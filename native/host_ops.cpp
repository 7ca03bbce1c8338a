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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// f32 → bf16, round-to-nearest-even (the XLA/ml_dtypes convention);
// NaN payload preserved with the quiet bit forced.
inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  if ((x & 0x7fffffffu) > 0x7f800000u) return (uint16_t)((x >> 16) | 0x0040u);
  x += 0x7fffu + ((x >> 16) & 1u);
  return (uint16_t)(x >> 16);
}

template <typename Fn>
void parallel_rows(int64_t B, int n_threads, Fn&& body) {
  int T = n_threads > 0
              ? n_threads
              : (int)std::max(1u, std::thread::hardware_concurrency());
  if (T <= 1 || B < 2 * T) {
    body((int64_t)0, B);
    return;
  }
  std::vector<std::thread> ts;
  const int64_t chunk = (B + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    const int64_t lo = t * chunk, hi = std::min(B, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Batch gather for the streaming feed path (dvae_tpu/data/stream.py): the
// reference provisions 32 host CPUs for exactly this per-batch re-gather
// (train-scripts/run-train-A5-E500000-a100.sh + utils/dataloader.py:
// 123-132).  numpy's fancy-index + astype is TWO full passes (gather to an
// f32 temporary, then cast); these fuse gather+cast into one pass and
// split rows across threads.

// dst[i, :] = src[sel[i], :] for row_bytes-wide rows (any dtype, no cast).
void gather_rows_bytes(const uint8_t* src, int64_t row_bytes,
                       const int64_t* sel, int64_t B, uint8_t* dst,
                       int n_threads) {
  parallel_rows(B, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      std::memcpy(dst + i * row_bytes, src + sel[i] * row_bytes, row_bytes);
  });
}

// dst[i, j] = bf16(src[sel[i], j]) — fused gather + f32→bf16 cast.
void gather_cast_f32_bf16(const float* src, int64_t D, const int64_t* sel,
                          int64_t B, uint16_t* dst, int n_threads) {
  parallel_rows(B, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* row = src + sel[i] * D;
      uint16_t* o = dst + i * D;
      for (int64_t j = 0; j < D; ++j) o[j] = f32_to_bf16(row[j]);
    }
  });
}

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

// Expected mutual information of the 2x2 contingency tables of every
// (reference-type, cluster) pair — the E[MI] term of the vectorized AMI
// (eval/evaluate.mutinfo; reference evaluation.py:25-41 computes it via
// sklearn per pair).  tf[F] = per-column positive counts, pc[C] = cluster
// sizes, N = samples; out[F*C] receives the per-pair EMI (sum over the 4
// cells of the hypergeometric expectation, Vinh et al. 2010).  The k-sum
// is truncated to +/-(12 sigma + 25) around the mean, where the
// log-concave pmf is < 1e-30 — below f64 resolution of the result.
void emi_binary(const int64_t* tf, int64_t F, const int64_t* pc, int64_t C,
                int64_t N, double* out) {
  // ln k! and ln k tables, k = 0..N
  std::vector<double> T(N + 1), L(N + 1);
  T[0] = 0.0;
  L[0] = 0.0;  // unused (k >= 1 in the sums)
  for (int64_t k = 1; k <= N; ++k) {
    L[k] = std::log(static_cast<double>(k));
    T[k] = T[k - 1] + L[k];
  }
  const double dN = static_cast<double>(N);

  // EMI contribution of one cell with marginals (a, b)
  auto cell = [&](int64_t a, int64_t b) -> double {
    if (a <= 0 || b <= 0) return 0.0;
    const int64_t lo_sup = std::max<int64_t>(1, a + b - N);
    const int64_t hi_sup = std::min(a, b);
    if (hi_sup < lo_sup) return 0.0;
    const double mu = static_cast<double>(a) * b / dN;
    const double sig = std::sqrt(std::max(
        static_cast<double>(a) * b * (N - a) * (N - b) /
            (dN * dN * std::max<int64_t>(N - 1, 1)),
        0.0));
    const double w = 12.0 * sig + 25.0;
    const int64_t lo = std::max(lo_sup, static_cast<int64_t>(mu - w));
    const int64_t hi = std::min(hi_sup, static_cast<int64_t>(mu + w) + 1);
    const double ln_const = T[N] - T[a] - T[N - a];  // -lnC(N, a)
    const double ln_ab = L[a] + L[b];
    double acc = 0.0;
    for (int64_t k = lo; k <= hi; ++k) {
      const double ln_pmf = (T[b] - T[k] - T[b - k]) +
                            (T[N - b] - T[a - k] - T[N - b - a + k]) -
                            ln_const;
      acc += (k / dN) * (L[N] + L[k] - ln_ab) * std::exp(ln_pmf);
    }
    return acc;
  };

#pragma omp parallel for schedule(dynamic)
  for (int64_t f = 0; f < F; ++f) {
    const int64_t a = tf[f];
    for (int64_t c = 0; c < C; ++c) {
      const int64_t b = pc[c];
      out[f * C + c] =
          cell(a, b) + cell(a, N - b) + cell(N - a, b) + cell(N - a, N - b);
    }
  }
}

}  // extern "C"
