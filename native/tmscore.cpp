// Native TM-score / optimal-RMSD core for the benchmark evaluator.
//
// C++ re-implementation of the SAME algorithms as
// se3diff_tpu/benchmarks/align.py (tm_score_fixed_pairing, rmsd_optimal):
// Kabsch superposition via a 3x3 Jacobi eigen-solver and the TM-score
// program's iterative fragment-seeded inclusion heuristic (Zhang & Skolnick
// 2004 — the stage the reference runs through the USalign binary per frame,
// bioemu-benchmarks eval/multiconf/metrics.py:20-45). The Python module
// remains the oracle; tests/test_native_tmscore.py checks parity.
//
// Exposed C ABI (ctypes):
//   tm_score_batch(mobile[F*L*3] f64, target[L*3] f64, F, L, max_iter,
//                  out[F] f64) -> 0
//   rmsd_batch(mobile[F*L*3] f64, target[L*3] f64, F, L, out[F] f64) -> 0

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

// ---- 3x3 symmetric Jacobi eigen-decomposition ---------------------------

static void jacobi3(const double a_in[3][3], double eigval[3],
                    double eigvec[3][3]) {
  double a[3][3];
  std::memcpy(a, a_in, sizeof(a));
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(a[0][1]) + std::fabs(a[0][2]) + std::fabs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(a[p][q]) < 1e-30) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        double app = a[p][p], aqq = a[q][q], apq = a[p][q];
        a[p][p] = c * c * app - 2 * s * c * apq + s * s * aqq;
        a[q][q] = s * s * app + 2 * s * c * apq + c * c * aqq;
        a[p][q] = a[q][p] = 0.0;
        int r = 3 - p - q;  // the remaining index
        double arp = a[r][p], arq = a[r][q];
        a[r][p] = a[p][r] = c * arp - s * arq;
        a[r][q] = a[q][r] = s * arp + c * arq;
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < 3; ++i) {
    eigval[i] = a[i][i];
    for (int k = 0; k < 3; ++k) eigvec[k][i] = v[k][i];
  }
  // Sort descending.
  for (int i = 0; i < 2; ++i) {
    int m = i;
    for (int j = i + 1; j < 3; ++j)
      if (eigval[j] > eigval[m]) m = j;
    if (m != i) {
      std::swap(eigval[i], eigval[m]);
      for (int k = 0; k < 3; ++k) std::swap(eigvec[k][i], eigvec[k][m]);
    }
  }
}

static double det3(const double m[3][3]) {
  return m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
         m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
         m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
}

// Kabsch: rotation R (det +1) minimizing ||R (p - cP) - (q - cQ)||.
// mobile/target are index subsets (idx, n of them). Returns centroids too.
static void kabsch(const double* mob, const double* tgt, const int* idx,
                   int n, double R[3][3], double cP[3], double cQ[3]) {
  cP[0] = cP[1] = cP[2] = cQ[0] = cQ[1] = cQ[2] = 0.0;
  for (int k = 0; k < n; ++k) {
    const double* p = mob + 3 * idx[k];
    const double* q = tgt + 3 * idx[k];
    for (int d = 0; d < 3; ++d) {
      cP[d] += p[d];
      cQ[d] += q[d];
    }
  }
  for (int d = 0; d < 3; ++d) {
    cP[d] /= n;
    cQ[d] /= n;
  }
  double H[3][3] = {{0}};
  for (int k = 0; k < n; ++k) {
    const double* p = mob + 3 * idx[k];
    const double* q = tgt + 3 * idx[k];
    double dp[3] = {p[0] - cP[0], p[1] - cP[1], p[2] - cP[2]};
    double dq[3] = {q[0] - cQ[0], q[1] - cQ[1], q[2] - cQ[2]};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) H[i][j] += dp[i] * dq[j];
  }
  // H = U S V^T. Use K = H^T H = V S^2 V^T (Jacobi), U = H V S^-1.
  double K[3][3];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      K[i][j] = H[0][i] * H[0][j] + H[1][i] * H[1][j] + H[2][i] * H[2][j];
  double s2[3], V[3][3];
  jacobi3(K, s2, V);
  double U[3][3];
  bool have[3] = {false, false, false};
  int n_have = 0;
  for (int c = 0; c < 3; ++c) {
    double s = std::sqrt(std::max(s2[c], 0.0));
    if (s > 1e-12) {
      for (int r = 0; r < 3; ++r)
        U[r][c] = (H[r][0] * V[0][c] + H[r][1] * V[1][c] + H[r][2] * V[2][c]) / s;
      have[c] = true;
      ++n_have;
    }
  }
  // Degenerate directions (collinear or single-point subsets): complete U to
  // an orthonormal basis from the valid columns in a SECOND pass, so a cross
  // product never reads a not-yet-computed column.
  if (n_have < 3) {
    if (n_have == 0) {
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) U[i][j] = (i == j) ? 1.0 : 0.0;
    } else if (n_have == 1) {
      int a = have[0] ? 0 : (have[1] ? 1 : 2);
      // Build one unit vector orthogonal to column a (pick the axis least
      // aligned with it), then fill the remaining two columns in order.
      double u[3] = {U[0][a], U[1][a], U[2][a]};
      int ax = (std::fabs(u[0]) <= std::fabs(u[1]) &&
                std::fabs(u[0]) <= std::fabs(u[2]))
                   ? 0
                   : (std::fabs(u[1]) <= std::fabs(u[2]) ? 1 : 2);
      double e[3] = {0, 0, 0};
      e[ax] = 1.0;
      double dot = e[0] * u[0] + e[1] * u[1] + e[2] * u[2];
      double w[3] = {e[0] - dot * u[0], e[1] - dot * u[1], e[2] - dot * u[2]};
      double wn = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
      for (int d = 0; d < 3; ++d) w[d] /= wn;
      int c1 = -1, c2 = -1;
      for (int c = 0; c < 3; ++c)
        if (!have[c]) (c1 < 0 ? c1 : c2) = c;
      for (int d = 0; d < 3; ++d) U[d][c1] = w[d];
      U[0][c2] = u[1] * w[2] - u[2] * w[1];
      U[1][c2] = u[2] * w[0] - u[0] * w[2];
      U[2][c2] = u[0] * w[1] - u[1] * w[0];
    } else {  // n_have == 2: the missing column is the cross of the two valid.
      int c = !have[0] ? 0 : (!have[1] ? 1 : 2);
      int a = (c + 1) % 3, b = (c + 2) % 3;
      U[0][c] = U[1][a] * U[2][b] - U[2][a] * U[1][b];
      U[1][c] = U[2][a] * U[0][b] - U[0][a] * U[2][b];
      U[2][c] = U[0][a] * U[1][b] - U[1][a] * U[0][b];
    }
  }
  double d = det3(H) >= 0 ? 1.0 : -1.0;
  // If H is singular the sign comes from det(U)*det(V) instead.
  if (std::fabs(det3(H)) < 1e-12) d = det3(U) * det3(V) >= 0 ? 1.0 : -1.0;
  // R = V D U^T with D = diag(1, 1, d) in the sorted basis.
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0.0;
      for (int k = 0; k < 3; ++k) {
        double dk = (k == 2) ? d : 1.0;
        acc += V[i][k] * dk * U[j][k];
      }
      R[i][j] = acc;
    }
}

static double tm_d0(int l) {
  if (l > 15) return 1.24 * std::cbrt(static_cast<double>(l - 15)) - 1.8;
  return 0.5;
}

}  // namespace

extern "C" {

// Optimal-superposition RMSD per frame (align.rmsd_optimal semantics).
int rmsd_batch(const double* mobile, const double* target, int F, int L,
               double* out) {
  if (L < 1) return 1;
  double cT[3] = {0, 0, 0};
  for (int i = 0; i < L; ++i)
    for (int d = 0; d < 3; ++d) cT[d] += target[3 * i + d];
  for (int d = 0; d < 3; ++d) cT[d] /= L;
  std::vector<double> T0(3 * L);
  double gT = 0.0;
  for (int i = 0; i < L; ++i)
    for (int d = 0; d < 3; ++d) {
      double v = target[3 * i + d] - cT[d];
      T0[3 * i + d] = v;
      gT += v * v;
    }
  for (int f = 0; f < F; ++f) {
    const double* M = mobile + static_cast<int64_t>(f) * 3 * L;
    double cM[3] = {0, 0, 0};
    for (int i = 0; i < L; ++i)
      for (int d = 0; d < 3; ++d) cM[d] += M[3 * i + d];
    for (int d = 0; d < 3; ++d) cM[d] /= L;
    double H[3][3] = {{0}};
    double gM = 0.0;
    for (int i = 0; i < L; ++i) {
      double m0[3] = {M[3 * i] - cM[0], M[3 * i + 1] - cM[1],
                      M[3 * i + 2] - cM[2]};
      gM += m0[0] * m0[0] + m0[1] * m0[1] + m0[2] * m0[2];
      for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b) H[a][b] += m0[a] * T0[3 * i + b];
    }
    double K[3][3];
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j)
        K[i][j] = H[0][i] * H[0][j] + H[1][i] * H[1][j] + H[2][i] * H[2][j];
    double s2[3], V[3][3];
    jacobi3(K, s2, V);
    double sv = std::sqrt(std::max(s2[0], 0.0)) +
                std::sqrt(std::max(s2[1], 0.0));
    double s3 = std::sqrt(std::max(s2[2], 0.0));
    sv += (det3(H) < 0) ? -s3 : s3;
    double e = gM + gT - 2.0 * sv;
    out[f] = std::sqrt(std::max(e, 0.0) / L);
  }
  return 0;
}

// TM-score with fixed residue pairing (align.tm_score_fixed_pairing
// semantics, including seed schedule, d0_search growth, and set-convergence
// stopping). mobile holds F frames; out[f] = best TM over all seeds.
int tm_score_batch(const double* mobile, const double* target, int F, int L,
                   int max_iter, double* out) {
  if (L < 1) return 1;
  double d0 = tm_d0(L);
  double d0s = d0;
  if (d0s < 4.5) d0s = 4.5;
  if (d0s > 8.0) d0s = 8.0;
  double inv_d02 = 1.0 / (d0 * d0);

  // Seed fragments: (L, L/2, L/4, max(L/8, 4)), each with step frag/2.
  struct Seed {
    int start, frag;
  };
  std::vector<Seed> seeds;
  int frags[4] = {L, L / 2, L / 4, L / 8 > 4 ? L / 8 : 4};
  for (int fi = 0; fi < 4; ++fi) {
    int frag = frags[fi];
    if (frag < 4) continue;
    int step = frag / 2 > 1 ? frag / 2 : 1;
    for (int start = 0; start + frag <= L; start += step)
      seeds.push_back({start, frag});
  }

  std::vector<int> idx(L), new_idx(L);
  std::vector<uint8_t> prev(L), cur(L);
  std::vector<double> moved(3 * L);

  for (int f = 0; f < F; ++f) {
    const double* M = mobile + static_cast<int64_t>(f) * 3 * L;
    double best = 0.0;
    for (const Seed& sd : seeds) {
      int n = sd.frag;
      for (int k = 0; k < n; ++k) idx[k] = sd.start + k;
      std::fill(prev.begin(), prev.end(), 0);
      bool have_prev = false;
      for (int it = 0; it < max_iter; ++it) {
        if (n < 3) break;
        double R[3][3], cP[3], cQ[3];
        kabsch(M, target, idx.data(), n, R, cP, cQ);
        double tm = 0.0;
        for (int i = 0; i < L; ++i) {
          double p[3] = {M[3 * i] - cP[0], M[3 * i + 1] - cP[1],
                         M[3 * i + 2] - cP[2]};
          double m0 = R[0][0] * p[0] + R[0][1] * p[1] + R[0][2] * p[2] + cQ[0];
          double m1 = R[1][0] * p[0] + R[1][1] * p[1] + R[1][2] * p[2] + cQ[1];
          double m2 = R[2][0] * p[0] + R[2][1] * p[1] + R[2][2] * p[2] + cQ[2];
          moved[3 * i] = m0;
          moved[3 * i + 1] = m1;
          moved[3 * i + 2] = m2;
          double dx = m0 - target[3 * i];
          double dy = m1 - target[3 * i + 1];
          double dz = m2 - target[3 * i + 2];
          double d2 = dx * dx + dy * dy + dz * dz;
          tm += 1.0 / (1.0 + d2 * inv_d02);
        }
        tm /= L;
        if (tm > best) best = tm;

        double cut = d0s;
        int m = 0;
        while (true) {
          m = 0;
          for (int i = 0; i < L; ++i) {
            double dx = moved[3 * i] - target[3 * i];
            double dy = moved[3 * i + 1] - target[3 * i + 1];
            double dz = moved[3 * i + 2] - target[3 * i + 2];
            double d = std::sqrt(dx * dx + dy * dy + dz * dz);
            cur[i] = d < cut ? 1 : 0;
            if (cur[i]) new_idx[m++] = i;
          }
          if (m >= 3 || cut >= 8.0) break;
          cut += 0.5;
        }
        if (have_prev && std::memcmp(prev.data(), cur.data(), L) == 0) break;
        prev = cur;
        have_prev = true;
        n = m;
        std::copy(new_idx.begin(), new_idx.begin() + m, idx.begin());
      }
    }
    out[f] = best;
  }
  return 0;
}

}  // extern "C"
