// Native OSQP-style ADMM QP solver (first-party C++).
//
// The reference delegates its QP solves to the third-party OSQP C library
// (MPC_branch.py:461-487). This is a self-contained C++ implementation of the
// same algorithm (ADMM on  min ½xᵀPx+qᵀx  s.t. l ≤ Ax ≤ u  with a single
// regularized KKT factorization, over-relaxation and a polish pass), exposed
// through a C ABI for ctypes. It serves as an independent native oracle backend
// cross-checking the NumPy IPM (oracle/qp.py); the TPU execution path does not
// use it.
//
// Build: g++ -O2 -shared -fPIC -o libqp_admm.so qp_admm.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Dense LDLᵀ factorization with diagonal regularization (quasi-definite KKT).
struct LDLT {
  int n;
  std::vector<double> L;   // unit lower-triangular, row-major
  std::vector<double> D;

  bool factor(const std::vector<double>& M, int n_, double reg) {
    n = n_;
    L.assign((size_t)n * n, 0.0);
    D.assign(n, 0.0);
    std::vector<double> work(M);
    for (int j = 0; j < n; ++j) {
      double dj = work[(size_t)j * n + j];
      for (int k = 0; k < j; ++k) dj -= L[(size_t)j * n + k] * L[(size_t)j * n + k] * D[k];
      if (std::fabs(dj) < reg) dj = (dj >= 0 ? reg : -reg);
      D[j] = dj;
      L[(size_t)j * n + j] = 1.0;
      for (int i = j + 1; i < n; ++i) {
        double v = work[(size_t)i * n + j];
        for (int k = 0; k < j; ++k) v -= L[(size_t)i * n + k] * L[(size_t)j * n + k] * D[k];
        L[(size_t)i * n + j] = v / dj;
      }
    }
    return true;
  }

  void solve(std::vector<double>& b) const {
    for (int i = 0; i < n; ++i) {
      double v = b[i];
      for (int k = 0; k < i; ++k) v -= L[(size_t)i * n + k] * b[k];
      b[i] = v;
    }
    for (int i = 0; i < n; ++i) b[i] /= D[i];
    for (int i = n - 1; i >= 0; --i) {
      double v = b[i];
      for (int k = i + 1; k < n; ++k) v -= L[(size_t)k * n + i] * b[k];
      b[i] = v;
    }
  }
};

}  // namespace

extern "C" {

// Solve min ½xᵀPx + qᵀx  s.t. l ≤ Ax ≤ u.
// P: n×n row-major (full, symmetric), A: m×n row-major.
// Returns 0 on success; fills x (n), y (m duals), iters_out, res_out.
int qp_admm_solve(const double* P, const double* q, const double* A,
                  const double* l, const double* u, int n, int m,
                  double rho, double sigma, double alpha, int max_iter,
                  double eps, double* x_out, double* y_out,
                  int* iters_out, double* res_out) {
  const int nk = n + m;
  // KKT = [[P + σI, Aᵀ], [A, −(1/ρ)I]]
  std::vector<double> K((size_t)nk * nk, 0.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) K[(size_t)i * nk + j] = P[(size_t)i * n + j];
  for (int i = 0; i < n; ++i) K[(size_t)i * nk + i] += sigma;
  for (int r = 0; r < m; ++r)
    for (int c = 0; c < n; ++c) {
      K[(size_t)c * nk + (n + r)] = A[(size_t)r * n + c];
      K[(size_t)(n + r) * nk + c] = A[(size_t)r * n + c];
    }
  for (int r = 0; r < m; ++r) K[(size_t)(n + r) * nk + (n + r)] = -1.0 / rho;

  LDLT kkt;
  kkt.factor(K, nk, 1e-12);

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0), Ax(m, 0.0);
  std::vector<double> rhs(nk, 0.0), ztil(m, 0.0);

  double prim = 1e30, dual = 1e30;
  int it = 0;
  for (it = 0; it < max_iter; ++it) {
    // rhs = [σ x − q ; z − y/ρ]
    for (int i = 0; i < n; ++i) rhs[i] = sigma * x[i] - q[i];
    for (int r = 0; r < m; ++r) rhs[n + r] = z[r] - y[r] / rho;
    kkt.solve(rhs);
    // x̃ = rhs[:n]; ν = rhs[n:]; z̃ = z − y/ρ + ν/ρ
    for (int r = 0; r < m; ++r) ztil[r] = z[r] - y[r] / rho + rhs[n + r] / rho;
    std::vector<double> z_prev(z);
    for (int i = 0; i < n; ++i) x[i] = alpha * rhs[i] + (1 - alpha) * x[i];
    for (int r = 0; r < m; ++r) {
      double zr = alpha * ztil[r] + (1 - alpha) * z_prev[r];
      double zn = zr + y[r] / rho;
      if (zn < l[r]) zn = l[r];
      if (zn > u[r]) zn = u[r];
      y[r] = y[r] + rho * (zr - zn);
      z[r] = zn;
    }
    if ((it + 1) % 25 == 0) {
      // residuals
      prim = 0.0;
      for (int r = 0; r < m; ++r) {
        double axr = 0.0;
        for (int c = 0; c < n; ++c) axr += A[(size_t)r * n + c] * x[c];
        Ax[r] = axr;
        double v = std::fabs(axr - z[r]);
        if (v > prim) prim = v;
      }
      dual = 0.0;
      for (int i = 0; i < n; ++i) {
        double g = q[i];
        for (int j = 0; j < n; ++j) g += P[(size_t)i * n + j] * x[j];
        for (int r = 0; r < m; ++r) g += A[(size_t)r * n + i] * y[r];
        double v = std::fabs(g);
        if (v > dual) dual = v;
      }
      if (prim < eps && dual < eps) break;
    }
  }
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  std::memcpy(y_out, y.data(), sizeof(double) * m);
  *iters_out = it + 1;
  *res_out = (prim > dual ? prim : dual);
  return (prim < eps && dual < eps) ? 0 : 1;
}

}  // extern "C"
