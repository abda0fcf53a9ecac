// Native trajectory-QP solvers: the MA27-analogue layer.
//
// The reference delegates its per-iteration KKT factorization to HSL MA27
// (Fortran sparse symmetric-indefinite LDL^T inside IPOPT; reference:
// vehicle_control/controllers/mpc/cascaded_mpc.py:57-63).  This library
// provides the equivalent native capability for the TPU framework's host
// side:
//
//   * riccati_backward — block-tridiagonal factorization of the time-staged
//     QP via the Riccati recursion (what the JAX/Pallas path runs on-device);
//     serves as an independent oracle for solver verification and as a fast
//     CPU fallback.
//   * kkt_newton_step — the *literal* MA27 role: assemble the full sparse
//     KKT system of the equality-constrained QP and factor it with a
//     regularized LDL^T (quasi-definite after +/- delta regularization, so
//     no pivoting is required), then recover the Newton step.  Used to
//     cross-check that the Riccati recursion solves the same linear system.
//
// Plain C++17, no dependencies; built with `make` into libvcnative.so and
// loaded via ctypes (vehicle_control_tpu/native/__init__.py).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// row-major helpers
inline double& at(double* M, int cols, int i, int j) { return M[i * cols + j]; }
inline const double& at(const double* M, int cols, int i, int j) {
  return M[i * cols + j];
}

// Cholesky factorization of an n x n SPD matrix (row-major, in place).
// Returns false if not positive definite.
bool cholesky(double* A, int n) {
  for (int j = 0; j < n; ++j) {
    double d = at(A, n, j, j);
    for (int k = 0; k < j; ++k) d -= at(A, n, j, k) * at(A, n, j, k);
    if (d <= 0.0 || !std::isfinite(d)) return false;
    double L = std::sqrt(d);
    at(A, n, j, j) = L;
    for (int i = j + 1; i < n; ++i) {
      double s = at(A, n, i, j);
      for (int k = 0; k < j; ++k) s -= at(A, n, i, k) * at(A, n, j, k);
      at(A, n, i, j) = s / L;
    }
  }
  return true;
}

// Solve L L^T x = b for nrhs right-hand sides stored as columns of B
// (row-major n x nrhs), in place.
void cho_solve(const double* L, int n, double* B, int nrhs) {
  for (int c = 0; c < nrhs; ++c) {
    // forward
    for (int i = 0; i < n; ++i) {
      double s = at(B, nrhs, i, c);
      for (int k = 0; k < i; ++k) s -= at(L, n, i, k) * at(B, nrhs, k, c);
      at(B, nrhs, i, c) = s / at(L, n, i, i);
    }
    // backward
    for (int i = n - 1; i >= 0; --i) {
      double s = at(B, nrhs, i, c);
      for (int k = i + 1; k < n; ++k) s -= at(L, n, k, i) * at(B, nrhs, k, c);
      at(B, nrhs, i, c) = s / at(L, n, i, i);
    }
  }
}

}  // namespace

extern "C" {

// Backward Riccati sweep over H stages.
// Inputs (row-major, stage-major): lz[H*nx], lu[H*nu], lzz[H*nx*nx],
// luz[H*nu*nx], luu[H*nu*nu], A[H*nx*nx], B[H*nx*nu], rho.
// Outputs: kff[H*nu], Kfb[H*nu*nx], dV[2].
// Returns 0 on success, 1 if any Quu was not positive definite.
int riccati_backward(int H, int nx, int nu, const double* lz, const double* lu,
                     const double* lzz, const double* luz, const double* luu,
                     const double* A, const double* B, double rho, double* kff,
                     double* Kfb, double* dV) {
  std::vector<double> Vx(nx, 0.0), Vxx(nx * nx, 0.0);
  std::vector<double> Qx(nx), Qu(nu), Qxx(nx * nx), Qux(nu * nx),
      Quu(nu * nu), VxxA(nx * nx), VxxB(nx * nu), rhs(nu * (1 + nx)),
      Lc(nu * nu);
  double dV1 = 0.0, dV2 = 0.0;
  int fail = 0;

  for (int n = H - 1; n >= 0; --n) {
    const double* An = A + n * nx * nx;
    const double* Bn = B + n * nx * nu;
    const double* lzzn = lzz + n * nx * nx;
    const double* luzn = luz + n * nu * nx;
    const double* luun = luu + n * nu * nu;

    // VxxA = Vxx * A,  VxxB = Vxx * B
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = 0.0;
        for (int k = 0; k < nx; ++k) s += Vxx[i * nx + k] * at(An, nx, k, j);
        VxxA[i * nx + j] = s;
      }
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nu; ++j) {
        double s = 0.0;
        for (int k = 0; k < nx; ++k) s += Vxx[i * nx + k] * at(Bn, nu, k, j);
        VxxB[i * nu + j] = s;
      }

    // Qx = lz + A^T Vx ; Qu = lu + B^T Vx
    for (int i = 0; i < nx; ++i) {
      double s = lz[n * nx + i];
      for (int k = 0; k < nx; ++k) s += at(An, nx, k, i) * Vx[k];
      Qx[i] = s;
    }
    for (int i = 0; i < nu; ++i) {
      double s = lu[n * nu + i];
      for (int k = 0; k < nx; ++k) s += at(Bn, nu, k, i) * Vx[k];
      Qu[i] = s;
    }
    // Qxx = lzz + A^T VxxA ; Qux = luz + B^T VxxA ; Quu = luu + B^T VxxB
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = lzzn[i * nx + j];
        for (int k = 0; k < nx; ++k) s += at(An, nx, k, i) * VxxA[k * nx + j];
        Qxx[i * nx + j] = s;
      }
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = luzn[i * nx + j];
        for (int k = 0; k < nx; ++k) s += at(Bn, nu, k, i) * VxxA[k * nx + j];
        Qux[i * nx + j] = s;
      }
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nu; ++j) {
        double s = luun[i * nu + j];
        for (int k = 0; k < nx; ++k) s += at(Bn, nu, k, i) * VxxB[k * nu + j];
        Quu[i * nu + j] = s;
      }
    // symmetrize + regularize
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < i; ++j) {
        double m = 0.5 * (Quu[i * nu + j] + Quu[j * nu + i]);
        Quu[i * nu + j] = Quu[j * nu + i] = m;
      }
    for (int i = 0; i < nu; ++i) Quu[i * nu + i] += rho;

    // solve Quu [kff | Kfb] = -[Qu | Qux]
    std::memcpy(Lc.data(), Quu.data(), sizeof(double) * nu * nu);
    if (!cholesky(Lc.data(), nu)) {
      fail = 1;
      break;
    }
    for (int i = 0; i < nu; ++i) {
      rhs[i * (1 + nx) + 0] = -Qu[i];
      for (int j = 0; j < nx; ++j) rhs[i * (1 + nx) + 1 + j] = -Qux[i * nx + j];
    }
    cho_solve(Lc.data(), nu, rhs.data(), 1 + nx);
    for (int i = 0; i < nu; ++i) {
      kff[n * nu + i] = rhs[i * (1 + nx)];
      for (int j = 0; j < nx; ++j)
        Kfb[(n * nu + i) * nx + j] = rhs[i * (1 + nx) + 1 + j];
    }

    // dV1 += kff.Qu ; dV2 += 0.5 kff.Quu.kff
    double kQu = 0.0, kQk = 0.0;
    for (int i = 0; i < nu; ++i) {
      kQu += kff[n * nu + i] * Qu[i];
      for (int j = 0; j < nu; ++j)
        kQk += kff[n * nu + i] * Quu[i * nu + j] * kff[n * nu + j];
    }
    dV1 += kQu;
    dV2 += 0.5 * kQk;

    // Vx = Qx + K^T Quu k + K^T Qu + Qux^T k ; Vxx = Qxx + K^T Quu K +
    // K^T Qux + Qux^T K
    std::vector<double> QuuK(nu * nx);
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = 0.0;
        for (int k = 0; k < nu; ++k)
          s += Quu[i * nu + k] * Kfb[(n * nu + k) * nx + j];
        QuuK[i * nx + j] = s;
      }
    std::vector<double> Vx_n(nx), Vxx_n(nx * nx);
    for (int j = 0; j < nx; ++j) {
      double s = Qx[j];
      for (int i = 0; i < nu; ++i) {
        double Kij = Kfb[(n * nu + i) * nx + j];
        double ki = kff[n * nu + i];
        double Qk = 0.0;
        for (int k = 0; k < nu; ++k) Qk += Quu[i * nu + k] * kff[n * nu + k];
        s += Kij * (Qk + Qu[i]) + Qux[i * nx + j] * ki;
      }
      Vx_n[j] = s;
    }
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = Qxx[i * nx + j];
        for (int k = 0; k < nu; ++k) {
          s += Kfb[(n * nu + k) * nx + i] * QuuK[k * nx + j];
          s += Kfb[(n * nu + k) * nx + i] * Qux[k * nx + j];
          s += Qux[k * nx + i] * Kfb[(n * nu + k) * nx + j];
        }
        Vxx_n[i * nx + j] = s;
      }
    // symmetrize
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < i; ++j) {
        double m = 0.5 * (Vxx_n[i * nx + j] + Vxx_n[j * nx + i]);
        Vxx_n[i * nx + j] = Vxx_n[j * nx + i] = m;
      }
    Vx = Vx_n;
    Vxx = Vxx_n;
  }
  dV[0] = dV1;
  dV[1] = dV2;
  return fail;
}

// Full-KKT Newton step of the time-staged equality-constrained QP
// (dx_0 = 0), factored with a regularized LDL^T — the literal MA27 role.
// Variable ordering: [du_0, (lam_1, dx_1), du_1, (lam_2, dx_2), ...,
// du_{H-1}] where lam_n are the multipliers of dx_n's dynamics equality.
// Output: du[H*nu] (the open-loop Newton step).  Returns 0 on success.
int kkt_newton_step(int H, int nx, int nu, const double* lz, const double* lu,
                    const double* lzz, const double* luz, const double* luu,
                    const double* A, const double* B, double delta,
                    double* du_out) {
  const int nv = H * nu + (H - 1) * 2 * nx;  // du + (lam, dx) per interior
  std::vector<double> K(static_cast<size_t>(nv) * nv, 0.0);
  std::vector<double> g(nv, 0.0);

  auto du_off = [&](int n) { return n * (nu + 2 * nx); };
  auto lam_off = [&](int n) { return (n - 1) * (nu + 2 * nx) + nu; };  // n>=1
  auto dx_off = [&](int n) { return (n - 1) * (nu + 2 * nx) + nu + nx; };

  // Hessian blocks + gradient
  for (int n = 0; n < H; ++n) {
    const double* luun = luu + n * nu * nu;
    const double* luzn = luz + n * nu * nx;
    const double* lzzn = lzz + n * nx * nx;
    int ou = du_off(n);
    for (int i = 0; i < nu; ++i) {
      g[ou + i] = lu[n * nu + i];
      for (int j = 0; j < nu; ++j) K[(ou + i) * (size_t)nv + ou + j] = luun[i * nu + j];
    }
    if (n >= 1) {
      int ox = dx_off(n);
      for (int i = 0; i < nx; ++i) {
        g[ox + i] = lz[n * nx + i];
        for (int j = 0; j < nx; ++j)
          K[(ox + i) * (size_t)nv + ox + j] = lzzn[i * nx + j];
      }
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j < nx; ++j) {
          K[(ou + i) * (size_t)nv + ox + j] = luzn[i * nx + j];
          K[(ox + j) * (size_t)nv + ou + i] = luzn[i * nx + j];
        }
    }
  }
  // dynamics constraints: dx_{n+1} - A_n dx_n - B_n du_n = 0, n = 0..H-2
  for (int n = 0; n + 1 < H; ++n) {
    int ol = lam_off(n + 1);
    int oxn1 = dx_off(n + 1);
    int oun = du_off(n);
    const double* An = A + n * nx * nx;
    const double* Bn = B + n * nx * nu;
    for (int i = 0; i < nx; ++i) {
      K[(ol + i) * (size_t)nv + oxn1 + i] += 1.0;
      K[(oxn1 + i) * (size_t)nv + ol + i] += 1.0;
      for (int j = 0; j < nu; ++j) {
        K[(ol + i) * (size_t)nv + oun + j] -= at(Bn, nu, i, j);
        K[(oun + j) * (size_t)nv + ol + i] -= at(Bn, nu, i, j);
      }
      if (n >= 1) {
        int oxn = dx_off(n);
        for (int j = 0; j < nx; ++j) {
          K[(ol + i) * (size_t)nv + oxn + j] -= at(An, nx, i, j);
          K[(oxn + j) * (size_t)nv + ol + i] -= at(An, nx, i, j);
        }
      }
    }
  }
  // quasi-definite regularization: +delta on primal, -delta on dual diagonal
  for (int n = 0; n < H; ++n) {
    int ou = du_off(n);
    for (int i = 0; i < nu; ++i) K[(ou + i) * (size_t)nv + ou + i] += delta;
    if (n >= 1) {
      int ox = dx_off(n), ol = lam_off(n);
      for (int i = 0; i < nx; ++i) {
        K[(ox + i) * (size_t)nv + ox + i] += delta;
        K[(ol + i) * (size_t)nv + ol + i] -= delta;
      }
    }
  }

  // LDL^T without pivoting (valid for quasi-definite K)
  std::vector<double> D(nv);
  for (int j = 0; j < nv; ++j) {
    double d = K[j * (size_t)nv + j];
    for (int k = 0; k < j; ++k)
      d -= K[j * (size_t)nv + k] * K[j * (size_t)nv + k] * D[k];
    if (!std::isfinite(d) || std::fabs(d) < 1e-300) return 1;
    D[j] = d;
    for (int i = j + 1; i < nv; ++i) {
      double s = K[i * (size_t)nv + j];
      for (int k = 0; k < j; ++k)
        s -= K[i * (size_t)nv + k] * K[j * (size_t)nv + k] * D[k];
      K[i * (size_t)nv + j] = s / d;
    }
  }
  // solve K z = -g
  std::vector<double> z(nv);
  for (int i = 0; i < nv; ++i) {
    double s = -g[i];
    for (int k = 0; k < i; ++k) s -= K[i * (size_t)nv + k] * z[k];
    z[i] = s;
  }
  for (int i = 0; i < nv; ++i) z[i] /= D[i];
  for (int i = nv - 1; i >= 0; --i) {
    double s = z[i];
    for (int k = i + 1; k < nv; ++k) s -= K[k * (size_t)nv + i] * z[k];
    z[i] = s;
  }
  for (int n = 0; n < H; ++n)
    for (int i = 0; i < nu; ++i) du_out[n * nu + i] = z[du_off(n) + i];
  return 0;
}

}  // extern "C"
