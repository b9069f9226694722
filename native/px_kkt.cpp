// px_kkt.cpp — native block-tridiagonal quasidefinite KKT solver.
//
// The host-side counterpart of piccolax/solver/kkt.py::qd_factor/qd_solve:
// the role Ipopt's MUMPS/HSL sparse LDL^T plays in the reference stack
// (Piccolo.jl reaches it through DirectTrajOpt's solve!; see SURVEY.md
// sections 2.9 and 3.2). Where the reference hands a *generic* sparse
// symmetric matrix to a pivoting factorization, the collocation KKT is
// block-tridiagonal with symmetric quasidefinite diagonal blocks
//
//     Dt_k = [[ P_k, C_k^T ], [ C_k, -diag(R_k) ]],
//     S[k, k+1] = [[0, 0], [Cnext_k, 0]]
//
// (P_k > 0 primal Hessian + barrier, R_k > 0 constraint regularization),
// which factors stably WITHOUT pivoting (Vanderbei 1995): two small dense
// Cholesky factorizations per knot. This file implements that recursion
// in exact double precision with OpenMP over the batch axis. It is used
// by piccolax.solver.native_kkt as
//   (a) an alternative host KKT backend for the IPM (the "MadNLP option"
//       of the reference, SURVEY.md section 2.9), and
//   (b) an independent oracle the JAX/TPU matmul-only factorization is
//       tested against.
//
// No LAPACK/BLAS dependency: blocks are small (dz, m ~ 10..64), so naive
// O(n^3) loops with restrict pointers are at parity with dgemm at these
// sizes and keep the build self-contained.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Lower Cholesky in place: A (n x n, row-major, full storage) -> L in the
// lower triangle. Returns 0 on success, 1 if a pivot is not positive.
int cholesky(double* A, int n) {
    for (int j = 0; j < n; ++j) {
        double d = A[j * n + j];
        for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
        if (!(d > 0.0) || !std::isfinite(d)) return 1;
        const double Ljj = std::sqrt(d);
        A[j * n + j] = Ljj;
        const double inv = 1.0 / Ljj;
        for (int i = j + 1; i < n; ++i) {
            double s = A[i * n + j];
            for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
            A[i * n + j] = s * inv;
        }
    }
    return 0;
}

// Solve L y = b, then L^T x = y, for r right-hand sides stored as
// B (n x r, row-major). In place.
void chol_solve(const double* L, double* B, int n, int r) {
    // forward
    for (int i = 0; i < n; ++i) {
        const double inv = 1.0 / L[i * n + i];
        for (int c = 0; c < r; ++c) {
            double s = B[i * r + c];
            for (int k = 0; k < i; ++k) s -= L[i * n + k] * B[k * r + c];
            B[i * r + c] = s * inv;
        }
    }
    // backward
    for (int i = n - 1; i >= 0; --i) {
        const double inv = 1.0 / L[i * n + i];
        for (int c = 0; c < r; ++c) {
            double s = B[i * r + c];
            for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * B[k * r + c];
            B[i * r + c] = s * inv;
        }
    }
}

// C = A @ B, A (n x k), B (k x r), C (n x r), all row-major.
void matmul(const double* A, const double* B, double* C,
            int n, int k, int r) {
    std::memset(C, 0, sizeof(double) * n * r);
    for (int i = 0; i < n; ++i)
        for (int p = 0; p < k; ++p) {
            const double a = A[i * k + p];
            if (a == 0.0) continue;
            const double* Brow = B + p * r;
            double* Crow = C + i * r;
            for (int c = 0; c < r; ++c) Crow[c] += a * Brow[c];
        }
}

// C += A^T @ B, A (k x n), B (k x r), C (n x r).
void matmul_tn_acc(const double* A, const double* B, double* C,
                   int k, int n, int r) {
    for (int p = 0; p < k; ++p) {
        const double* Arow = A + p * n;
        const double* Brow = B + p * r;
        for (int i = 0; i < n; ++i) {
            const double a = Arow[i];
            if (a == 0.0) continue;
            double* Crow = C + i * r;
            for (int c = 0; c < r; ++c) Crow[c] += a * Brow[c];
        }
    }
}

struct Workspace {
    std::vector<double> Lp;    // [N, dz, dz] chol factors of P_eff
    std::vector<double> Ls;    // [N, m, m] chol factors of dual Schur S
    std::vector<double> tmp;   // scratch
    void resize(int N, int dz, int m, int r) {
        Lp.assign((size_t)N * dz * dz, 0.0);
        Ls.assign((size_t)N * m * m, 0.0);
        int mb = dz + m;
        tmp.assign((size_t)(m * dz + dz * (r > mb ? r : mb) +
                            m * (r > mb ? r : mb) + dz * dz + m * m),
                   0.0);
    }
};

// Apply Dt_k^{-1} to (a [dz x r], b [m x r]) given factors; writes x, y.
// scratch needs dz*r + m*r doubles.
void qd_block_apply(const double* Lp, const double* Ls, const double* C,
                    const double* a, const double* b, double* x, double* y,
                    int dz, int m, int r, double* scratch) {
    double* t = scratch;              // dz x r
    double* u = scratch + dz * r;     // m x r
    std::memcpy(t, a, sizeof(double) * dz * r);
    chol_solve(Lp, t, dz, r);                       // t = P_eff^{-1} a
    matmul(C, t, u, m, dz, r);                      // u = C t
    for (int i = 0; i < m * r; ++i) u[i] -= b[i];   // u = C t - b
    chol_solve(Ls, u, m, r);                        // y = S^{-1}(C t - b)
    std::memcpy(y, u, sizeof(double) * m * r);
    // x = t - P_eff^{-1} C^T y
    std::memset(x, 0, sizeof(double) * dz * r);
    matmul_tn_acc(C, y, x, m, dz, r);               // x = C^T y
    chol_solve(Lp, x, dz, r);
    for (int i = 0; i < dz * r; ++i) x[i] = t[i] - x[i];
}

// Factor one problem; returns 0 on success.
int qd_factor_one(const double* P, const double* C, const double* Rdiag,
                  const double* Cnext, int N, int dz, int m, Workspace& ws) {
    std::vector<double> W((size_t)m * dz);   // S^{-1}-solved Cnext rows
    std::vector<double> Peff((size_t)dz * dz);
    std::vector<double> S((size_t)m * m);
    for (int k = 0; k < N; ++k) {
        // P_eff = P_k (+ Cnext_{k-1}^T S_{k-1}^{-1} Cnext_{k-1})
        std::memcpy(Peff.data(), P + (size_t)k * dz * dz,
                    sizeof(double) * dz * dz);
        if (k > 0) {
            const double* Cn = Cnext + (size_t)(k - 1) * m * dz;
            std::memcpy(W.data(), Cn, sizeof(double) * m * dz);
            chol_solve(ws.Ls.data() + (size_t)(k - 1) * m * m, W.data(),
                       m, dz);                       // W = S^{-1} Cn
            // P_eff += Cn^T W
            matmul_tn_acc(Cn, W.data(), Peff.data(), m, dz, dz);
        }
        double* Lp = ws.Lp.data() + (size_t)k * dz * dz;
        std::memcpy(Lp, Peff.data(), sizeof(double) * dz * dz);
        if (cholesky(Lp, dz)) return 1;
        // S = C P_eff^{-1} C^T + diag(R)
        const double* Ck = C + (size_t)k * m * dz;
        std::vector<double> X((size_t)dz * m);
        // X = P_eff^{-1} C^T
        for (int i = 0; i < dz; ++i)
            for (int j = 0; j < m; ++j) X[i * m + j] = Ck[j * dz + i];
        chol_solve(Lp, X.data(), dz, m);
        matmul(Ck, X.data(), S.data(), m, dz, m);
        for (int i = 0; i < m; ++i) S[i * m + i] += Rdiag[(size_t)k * m + i];
        // symmetrize against rounding
        for (int i = 0; i < m; ++i)
            for (int j = i + 1; j < m; ++j) {
                double v = 0.5 * (S[i * m + j] + S[j * m + i]);
                S[i * m + j] = v;
                S[j * m + i] = v;
            }
        double* Ls = ws.Ls.data() + (size_t)k * m * m;
        std::memcpy(Ls, S.data(), sizeof(double) * m * m);
        if (cholesky(Ls, m)) return 1;
    }
    return 0;
}

// Solve one problem given factors. rhs/out are [N, mb, r], mb = dz + m.
void qd_solve_one(const double* C, const double* Cnext, const double* rhs,
                  double* out, int N, int dz, int m, int r,
                  const Workspace& ws) {
    const int mb = dz + m;
    std::vector<double> ys((size_t)N * mb * r);
    std::memcpy(ys.data(), rhs, sizeof(double) * N * mb * r);
    std::vector<double> scratch((size_t)(dz + m) * r);
    std::vector<double> wx((size_t)dz * r), wy((size_t)m * r);

    // forward: y_k -= (on z rows) Cnext_{k-1}^T * (Dt_{k-1}^{-1} y_{k-1})_lam
    for (int k = 1; k < N; ++k) {
        const double* yprev = ys.data() + (size_t)(k - 1) * mb * r;
        qd_block_apply(ws.Lp.data() + (size_t)(k - 1) * dz * dz,
                       ws.Ls.data() + (size_t)(k - 1) * m * m,
                       C + (size_t)(k - 1) * m * dz,
                       yprev, yprev + dz * r, wx.data(), wy.data(),
                       dz, m, r, scratch.data());
        double* yk = ys.data() + (size_t)k * mb * r;
        const double* Cn = Cnext + (size_t)(k - 1) * m * dz;
        // yk[:dz] -= Cn^T wy
        std::vector<double> corr((size_t)dz * r, 0.0);
        matmul_tn_acc(Cn, wy.data(), corr.data(), m, dz, r);
        for (int i = 0; i < dz * r; ++i) yk[i] -= corr[i];
    }

    // backward
    {
        const double* yk = ys.data() + (size_t)(N - 1) * mb * r;
        double* xk = out + (size_t)(N - 1) * mb * r;
        qd_block_apply(ws.Lp.data() + (size_t)(N - 1) * dz * dz,
                       ws.Ls.data() + (size_t)(N - 1) * m * m,
                       C + (size_t)(N - 1) * m * dz,
                       yk, yk + dz * r, xk, xk + dz * r,
                       dz, m, r, scratch.data());
    }
    std::vector<double> bcorr((size_t)m * r);
    for (int k = N - 2; k >= 0; --k) {
        const double* yk = ys.data() + (size_t)k * mb * r;
        const double* xnext = out + (size_t)(k + 1) * mb * r;  // z rows first
        const double* Cn = Cnext + (size_t)k * m * dz;
        // b_corr = y_k[lam] - Cn @ x_{k+1}[z]
        matmul(Cn, xnext, bcorr.data(), m, dz, r);
        for (int i = 0; i < m * r; ++i) bcorr[i] = yk[dz * r + i] - bcorr[i];
        double* xk = out + (size_t)k * mb * r;
        qd_block_apply(ws.Lp.data() + (size_t)k * dz * dz,
                       ws.Ls.data() + (size_t)k * m * m,
                       C + (size_t)k * m * dz,
                       yk, bcorr.data(), xk, xk + dz * r,
                       dz, m, r, scratch.data());
    }
}

}  // namespace

extern "C" {

// Batched factor+solve of the quasidefinite block-tridiagonal KKT.
//
//  P      [B, N, dz, dz]   primal blocks (symmetric, expected PD)
//  C      [B, N, m, dz]    constraint Jacobian rows vs own knot
//  Rdiag  [B, N, m]        constraint regularization (> 0)
//  Cnext  [B, N-1, m, dz]  constraint rows of knot k vs z_{k+1}
//  rhs    [B, N, dz+m, r]
//  out    [B, N, dz+m, r]  solution; filled with NaN for batch elements
//                          whose factorization hit a non-PD pivot
//  status [B]              0 ok / 1 factorization failed
//
// Returns the number of failed batch elements.
int32_t px_qd_solve_batch(int32_t B, int32_t N, int32_t dz, int32_t m,
                          int32_t r, const double* P, const double* C,
                          const double* Rdiag, const double* Cnext,
                          const double* rhs, double* out, int32_t* status) {
    int32_t nfail = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : nfail)
#endif
    for (int32_t b = 0; b < B; ++b) {
        Workspace ws;
        ws.resize(N, dz, m, r);
        const double* Pb = P + (size_t)b * N * dz * dz;
        const double* Cb = C + (size_t)b * N * m * dz;
        const double* Rb = Rdiag + (size_t)b * N * m;
        const double* Cnb = Cnext + (size_t)b * (N - 1) * m * dz;
        const double* rb = rhs + (size_t)b * N * (dz + m) * r;
        double* ob = out + (size_t)b * N * (dz + m) * r;
        int fail = qd_factor_one(Pb, Cb, Rb, Cnb, N, dz, m, ws);
        if (fail) {
            const double nan = std::nan("");
            for (size_t i = 0; i < (size_t)N * (dz + m) * r; ++i) ob[i] = nan;
            status[b] = 1;
            nfail += 1;
        } else {
            qd_solve_one(Cb, Cnb, rb, ob, N, dz, m, r, ws);
            status[b] = 0;
        }
    }
    return nfail;
}

// Symmetric positive-definite block-tridiagonal solve (the condensed /
// Schur-complement system): diag [B, N, m, m], upper [B, N-1, m, m],
// rhs [B, N, m, r]. Thomas-style block Cholesky recursion.
int32_t px_spd_tridiag_solve_batch(int32_t B, int32_t N, int32_t m,
                                   int32_t r, const double* diag,
                                   const double* upper, const double* rhs,
                                   double* out, int32_t* status) {
    int32_t nfail = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : nfail)
#endif
    for (int32_t b = 0; b < B; ++b) {
        const double* Db = diag + (size_t)b * N * m * m;
        const double* Ub = upper + (size_t)b * (N - 1) * m * m;
        const double* rb = rhs + (size_t)b * N * m * r;
        double* ob = out + (size_t)b * N * m * r;
        std::vector<double> Ls((size_t)N * m * m);
        std::vector<double> W((size_t)m * m);
        int fail = 0;
        // factor: Dt_k = D_k - U_{k-1}^T Dt_{k-1}^{-1} U_{k-1}
        for (int k = 0; k < N && !fail; ++k) {
            double* Lk = Ls.data() + (size_t)k * m * m;
            std::memcpy(Lk, Db + (size_t)k * m * m, sizeof(double) * m * m);
            if (k > 0) {
                const double* Uprev = Ub + (size_t)(k - 1) * m * m;
                std::memcpy(W.data(), Uprev, sizeof(double) * m * m);
                chol_solve(Ls.data() + (size_t)(k - 1) * m * m, W.data(),
                           m, m);
                // Lk -= Uprev^T W
                for (int p = 0; p < m; ++p)
                    for (int i = 0; i < m; ++i) {
                        const double a = Uprev[p * m + i];
                        if (a == 0.0) continue;
                        for (int c = 0; c < m; ++c)
                            Lk[i * m + c] -= a * W[p * m + c];
                    }
            }
            fail = cholesky(Lk, m);
        }
        if (fail) {
            const double nan = std::nan("");
            for (size_t i = 0; i < (size_t)N * m * r; ++i) ob[i] = nan;
            status[b] = 1;
            nfail += 1;
            continue;
        }
        // forward sweep
        std::vector<double> ys((size_t)N * m * r);
        std::memcpy(ys.data(), rb, sizeof(double) * N * m * r);
        std::vector<double> t((size_t)m * r);
        for (int k = 1; k < N; ++k) {
            std::memcpy(t.data(), ys.data() + (size_t)(k - 1) * m * r,
                        sizeof(double) * m * r);
            chol_solve(Ls.data() + (size_t)(k - 1) * m * m, t.data(), m, r);
            const double* Uprev = Ub + (size_t)(k - 1) * m * m;
            double* yk = ys.data() + (size_t)k * m * r;
            for (int p = 0; p < m; ++p)
                for (int i = 0; i < m; ++i) {
                    const double a = Uprev[p * m + i];
                    if (a == 0.0) continue;
                    for (int c = 0; c < r; ++c)
                        yk[i * r + c] -= a * t[p * r + c];
                }
        }
        // backward sweep
        std::memcpy(ob + (size_t)(N - 1) * m * r,
                    ys.data() + (size_t)(N - 1) * m * r,
                    sizeof(double) * m * r);
        chol_solve(Ls.data() + (size_t)(N - 1) * m * m,
                   ob + (size_t)(N - 1) * m * r, m, r);
        for (int k = N - 2; k >= 0; --k) {
            double* xk = ob + (size_t)k * m * r;
            const double* xnext = ob + (size_t)(k + 1) * m * r;
            const double* Uk = Ub + (size_t)k * m * m;
            std::memcpy(xk, ys.data() + (size_t)k * m * r,
                        sizeof(double) * m * r);
            for (int i = 0; i < m; ++i)
                for (int p = 0; p < m; ++p) {
                    const double a = Uk[i * m + p];
                    if (a == 0.0) continue;
                    for (int c = 0; c < r; ++c)
                        xk[i * r + c] -= a * xnext[p * r + c];
                }
            chol_solve(Ls.data() + (size_t)k * m * m, xk, m, r);
        }
        status[b] = 0;
    }
    return nfail;
}

int32_t px_version(void) { return 1; }

}  // extern "C"
