// Native host solver: batched proximal over-relaxed adaptive-rho ADMM for
// QP/QCQP problems, double precision, OpenMP over the batch.
//
// Role in the framework: (a) the CPU fallback / high-precision oracle for the
// TPU solvers, (b) the measured stand-in for the reference implementation
// (quentinll/diffqcqp: single-thread C++/Eigen, one problem per Python call)
// when computing bench.py's vs_baseline. The algorithm matches the recipe
// documented in SURVEY.md section 3 (same constants, same update ordering,
// Cholesky factorisation with explicit inverse, re-factored on adaptive-rho
// changes); the code is written from scratch with no third-party linear
// algebra (plain dense routines below, problems are tiny: n <= 64).
//
// Exposed through a C ABI (ctypes-friendly); see
// diffqcqp_tpu/native/host_solver.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------- dense ops

// In-place lower Cholesky of SPD A (n x n, row-major). Returns false if a
// non-positive pivot appears.
bool cholesky(double* a, int n) {
    for (int j = 0; j < n; ++j) {
        double d = a[j * n + j];
        for (int k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
        if (d <= 0.0) return false;
        const double ljj = std::sqrt(d);
        a[j * n + j] = ljj;
        for (int i = j + 1; i < n; ++i) {
            double s = a[i * n + j];
            for (int k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
            a[i * n + j] = s / ljj;
        }
        for (int k = j + 1; k < n; ++k) a[j * n + k] = 0.0;
    }
    return true;
}

// Solve L L^T x = b given lower-triangular L.
void chol_solve(const double* L, const double* b, double* x, int n) {
    // forward: L y = b
    for (int i = 0; i < n; ++i) {
        double s = b[i];
        for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
        x[i] = s / L[i * n + i];
    }
    // backward: L^T x = y
    for (int i = n - 1; i >= 0; --i) {
        double s = x[i];
        for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
        x[i] = s / L[i * n + i];
    }
}

// inv = (L L^T)^{-1} by solving against identity columns.
void chol_inverse(const double* L, double* inv, int n,
                  std::vector<double>& e, std::vector<double>& col) {
    for (int j = 0; j < n; ++j) {
        std::fill(e.begin(), e.begin() + n, 0.0);
        e[j] = 1.0;
        chol_solve(L, e.data(), col.data(), n);
        for (int i = 0; i < n; ++i) inv[i * n + j] = col[i];
    }
}

void matvec(const double* a, const double* x, double* y, int n) {
    for (int i = 0; i < n; ++i) {
        double s = 0.0;
        const double* row = a + i * n;
        for (int j = 0; j < n; ++j) s += row[j] * x[j];
        y[i] = s;
    }
}

double norm2(const double* x, int n) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += x[i] * x[i];
    return std::sqrt(s);
}

double power_iteration(const double* P, int n, int iters,
                       std::vector<double>& v, std::vector<double>& av) {
    const double inv_sqrt_n = 1.0 / std::sqrt(static_cast<double>(n));
    for (int i = 0; i < n; ++i) v[i] = inv_sqrt_n;
    for (int it = 0; it < iters; ++it) {
        matvec(P, v.data(), av.data(), n);
        const double nrm = norm2(av.data(), n);
        if (nrm == 0.0) return 0.0;
        for (int i = 0; i < n; ++i) v[i] = av[i] / nrm;
    }
    matvec(P, v.data(), av.data(), n);
    double l = 0.0;
    for (int i = 0; i < n; ++i) l += v[i] * av[i];
    return l;
}

// ------------------------------------------------------------- ADMM kernel

enum ProxKind : int32_t { PROX_NONNEG = 0, PROX_BOX = 1, PROX_SIGNED_BOX = 2, PROX_DISK = 3 };

struct ProxParams {
    const double* l_min = nullptr;   // box / signed box
    const double* l_max = nullptr;
    const double* v_sign = nullptr;  // signed box (already sign())
    const double* radius = nullptr;  // disk, length n/2
};

void apply_prox(ProxKind kind, const ProxParams& pp, double* x, int n) {
    switch (kind) {
        case PROX_NONNEG:
            for (int i = 0; i < n; ++i) x[i] = std::max(x[i], 0.0);
            break;
        case PROX_BOX:
            for (int i = 0; i < n; ++i)
                x[i] = std::min(std::max(x[i], pp.l_min[i]), pp.l_max[i]);
            break;
        case PROX_SIGNED_BOX:
            for (int i = 0; i < n; ++i) {
                double y = std::min(std::max(x[i], pp.l_min[i]), pp.l_max[i]);
                x[i] = pp.v_sign[i] * std::min(pp.v_sign[i] * y, 0.0);
            }
            break;
        case PROX_DISK: {
            const int nc = n / 2;
            for (int c = 0; c < nc; ++c) {
                const double a = x[2 * c], b = x[2 * c + 1];
                const double nrm = std::sqrt(a * a + b * b);
                if (nrm > pp.radius[c]) {
                    const double s = pp.radius[c] / nrm;
                    x[2 * c] = a * s;
                    x[2 * c + 1] = b * s;
                }
            }
            break;
        }
    }
}

struct SolveInfo {
    int iterations = 0;
    double res_prim = std::numeric_limits<double>::infinity();
    double res_dual = std::numeric_limits<double>::infinity();
    int converged = 0;
};

// One problem. P is copied internally (shifted in place like the reference).
SolveInfo admm_solve(const double* P_in, const double* q, ProxKind kind,
                     const ProxParams& pp, const double* warm_start,
                     double eps, double mu_prox, int max_iter,
                     int adaptive_rho, int power_iters, int qcqp_stopping,
                     int damp_both, double* l2_out, int n) {
    const double mu_thresh = 10.0, alpha = 1.5, eps_rel = 1e-4;
    std::vector<double> M(P_in, P_in + n * n);
    std::vector<double> Minv(n * n), e(n), col(n);
    std::vector<double> l(n, 0.0), l2(n, 0.0), u(n, 0.0), q_prox(q, q + n);
    std::vector<double> rhs(n), r(n), x(n), v(n), av(n);
    if (warm_start) std::copy(warm_start, warm_start + n, l2.begin());

    double L = power_iteration(P_in, n, power_iters, v, av);
    L = std::max(L, mu_prox);
    double rho = std::sqrt(mu_prox * L) * std::pow(L / mu_prox, 0.4);
    double tau_inc = std::pow(L / mu_prox, 0.15), tau_dec = tau_inc;

    auto refactor = [&](double shift_delta) {
        for (int i = 0; i < n; ++i) M[i * n + i] += shift_delta;
        std::vector<double> chol(M);
        cholesky(chol.data(), n);
        chol_inverse(chol.data(), Minv.data(), n, e, col);
    };
    refactor(rho + mu_prox);

    SolveInfo info;
    int rho_up = 0, cpt = 0;
    for (int it = 0; it < max_iter; ++it) {
        info.iterations = it + 1;
        for (int i = 0; i < n; ++i) rhs[i] = rho * l2[i] - u[i] - q_prox[i];
        matvec(Minv.data(), rhs.data(), l.data(), n);
        for (int i = 0; i < n; ++i) q_prox[i] = q[i] - mu_prox * l[i];
        for (int i = 0; i < n; ++i) r[i] = alpha * l[i] + (1.0 - alpha) * l2[i];
        for (int i = 0; i < n; ++i) x[i] = r[i] + u[i] / rho;
        apply_prox(kind, pp, x.data(), n);
        for (int i = 0; i < n; ++i) u[i] += rho * (r[i] - x[i]);
        double rd = 0.0, rp = 0.0;
        for (int i = 0; i < n; ++i) {
            rd = std::max(rd, std::fabs(x[i] - l2[i]));
            rp = std::max(rp, std::fabs(x[i] - r[i]));
        }
        rd *= rho;
        std::copy(x.begin(), x.end(), l2.begin());
        info.res_prim = rp;
        info.res_dual = rd;
        // DELIBERATELY reference-faithful (this solver is the baseline /
        // parity oracle): the QP-family branch checks the dual residual
        // alone (Solver.cpp:88) and therefore inherits the reference's
        // false-convergence mode at box corners (SURVEY.md reference bug
        // #8). The JAX engine fixes it by default (SolverConfig.primal_check).
        const bool done = qcqp_stopping
                              ? (rp < eps + eps_rel * norm2(l.data(), n) && rd < eps)
                              : (rd < eps);
        if (done) {
            info.converged = 1;
            break;
        }
        if (adaptive_rho) {
            if (rp > mu_thresh * rd) {
                if (cpt % 5 == 0) {
                    if (rho_up == -1) {
                        tau_inc = 1.0 + 0.8 * (tau_inc - 1.0);
                        if (damp_both) tau_dec = 1.0 + 0.8 * (tau_dec - 1.0);
                    }
                    refactor(rho * (tau_inc - 1.0));
                    rho *= tau_inc;
                    rho_up = 1;
                }
                ++cpt;
            } else if (rd > mu_thresh * rp) {
                if (cpt % 5 == 0) {
                    if (rho_up == 1) {
                        tau_dec = 1.0 + 0.8 * (tau_dec - 1.0);
                        if (damp_both) tau_inc = 1.0 + 0.8 * (tau_inc - 1.0);
                    }
                    refactor(rho * (1.0 / tau_dec - 1.0));
                    rho /= tau_dec;
                    rho_up = -1;
                }
                ++cpt;
            }
        }
    }
    std::copy(l2.begin(), l2.end(), l2_out);
    return info;
}

// ------------------------------------------------- backward (KKT) solves

// Regularised normal-equations solve of A x = b (A m x m, possibly
// singular): x = (A^T A + mu I)^{-1} A^T b refined Richardson-style
// (double precision throughout, reference semantics).
void refine_solve(const double* A, const double* b, double* x, int m,
                  double mu_ir, int iters) {
    std::vector<double> G(m * m, 0.0), Ab(m, 0.0), base(m), tmp(m);
    for (int i = 0; i < m; ++i)
        for (int j = 0; j < m; ++j) {
            double s = 0.0;
            for (int k = 0; k < m; ++k) s += A[k * m + i] * A[k * m + j];
            G[i * m + j] = s;
        }
    for (int i = 0; i < m; ++i) G[i * m + i] += mu_ir;
    for (int i = 0; i < m; ++i) {
        double s = 0.0;
        for (int k = 0; k < m; ++k) s += A[k * m + i] * b[k];
        Ab[i] = s;
    }
    std::vector<double> chol(G);
    cholesky(chol.data(), m);
    chol_solve(chol.data(), Ab.data(), base.data(), m);
    std::copy(base.begin(), base.end(), x);
    for (int it = 0; it < iters; ++it) {
        chol_solve(chol.data(), x, tmp.data(), m);
        for (int i = 0; i < m; ++i) x[i] = mu_ir * tmp[i] + base[i];
    }
}

// QP backward: dl with zeros on the active set (gamma = -(Pl+q) < -eps there).
void qp_backward(const double* P, const double* q, const double* l,
                 const double* grad_l, double eps, double* dl, int n) {
    std::vector<double> plq(n);
    matvec(P, l, plq.data(), n);
    for (int i = 0; i < n; ++i) plq[i] += q[i];
    std::vector<int> active(n);
    for (int i = 0; i < n; ++i) {
        const double gamma = (l[i] > eps) ? 0.0 : -plq[i];
        active[i] = gamma < -1e-10;
    }
    std::vector<double> K(n * n, 0.0), rhs(n, 0.0), x(n);
    for (int i = 0; i < n; ++i) {
        if (active[i]) {
            K[i * n + i] = l[i];
        } else {
            for (int j = 0; j < n; ++j)
                if (!active[j]) K[i * n + j] = P[i * n + j];
            rhs[i] = grad_l[i];
        }
    }
    // transpose in place
    for (int i = 0; i < n; ++i)
        for (int j = i + 1; j < n; ++j) std::swap(K[i * n + j], K[j * n + i]);
    refine_solve(K.data(), rhs.data(), x.data(), n, 1e-7, 10);
    for (int i = 0; i < n; ++i) dl[i] = active[i] ? 0.0 : x[i];
}

// QCQP backward: (dgamma (nc), dl (n)) of the squared-slack KKT system.
void qcqp_backward(const double* P, const double* q, const double* radius,
                   const double* l, const double* grad_l, double eps,
                   double* dgamma, double* dl, double* gamma_out, int n) {
    const int nc = n / 2;
    std::vector<double> plq(n);
    matvec(P, l, plq.data(), n);
    for (int i = 0; i < n; ++i) plq[i] += q[i];
    std::vector<double> gamma(nc, 0.0), s(nc);
    std::vector<int> active(nc);
    for (int c = 0; c < nc; ++c) {
        const double a = l[2 * c], b = l[2 * c + 1];
        const double nn = a * a + b * b;
        s[c] = nn - radius[c] * radius[c];
        const double nrm = std::sqrt(nn);
        const bool act_rec = (radius[c] - nrm <= eps) && (radius[c] >= eps);
        if (act_rec) {
            const double num = -2.0 * (a * plq[2 * c] + b * plq[2 * c + 1]);
            gamma[c] = num / std::max(4.0 * nn, 1e-300);
        }
        active[c] = (s[c] > -1e-10) && (radius[c] > 1e-10);
    }
    const int m = nc + n;
    std::vector<double> S(m * m, 0.0), rhs(m, 0.0), x(m);
    for (int c = 0; c < nc; ++c) {
        if (active[c]) {
            S[c * m + c] = s[c];
            // B row: gamma_c * C^T row = gamma_c * (2 l_(c))
            S[c * m + nc + 2 * c] = gamma[c] * 2.0 * l[2 * c];
            S[c * m + nc + 2 * c + 1] = gamma[c] * 2.0 * l[2 * c + 1];
            // C column
            S[(nc + 2 * c) * m + c] = 2.0 * l[2 * c];
            S[(nc + 2 * c + 1) * m + c] = 2.0 * l[2 * c + 1];
        }
    }
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) S[(nc + i) * m + nc + j] = P[i * n + j];
    for (int c = 0; c < nc; ++c) {
        S[(nc + 2 * c) * m + nc + 2 * c] += 2.0 * gamma[c];
        S[(nc + 2 * c + 1) * m + nc + 2 * c + 1] += 2.0 * gamma[c];
    }
    for (int i = 0; i < m; ++i)
        for (int j = i + 1; j < m; ++j) std::swap(S[i * m + j], S[j * m + i]);
    for (int i = 0; i < n; ++i) rhs[nc + i] = grad_l[i];
    refine_solve(S.data(), rhs.data(), x.data(), m, 1e-7, 10);
    for (int c = 0; c < nc; ++c) dgamma[c] = active[c] ? x[c] : 0.0;
    for (int i = 0; i < n; ++i) dl[i] = x[nc + i];
    if (gamma_out) std::copy(gamma.begin(), gamma.end(), gamma_out);
}

void set_threads(int threads) {
#ifdef _OPENMP
    if (threads > 0) omp_set_num_threads(threads);
#else
    (void)threads;
#endif
}

}  // namespace

// ------------------------------------------------------------------ C ABI

extern "C" {

// Batched forward solve. prox_kind selects the problem class; unused prox
// parameter pointers may be null. Layouts: P (B, n, n) row-major, vectors
// (B, n), radius (B, n/2). out_* may be null except l2.
int dq_solve_batch(const double* P, const double* q, const double* l_min,
                   const double* l_max, const double* v_sign,
                   const double* radius, const double* warm_start,
                   int32_t prox_kind, double eps, double mu_prox,
                   int32_t max_iter, int32_t adaptive_rho,
                   int32_t power_iters, int32_t qcqp_stopping,
                   int32_t damp_both, int32_t batch, int32_t n,
                   int32_t threads, double* l2, int32_t* out_iters,
                   int32_t* out_converged) {
    set_threads(threads);
    const int nc = n / 2;
#pragma omp parallel for schedule(dynamic)
    for (int b = 0; b < batch; ++b) {
        ProxParams pp;
        if (l_min) pp.l_min = l_min + static_cast<size_t>(b) * n;
        if (l_max) pp.l_max = l_max + static_cast<size_t>(b) * n;
        if (v_sign) pp.v_sign = v_sign + static_cast<size_t>(b) * n;
        if (radius) pp.radius = radius + static_cast<size_t>(b) * nc;
        const double* ws =
            warm_start ? warm_start + static_cast<size_t>(b) * n : nullptr;
        SolveInfo info = admm_solve(
            P + static_cast<size_t>(b) * n * n, q + static_cast<size_t>(b) * n,
            static_cast<ProxKind>(prox_kind), pp, ws, eps, mu_prox, max_iter,
            adaptive_rho, power_iters, qcqp_stopping, damp_both,
            l2 + static_cast<size_t>(b) * n, n);
        if (out_iters) out_iters[b] = info.iterations;
        if (out_converged) out_converged[b] = info.converged;
    }
    return 0;
}

// Batched QP backward (dl only; grad_P/grad_q assembly is trivial outside).
int dq_qp_backward_batch(const double* P, const double* q, const double* l,
                         const double* grad_l, double eps, int32_t batch,
                         int32_t n, int32_t threads, double* dl) {
    set_threads(threads);
#pragma omp parallel for schedule(dynamic)
    for (int b = 0; b < batch; ++b) {
        qp_backward(P + static_cast<size_t>(b) * n * n,
                    q + static_cast<size_t>(b) * n,
                    l + static_cast<size_t>(b) * n,
                    grad_l + static_cast<size_t>(b) * n, eps,
                    dl + static_cast<size_t>(b) * n, n);
    }
    return 0;
}

// Batched QCQP backward. radius = l_n * mu, shape (B, n/2).
int dq_qcqp_backward_batch(const double* P, const double* q,
                           const double* radius, const double* l,
                           const double* grad_l, double eps, int32_t batch,
                           int32_t n, int32_t threads, double* dgamma,
                           double* dl, double* gamma) {
    set_threads(threads);
    const int nc = n / 2;
#pragma omp parallel for schedule(dynamic)
    for (int b = 0; b < batch; ++b) {
        qcqp_backward(P + static_cast<size_t>(b) * n * n,
                      q + static_cast<size_t>(b) * n,
                      radius + static_cast<size_t>(b) * nc,
                      l + static_cast<size_t>(b) * n,
                      grad_l + static_cast<size_t>(b) * n, eps,
                      dgamma + static_cast<size_t>(b) * nc,
                      dl + static_cast<size_t>(b) * n,
                      gamma ? gamma + static_cast<size_t>(b) * nc : nullptr, n);
    }
    return 0;
}

}  // extern "C"
