// Single-core sparse-Schur Levenberg-Marquardt bundle adjustment in C++.
//
// This is the HONEST CPU baseline the bench's vs_baseline ratio needs
// (VERDICT r4 item 4): the same algorithm Ceres SPARSE_SCHUR + analytic
// cost functions runs (st20-g2o/src/include/test_ceres.h:143-145 selects
// ceres::SPARSE_SCHUR; st17-ceres/src/include/solver.hpp:341-385 is the
// reference's analytic-Jacobian cost), implemented directly:
//   - analytic per-observation 2x6 / 2x3 Jacobians (same derivation as
//     solvers/schur_flat._linearize_flat, tangent ordering [omega, dt],
//     right-perturbation R*exp(w))
//   - block-sparse normal equations: per-camera 6x6 Hpp, per-landmark 3x3
//     Hll, per-observation 6x3 W
//   - Schur elimination of landmarks: S = Hpp - W Hll^-1 W^T accumulated
//     over per-landmark track pairs (the Ceres SchurEliminator<2,6,3> role)
//   - dense Cholesky of the reduced camera system (Ceres uses a dense
//     Schur-complement solver for camera counts in the hundreds)
//   - Nielsen gain-ratio trust region — the IDENTICAL control law to
//     solvers/schur.lm_accept, so iterations are comparable 1:1.
//
// Single-threaded by construction (no OpenMP); doubles throughout (as
// Ceres). Exposed via C ABI to bench.py (slam_tricks_tpu/native.py).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// R <- R * exp(hat(w)) (Rodrigues), row-major 3x3
void so3_retract(double* R, const double* w) {
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double th = std::sqrt(th2);
  double A, B;
  if (th < 1e-8) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
  }
  // E = I + A*hat(w) + B*hat(w)^2
  double wx = w[0], wy = w[1], wz = w[2];
  double E[9] = {
      1 - B * (wy * wy + wz * wz), -A * wz + B * wx * wy, A * wy + B * wx * wz,
      A * wz + B * wx * wy, 1 - B * (wx * wx + wz * wz), -A * wx + B * wy * wz,
      -A * wy + B * wx * wz, A * wx + B * wy * wz, 1 - B * (wx * wx + wy * wy)};
  double out[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      out[3 * i + j] = R[3 * i + 0] * E[j] + R[3 * i + 1] * E[3 + j] +
                       R[3 * i + 2] * E[6 + j];
  std::memcpy(R, out, sizeof(out));
}

// symmetric 3x3 inverse, row-major
bool inv3(const double* H, double* out) {
  double a = H[0], b = H[1], c = H[2], d = H[4], e = H[5], f = H[8];
  double A = d * f - e * e, B = c * e - b * f, C = b * e - c * d;
  double det = a * A + b * B + c * C;
  if (!(std::abs(det) > 1e-300)) return false;
  double id = 1.0 / det;
  double D = a * f - c * c, E = b * c - a * e, F = a * d - b * b;
  out[0] = A * id; out[1] = B * id; out[2] = C * id;
  out[3] = B * id; out[4] = D * id; out[5] = E * id;
  out[6] = C * id; out[7] = E * id; out[8] = F * id;
  return true;
}

// in-place lower-Cholesky (left-looking, contiguous dot products), row-major
bool chol(double* a, int n) {
  for (int i = 0; i < n; i++) {
    double* ri = a + (size_t)i * n;
    for (int j = 0; j <= i; j++) {
      const double* rj = a + (size_t)j * n;
      double s = ri[j];
      for (int k = 0; k < j; k++) s -= ri[k] * rj[k];
      if (i == j) {
        if (!(s > 0)) return false;
        ri[j] = std::sqrt(s);
      } else {
        ri[j] = s / rj[j];
      }
    }
  }
  return true;
}

void chol_solve_inplace(const double* a, int n, double* x) {
  for (int i = 0; i < n; i++) {
    const double* ri = a + (size_t)i * n;
    double s = x[i];
    for (int k = 0; k < i; k++) s -= ri[k] * x[k];
    x[i] = s / ri[i];
  }
  for (int i = n - 1; i >= 0; i--) {
    double s = x[i];
    for (int k = i + 1; k < n; k++) s -= a[(size_t)k * n + i] * x[k];
    x[i] = s / a[(size_t)i * n + i];
  }
}

struct Problem {
  int C, L, N;
  std::vector<double> R, t, pts;      // C*9, C*3, L*3
  std::vector<int> cam, lm;           // N
  std::vector<double> uv, w;          // N*2, N
  std::vector<uint8_t> fixed;         // C
  // obs sorted by landmark; track start offsets
  std::vector<int> order;             // N indices grouped by landmark
  std::vector<int> track_start;       // L+1
};

double eval_cost(const Problem& P, const std::vector<double>& R,
                 const std::vector<double>& t, const std::vector<double>& pts) {
  double cost = 0;
  for (int n = 0; n < P.N; n++) {
    double wn = P.w[n];
    if (!(wn > 0)) continue;
    const double* Rc = &R[9 * P.cam[n]];
    const double* tc = &t[3 * P.cam[n]];
    const double* p = &pts[3 * P.lm[n]];
    double x = Rc[0] * p[0] + Rc[1] * p[1] + Rc[2] * p[2] + tc[0];
    double y = Rc[3] * p[0] + Rc[4] * p[1] + Rc[5] * p[2] + tc[1];
    double z = Rc[6] * p[0] + Rc[7] * p[1] + Rc[8] * p[2] + tc[2];
    double iz = 1.0 / z;
    double d0 = x * iz - P.uv[2 * n], d1 = y * iz - P.uv[2 * n + 1];
    cost += 0.5 * wn * (d0 * d0 + d1 * d1);
  }
  return cost;
}

}  // namespace

extern "C" {

// Runs max_iters LM iterations (each = linearize + Schur solve + trial
// evaluation, accepted or rejected — identical accounting to the JAX side).
// Returns the number of iterations executed; writes the final state, final
// cost, and pure-solve wall milliseconds (excluding this setup).
int schur_ba_solve(const double* R0, const double* t0, const double* pts0,
                   const int* cam_idx, const int* lm_idx, const double* uv,
                   const double* w, const uint8_t* fixed_mask, int C, int L,
                   int N, int max_iters, double lambda_init, double* out_R,
                   double* out_t, double* out_pts, double* out_cost,
                   double* out_wall_ms) {
  Problem P;
  P.C = C; P.L = L; P.N = N;
  P.R.assign(R0, R0 + 9 * C);
  P.t.assign(t0, t0 + 3 * C);
  P.pts.assign(pts0, pts0 + 3 * L);
  P.cam.assign(cam_idx, cam_idx + N);
  P.lm.assign(lm_idx, lm_idx + N);
  P.uv.assign(uv, uv + 2 * N);
  P.w.assign(w, w + N);
  P.fixed.assign(fixed_mask, fixed_mask + C);

  // group observations by landmark (counting sort — matches the track-table
  // structure build_flat_work does host-side; not timed, as the JAX side's
  // build_flat_work isn't either)
  std::vector<int> counts(L + 1, 0);
  for (int n = 0; n < N; n++)
    if (P.w[n] > 0) counts[P.lm[n] + 1]++;
  P.track_start.resize(L + 1);
  P.track_start[0] = 0;
  for (int l = 0; l < L; l++) P.track_start[l + 1] = P.track_start[l] + counts[l + 1];
  P.order.resize(P.track_start[L]);
  {
    std::vector<int> cur(P.track_start.begin(), P.track_start.end() - 1);
    for (int n = 0; n < N; n++)
      if (P.w[n] > 0) P.order[cur[P.lm[n]]++] = n;
  }
  int n_used = P.track_start[L];

  const int S_n = 6 * C;
  std::vector<double> Hpp(36 * C), gp(6 * C), Hll(9 * L), gl(3 * L);
  std::vector<double> Wn(18 * n_used);  // per kept obs, 6x3, in `order` order
  std::vector<double> Yn(18 * n_used);  // Y_i = W_i * Hll_l^-1
  std::vector<double> S((size_t)S_n * S_n), Sf((size_t)S_n * S_n), b(S_n);
  std::vector<double> Hinv(9 * L), ul(3 * L);
  std::vector<double> Rt(P.R), tt(P.t), ptst(P.pts);

  double lam = lambda_init, nu = 2.0;
  double cost = eval_cost(P, P.R, P.t, P.pts);
  int it = 0;

  auto t_start = std::chrono::steady_clock::now();
  for (it = 0; it < max_iters; it++) {
    // ---- linearize + accumulate block normal equations ----
    std::fill(Hpp.begin(), Hpp.end(), 0.0);
    std::fill(gp.begin(), gp.end(), 0.0);
    std::fill(Hll.begin(), Hll.end(), 0.0);
    std::fill(gl.begin(), gl.end(), 0.0);
    for (int oi = 0; oi < n_used; oi++) {
      int n = P.order[oi];
      int c = P.cam[n], l = P.lm[n];
      double sw = std::sqrt(P.w[n]);
      const double* Rc = &P.R[9 * c];
      const double* tc = &P.t[3 * c];
      const double* p = &P.pts[3 * l];
      double px = p[0], py = p[1], pz = p[2];
      double x = Rc[0] * px + Rc[1] * py + Rc[2] * pz + tc[0];
      double y = Rc[3] * px + Rc[4] * py + Rc[5] * pz + tc[1];
      double z = Rc[6] * px + Rc[7] * py + Rc[8] * pz + tc[2];
      double iz = 1.0 / z;
      double u = x * iz, v = y * iz;
      double r0 = (u - P.uv[2 * n]) * sw, r1 = (v - P.uv[2 * n + 1]) * sw;
      double sziz = sw * iz;
      // Jl rows (2x3): head @ R, weighted
      double jl0[3], jl1[3];
      for (int j = 0; j < 3; j++) {
        jl0[j] = (Rc[j] - u * Rc[6 + j]) * sziz;
        jl1[j] = (Rc[3 + j] - v * Rc[6 + j]) * sziz;
      }
      // Jp rows (2x6): [-Jl*hat(p) | head]
      double jp0[6] = {jl0[2] * py - jl0[1] * pz, jl0[0] * pz - jl0[2] * px,
                       jl0[1] * px - jl0[0] * py, sziz, 0.0, -u * sziz};
      double jp1[6] = {jl1[2] * py - jl1[1] * pz, jl1[0] * pz - jl1[2] * px,
                       jl1[1] * px - jl1[0] * py, 0.0, sziz, -v * sziz};
      double* H = &Hpp[36 * c];
      double* g = &gp[6 * c];
      for (int i = 0; i < 6; i++) {
        for (int j = i; j < 6; j++) H[6 * i + j] += jp0[i] * jp0[j] + jp1[i] * jp1[j];
        g[i] += jp0[i] * r0 + jp1[i] * r1;
      }
      double* Hl = &Hll[9 * l];
      double* gll = &gl[3 * l];
      for (int i = 0; i < 3; i++) {
        for (int j = i; j < 3; j++) Hl[3 * i + j] += jl0[i] * jl0[j] + jl1[i] * jl1[j];
        gll[i] += jl0[i] * r0 + jl1[i] * r1;
      }
      double* Wv = &Wn[18 * oi];
      for (int i = 0; i < 6; i++)
        for (int j = 0; j < 3; j++)
          Wv[3 * i + j] = jp0[i] * jl0[j] + jp1[i] * jl1[j];
    }
    // mirror symmetric halves
    for (int c = 0; c < C; c++) {
      double* H = &Hpp[36 * c];
      for (int i = 0; i < 6; i++)
        for (int j = 0; j < i; j++) H[6 * i + j] = H[6 * j + i];
    }
    for (int l = 0; l < L; l++) {
      double* H = &Hll[9 * l];
      H[3] = H[1]; H[6] = H[2]; H[7] = H[5];
    }

    // ---- damped Schur complement ----
    std::fill(S.begin(), S.end(), 0.0);
    for (int c = 0; c < C; c++) {
      const double* H = &Hpp[36 * c];
      for (int i = 0; i < 6; i++) {
        double* Srow = &S[(size_t)(6 * c + i) * S_n + 6 * c];
        for (int j = 0; j < 6; j++) Srow[j] = H[6 * i + j];
        double d = std::max(H[7 * i], 1e-12);
        Srow[i] += lam * d;
      }
      for (int i = 0; i < 6; i++) b[6 * c + i] = -gp[6 * c + i];
    }
    for (int l = 0; l < L; l++) {
      int s0 = P.track_start[l], s1 = P.track_start[l + 1];
      double* Hl = &Hll[9 * l];
      double Hd[9];
      std::memcpy(Hd, Hl, sizeof(Hd));
      double tr = Hd[0] + Hd[4] + Hd[8];
      if (!(tr > 0)) {  // empty landmark -> identity (contributes nothing)
        std::fill(&Hinv[9 * l], &Hinv[9 * l] + 9, 0.0);
        Hinv[9 * l] = Hinv[9 * l + 4] = Hinv[9 * l + 8] = 1.0;
        ul[3 * l] = ul[3 * l + 1] = ul[3 * l + 2] = 0.0;
        continue;
      }
      for (int i = 0; i < 3; i++)
        Hd[4 * i] += lam * std::max(Hl[4 * i], 1e-12);
      double* Hi = &Hinv[9 * l];
      inv3(Hd, Hi);
      double* u3 = &ul[3 * l];
      for (int i = 0; i < 3; i++)
        u3[i] = Hi[3 * i] * gl[3 * l] + Hi[3 * i + 1] * gl[3 * l + 1] +
                Hi[3 * i + 2] * gl[3 * l + 2];
      // Y_i = W_i Hinv; rhs += W_i u; S -= Y_i W_j^T over track pairs
      for (int oi = s0; oi < s1; oi++) {
        const double* Wv = &Wn[18 * oi];
        double* Yv = &Yn[18 * oi];
        int c = P.cam[P.order[oi]];
        for (int i = 0; i < 6; i++) {
          for (int j = 0; j < 3; j++)
            Yv[3 * i + j] = Wv[3 * i] * Hi[j] + Wv[3 * i + 1] * Hi[3 + j] +
                            Wv[3 * i + 2] * Hi[6 + j];
          b[6 * c + i] += Wv[3 * i] * u3[0] + Wv[3 * i + 1] * u3[1] +
                          Wv[3 * i + 2] * u3[2];
        }
      }
      for (int oi = s0; oi < s1; oi++) {
        int ci = P.cam[P.order[oi]];
        const double* Yv = &Yn[18 * oi];
        for (int oj = s0; oj < s1; oj++) {
          int cj = P.cam[P.order[oj]];
          if (cj < ci) continue;  // upper blocks only; mirrored below
          const double* Wv = &Wn[18 * oj];
          double* Sb = &S[(size_t)(6 * ci) * S_n + 6 * cj];
          for (int i = 0; i < 6; i++) {
            const double* Yi = Yv + 3 * i;
            double* Srow = Sb + (size_t)i * S_n;
            for (int j = 0; j < 6; j++)
              Srow[j] -= Yi[0] * Wv[3 * j] + Yi[1] * Wv[3 * j + 1] +
                         Yi[2] * Wv[3 * j + 2];
          }
        }
      }
    }
    // mirror lower camera-block triangle (diagonal blocks were accumulated
    // fully symmetric already; off-diagonal ci<cj mirrored here)
    for (int ci = 0; ci < C; ci++)
      for (int cj = ci + 1; cj < C; cj++)
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 6; j++)
            S[(size_t)(6 * cj + j) * S_n + 6 * ci + i] =
                S[(size_t)(6 * ci + i) * S_n + 6 * cj + j];

    // gauge fixing: identity rows/cols for fixed cameras
    for (int c = 0; c < C; c++) {
      if (!P.fixed[c]) continue;
      for (int i = 0; i < 6; i++) {
        size_t row = (size_t)(6 * c + i);
        for (int k = 0; k < S_n; k++) {
          S[row * S_n + k] = 0.0;
          S[(size_t)k * S_n + row] = 0.0;
        }
        S[row * S_n + row] = 1.0;
        b[row] = 0.0;
      }
    }

    // ---- dense Cholesky solve of the reduced camera system ----
    std::memcpy(Sf.data(), S.data(), sizeof(double) * S.size());
    std::vector<double> dp(b);
    bool ok = chol(Sf.data(), S_n);
    if (ok) chol_solve_inplace(Sf.data(), S_n, dp.data());
    bool bad = !ok;
    for (int k = 0; k < S_n && !bad; k++)
      if (!std::isfinite(dp[k])) bad = true;

    // ---- landmark back-substitution ----
    std::vector<double> dl(3 * L);
    double pred = 0.0, step_sq = 0.0;
    if (!bad) {
      for (int l = 0; l < L; l++) {
        double rhs[3] = {-gl[3 * l], -gl[3 * l + 1], -gl[3 * l + 2]};
        for (int oi = P.track_start[l]; oi < P.track_start[l + 1]; oi++) {
          const double* Wv = &Wn[18 * oi];
          const double* dpc = &dp[6 * P.cam[P.order[oi]]];
          for (int j = 0; j < 3; j++)
            for (int i = 0; i < 6; i++) rhs[j] -= Wv[3 * i + j] * dpc[i];
        }
        const double* Hi = &Hinv[9 * l];
        for (int i = 0; i < 3; i++)
          dl[3 * l + i] = Hi[3 * i] * rhs[0] + Hi[3 * i + 1] * rhs[1] +
                          Hi[3 * i + 2] * rhs[2];
      }
      // predicted decrease 0.5 * d^T (lam*D d - g) — same formula as
      // schur.lm_accept's caller
      for (int c = 0; c < C; c++)
        for (int i = 0; i < 6; i++) {
          double d = dp[6 * c + i];
          double diag = std::max(Hpp[36 * c + 7 * i], 1e-12);
          pred += d * (lam * diag * d - gp[6 * c + i]);
          step_sq += d * d;
        }
      for (int l = 0; l < L; l++)
        for (int i = 0; i < 3; i++) {
          double d = dl[3 * l + i];
          double diag = std::max(Hll[9 * l + 4 * i], 1e-12);
          pred += d * (lam * diag * d - gl[3 * l + i]);
          step_sq += d * d;
        }
      pred *= 0.5;
    }

    // ---- trial state + Nielsen accept ----
    double cost_try = INFINITY;
    if (!bad) {
      Rt = P.R; tt = P.t; ptst = P.pts;
      for (int c = 0; c < C; c++) {
        so3_retract(&Rt[9 * c], &dp[6 * c]);
        for (int i = 0; i < 3; i++) tt[3 * c + i] += dp[6 * c + 3 + i];
      }
      for (int k = 0; k < 3 * L; k++) ptst[k] += dl[k];
      cost_try = eval_cost(P, Rt, tt, ptst);
    }
    double rho = (cost - cost_try) / std::max(pred, 1e-30);
    bool accept = (cost_try < cost) && std::isfinite(cost_try) && !bad;
    if (getenv("SLAM_SCHUR_DEBUG"))
      fprintf(stderr, "it=%d cost=%.6e try=%.6e pred=%.3e lam=%.3e bad=%d\n",
              it, cost, cost_try, pred, lam, (int)bad);
    if (accept) {
      double f = 1.0 - std::pow(2.0 * rho - 1.0, 3.0);
      lam *= std::max(1.0 / 3.0, f);
      nu = 2.0;
      P.R = Rt; P.t = tt; P.pts = ptst;
      cost = cost_try;
    } else {
      lam *= nu;
      nu *= 2.0;
    }
    lam = std::min(std::max(lam, 1e-12), 1e10);
    if (accept && step_sq < 1e-24) { it++; break; }
  }
  auto t_end = std::chrono::steady_clock::now();

  std::memcpy(out_R, P.R.data(), sizeof(double) * 9 * C);
  std::memcpy(out_t, P.t.data(), sizeof(double) * 3 * C);
  std::memcpy(out_pts, P.pts.data(), sizeof(double) * 3 * L);
  *out_cost = cost;
  *out_wall_ms =
      std::chrono::duration<double, std::milli>(t_end - t_start).count();
  return it;
}

}  // extern "C"
