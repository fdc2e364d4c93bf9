// Independent C++ FDDP/iLQR solver over the compiled model arrays.
//
// Role: the cross-language full-solve oracle. BASELINE.md's accuracy north
// star is "u[0..T] error < 1e-4 vs Crocoddyl FDDP on the same horizon";
// crocoddyl is not installable in this environment, so this file plays the
// independent-implementation part: a from-scratch single-shooting iLQR
// (backward Riccati + backtracking rollout, finite-difference dynamics
// Jacobians, Gauss-Newton terminal residual) that shares NOTHING with the
// JAX solver but the model constants. Both converge the same strictly
// convex goal-reaching OCP hard; their optimal u-trajectories must then
// agree to tolerance regardless of path (tests/test_native_oracle.py).
//
// Problem (mirrors the flagship goal-reaching OCP, `__graft_entry__.py`):
//   min sum_t dt*( 0.5*w_state*|x_t - xref|^2 + 0.5*w_ctrl*|u_t|^2 )
//       + 0.5*w_goal*|log6(goalM^-1 M(q_T))|^2
//   s.t. semi-implicit Euler, x_{t+1} = f(x_t, u_t)
//
// Serial chains, nj <= 16 here (NX = 2*nj, sized statically).

#include <cmath>
#include <cstring>

// model kernels from rbd_kernels.cpp
extern "C" void forward_dynamics(
    int nj, const int* parent, const int* jtype, const double* joint_rot,
    const double* joint_trans, const double* axis, const double* mass,
    const double* com, const double* inertia, const double* gravity,
    const double* armature, const double* q, const double* v,
    const double* tau, double* a);

namespace {

constexpr int MAXN = 16;
constexpr int MAXX = 2 * MAXN;

struct ModelArgs {
  int nj;
  const int *parent, *jtype;
  const double *joint_rot, *joint_trans, *axis, *mass, *com, *inertia,
      *gravity, *armature;
};

void fd_step(const ModelArgs& m, double dt, const double* x, const double* u,
             double* xn) {
  const int n = m.nj;
  double a[MAXN];
  forward_dynamics(m.nj, m.parent, m.jtype, m.joint_rot, m.joint_trans,
                   m.axis, m.mass, m.com, m.inertia, m.gravity, m.armature,
                   x, x + n, u, a);
  for (int i = 0; i < n; ++i) {
    xn[n + i] = x[n + i] + dt * a[i];
    xn[i] = x[i] + dt * xn[n + i];
  }
}

// ---- frame kinematics + SE(3) log --------------------------------------

void mat_mul3(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[3 * i + k] * B[3 * k + j];
      C[3 * i + j] = s;
    }
}

void mat_vec3(const double* A, const double* v, double* o) {
  for (int i = 0; i < 3; ++i)
    o[i] = A[3 * i] * v[0] + A[3 * i + 1] * v[1] + A[3 * i + 2] * v[2];
}

void axis_rot(const double* ax, double q, double* R) {
  double c = std::cos(q), s = std::sin(q), t = 1.0 - c;
  double x = ax[0], y = ax[1], z = ax[2];
  double m[9] = {t * x * x + c,     t * x * y - s * z, t * x * z + s * y,
                 t * x * y + s * z, t * y * y + c,     t * y * z - s * x,
                 t * x * z - s * y, t * y * z + s * x, t * z * z + c};
  std::memcpy(R, m, sizeof(m));
}

// world placement (R, p) of the frame: chain composition + frame offset
void frame_fk(const ModelArgs& m, const double* q, int frame_joint,
              const double* frame_rot, const double* frame_trans, double* R,
              double* p) {
  double Rw[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double pw[3] = {0, 0, 0};
  // ancestors of frame_joint in root->leaf order (serial chain assumption
  // relaxed: follow parent links, then reverse)
  int chain[MAXN], nc = 0;
  for (int j = frame_joint; j >= 0; j = m.parent[j]) chain[nc++] = j;
  for (int k = nc - 1; k >= 0; --k) {
    int i = chain[k];
    double Rj[9], Rq[9], Ri[9], pi[3];
    std::memcpy(Rj, m.joint_rot + 9 * i, sizeof(Rj));
    const double* ax = m.axis + 3 * i;
    if (m.jtype[i] == 0) {
      axis_rot(ax, q[i], Rq);
      mat_mul3(Rj, Rq, Ri);
      std::memcpy(pi, m.joint_trans + 3 * i, sizeof(pi));
    } else {
      std::memcpy(Ri, Rj, sizeof(Ri));
      double d[3] = {q[i] * ax[0], q[i] * ax[1], q[i] * ax[2]};
      double Rd[3];
      mat_vec3(Rj, d, Rd);
      for (int c = 0; c < 3; ++c) pi[c] = m.joint_trans[3 * i + c] + Rd[c];
    }
    double Rw2[9], pw2[3];
    mat_mul3(Rw, Ri, Rw2);
    mat_vec3(Rw, pi, pw2);
    for (int c = 0; c < 3; ++c) pw2[c] += pw[c];
    std::memcpy(Rw, Rw2, sizeof(Rw));
    std::memcpy(pw, pw2, sizeof(pw));
  }
  double Rf[9], pf[3];
  mat_mul3(Rw, frame_rot, Rf);
  mat_vec3(Rw, frame_trans, pf);
  for (int c = 0; c < 3; ++c) pf[c] += pw[c];
  std::memcpy(R, Rf, sizeof(Rf));
  std::memcpy(p, pf, sizeof(pf));
}

void cross3(const double* a, const double* b, double* o) {
  o[0] = a[1] * b[2] - a[2] * b[1];
  o[1] = a[2] * b[0] - a[0] * b[2];
  o[2] = a[0] * b[1] - a[1] * b[0];
}

void log3(const double* R, double* w) {
  double tr = R[0] + R[4] + R[8];
  double c = 0.5 * (tr - 1.0);
  if (c > 1.0) c = 1.0;
  if (c < -1.0) c = -1.0;
  double theta = std::acos(c);
  double skew[3] = {R[7] - R[5], R[2] - R[6], R[3] - R[1]};
  double scale;
  if (theta < 1e-8) {
    scale = 0.5 + theta * theta / 12.0;
  } else {
    scale = 0.5 * theta / std::sin(theta);
  }
  for (int i = 0; i < 3; ++i) w[i] = scale * skew[i];
}

// SE(3) log with the same (angular; linear) ordering as ops/_log6_c
void log6(const double* R, const double* p, double* out) {
  double w[3];
  log3(R, w);
  double t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double coef;
  if (t2 < 1e-8) {
    coef = 1.0 / 12.0 + t2 / 720.0;
  } else {
    double th = std::sqrt(t2), half = 0.5 * th;
    coef = (1.0 - half * std::cos(half) / std::sin(half)) / t2;
  }
  double wxp[3], wwxp[3];
  cross3(w, p, wxp);
  cross3(w, wxp, wwxp);
  for (int i = 0; i < 3; ++i) {
    out[i] = w[i];
    out[3 + i] = p[i] - 0.5 * wxp[i] + coef * wwxp[i];
  }
}

struct Problem {
  ModelArgs m;
  int T;
  double dt, w_state, w_ctrl, w_goal;
  const double* xref;       // [nx]
  int frame_joint;
  const double *frame_rot, *frame_trans;  // frame local placement
  const double *goal_rot, *goal_trans;    // target world placement
};

// terminal residual r = log6(goalM^-1 M(q)) — matches batched_costs:
// dR = goalR^T R, dp = goalR^T (p - goalp)
void term_residual(const Problem& P, const double* x, double* r) {
  double R[9], p[3];
  frame_fk(P.m, x, P.frame_joint, P.frame_rot, P.frame_trans, R, p);
  double gT[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) gT[3 * i + j] = P.goal_rot[3 * j + i];
  double dR[9], dpv[3] = {p[0] - P.goal_trans[0], p[1] - P.goal_trans[1],
                          p[2] - P.goal_trans[2]};
  mat_mul3(gT, R, dR);
  double dp[3];
  mat_vec3(gT, dpv, dp);
  log6(dR, dp, r);
}

double stage_cost(const Problem& P, const double* x, const double* u) {
  const int nx = 2 * P.m.nj, nu = P.m.nj;
  double s = 0;
  for (int i = 0; i < nx; ++i) {
    double d = x[i] - P.xref[i];
    s += 0.5 * P.w_state * d * d;
  }
  for (int i = 0; i < nu; ++i) s += 0.5 * P.w_ctrl * u[i] * u[i];
  return P.dt * s;
}

double term_cost(const Problem& P, const double* x) {
  double r[6];
  term_residual(P, x, r);
  double s = 0;
  for (int i = 0; i < 6; ++i) s += r[i] * r[i];
  return 0.5 * P.w_goal * s;
}

double total_cost(const Problem& P, const double* xs, const double* us) {
  const int nx = 2 * P.m.nj, nu = P.m.nj;
  double c = 0;
  for (int t = 0; t < P.T; ++t)
    c += stage_cost(P, xs + t * nx, us + t * nu);
  return c + term_cost(P, xs + P.T * nx);
}

}  // namespace

extern "C" {

// Returns 0 on success (KKT < tol), 1 otherwise. us/xs hold the solution.
int fddp_oracle_solve(
    int nj, const int* parent, const int* jtype, const double* joint_rot,
    const double* joint_trans, const double* axis, const double* mass,
    const double* com, const double* inertia, const double* gravity,
    const double* armature,
    int T, double dt, double w_state, double w_ctrl, double w_goal,
    const double* xref, int frame_joint, const double* frame_rot,
    const double* frame_trans, const double* goal_rot,
    const double* goal_trans, const double* x0, int max_iters, double tol,
    double* xs, double* us, double* kkt_out, int* iters_out) {
  Problem P{{nj, parent, jtype, joint_rot, joint_trans, axis, mass, com,
             inertia, gravity, armature},
            T, dt, w_state, w_ctrl, w_goal, xref,
            frame_joint, frame_rot, frame_trans, goal_rot, goal_trans};
  const int nx = 2 * nj, nu = nj;
  // the workspaces below are static (shared, non-reentrant) and hard-sized
  // for T <= 4096, nj <= MAXN: refuse larger problems instead of
  // overflowing static storage (ADVICE r03)
  if (T > 4096 || nj > MAXN || T < 1 || nj < 1) {
    if (kkt_out) *kkt_out = -1.0;
    if (iters_out) *iters_out = -1;
    return -2;
  }

  // initial feasible rollout from the provided us (caller zeros them)
  std::memcpy(xs, x0, nx * sizeof(double));
  for (int t = 0; t < T; ++t)
    fd_step(P.m, dt, xs + t * nx, us + t * nu, xs + (t + 1) * nx);
  double cost = total_cost(P, xs, us);

  static double ks[4096 * MAXN];
  static double Ks[4096 * MAXN * MAXX];
  static double Fx[4096 * MAXX * MAXX];
  static double Fu[4096 * MAXX * MAXN];
  static double xs_try[4097 * MAXX], us_try[4096 * MAXN];
  double reg = 1e-9, kkt = 1e99;
  int it = 0;
  for (; it < max_iters; ++it) {
    // --- FD dynamics Jacobians (central differences) ---
    const double h = 1e-6;
    for (int t = 0; t < T; ++t) {
      double xp[MAXX], xm[MAXX], fp[MAXX], fm[MAXX];
      const double* x = xs + t * nx;
      const double* u = us + t * nu;
      for (int j = 0; j < nx; ++j) {
        std::memcpy(xp, x, nx * sizeof(double));
        std::memcpy(xm, x, nx * sizeof(double));
        xp[j] += h;
        xm[j] -= h;
        fd_step(P.m, dt, xp, u, fp);
        fd_step(P.m, dt, xm, u, fm);
        for (int i = 0; i < nx; ++i)
          Fx[(t * nx + i) * nx + j] = (fp[i] - fm[i]) / (2 * h);
      }
      double up[MAXN], um[MAXN];
      for (int j = 0; j < nu; ++j) {
        std::memcpy(up, u, nu * sizeof(double));
        std::memcpy(um, u, nu * sizeof(double));
        up[j] += h;
        um[j] -= h;
        fd_step(P.m, dt, x, up, fp);
        fd_step(P.m, dt, x, um, fm);
        for (int i = 0; i < nx; ++i)
          Fu[(t * nx + i) * nu + j] = (fp[i] - fm[i]) / (2 * h);
      }
    }
    // --- terminal cost derivatives (Gauss-Newton via FD residual J) ---
    double Vx[MAXX], Vxx[MAXX * MAXX];
    {
      const double* xT = xs + T * nx;
      double r0[6], J[6 * MAXN];
      term_residual(P, xT, r0);
      double hq = 1e-7;
      for (int j = 0; j < nj; ++j) {
        double xp[MAXX], rp[6], rm[6];
        std::memcpy(xp, xT, nx * sizeof(double));
        xp[j] += hq;
        term_residual(P, xp, rp);
        xp[j] -= 2 * hq;
        term_residual(P, xp, rm);
        for (int i = 0; i < 6; ++i) J[i * nj + j] = (rp[i] - rm[i]) / (2 * hq);
      }
      std::memset(Vx, 0, sizeof(Vx));
      std::memset(Vxx, 0, sizeof(Vxx));
      for (int j = 0; j < nj; ++j) {
        double s = 0;
        for (int i = 0; i < 6; ++i) s += J[i * nj + j] * r0[i];
        Vx[j] = P.w_goal * s;
        for (int k = 0; k < nj; ++k) {
          double q = 0;
          for (int i = 0; i < 6; ++i) q += J[i * nj + j] * J[i * nj + k];
          Vxx[j * nx + k] = P.w_goal * q;
        }
      }
    }
    // --- backward Riccati ---
    kkt = 0;
    bool bad = false;
    for (int t = T - 1; t >= 0; --t) {
      const double* x = xs + t * nx;
      const double* u = us + t * nu;
      const double* fx = Fx + t * nx * nx;
      const double* fu = Fu + t * nx * nu;
      double lx[MAXX], lu[MAXN];
      for (int i = 0; i < nx; ++i)
        lx[i] = P.dt * P.w_state * (x[i] - P.xref[i]);
      for (int i = 0; i < nu; ++i) lu[i] = P.dt * P.w_ctrl * u[i];
      double Qx[MAXX], Qu[MAXN];
      for (int i = 0; i < nx; ++i) {
        double s = lx[i];
        for (int k = 0; k < nx; ++k) s += fx[k * nx + i] * Vx[k];
        Qx[i] = s;
      }
      for (int i = 0; i < nu; ++i) {
        double s = lu[i];
        for (int k = 0; k < nx; ++k) s += fu[k * nu + i] * Vx[k];
        Qu[i] = s;
        if (std::fabs(s) > kkt) kkt = std::fabs(s);
      }
      double VF[MAXX * MAXX];  // Vxx Fx
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nx; ++j) {
          double s = 0;
          for (int k = 0; k < nx; ++k) s += Vxx[i * nx + k] * fx[k * nx + j];
          VF[i * nx + j] = s;
        }
      double Qxx[MAXX * MAXX], Qux[MAXN * MAXX], Quu[MAXN * MAXN];
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nx; ++j) {
          double s = (i == j) ? P.dt * P.w_state : 0.0;
          for (int k = 0; k < nx; ++k) s += fx[k * nx + i] * VF[k * nx + j];
          Qxx[i * nx + j] = s;
        }
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j < nx; ++j) {
          double s = 0;
          for (int k = 0; k < nx; ++k) s += fu[k * nu + i] * VF[k * nx + j];
          Qux[i * nx + j] = s;
        }
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j < nu; ++j) {
          double s = (i == j) ? P.dt * P.w_ctrl + reg : 0.0;
          double t2 = 0;
          for (int k = 0; k < nx; ++k) {
            double vfu = 0;
            for (int l = 0; l < nx; ++l)
              vfu += Vxx[k * nx + l] * fu[l * nu + j];
            t2 += fu[k * nu + i] * vfu;
          }
          Quu[i * nu + j] = s + t2;
        }
      // Cholesky of Quu
      double L[MAXN * MAXN] = {0};
      for (int i = 0; i < nu; ++i)
        for (int j = 0; j <= i; ++j) {
          double s = Quu[i * nu + j];
          for (int k = 0; k < j; ++k) s -= L[i * nu + k] * L[j * nu + k];
          if (i == j) {
            if (s <= 0) { bad = true; s = 1e-12; }
            L[i * nu + j] = std::sqrt(s);
          } else {
            L[i * nu + j] = s / L[j * nu + j];
          }
        }
      auto chol_solve = [&](const double* b, double* out) {
        double y[MAXN];
        for (int i = 0; i < nu; ++i) {
          double s = b[i];
          for (int k = 0; k < i; ++k) s -= L[i * nu + k] * y[k];
          y[i] = s / L[i * nu + i];
        }
        for (int i = nu - 1; i >= 0; --i) {
          double s = y[i];
          for (int k = i + 1; k < nu; ++k) s -= L[k * nu + i] * out[k];
          out[i] = s / L[i * nu + i];
        }
      };
      double* kk = ks + t * nu;
      double* KK = Ks + t * nu * nx;
      chol_solve(Qu, kk);
      double col[MAXN], sol[MAXN];
      for (int j = 0; j < nx; ++j) {
        for (int i = 0; i < nu; ++i) col[i] = Qux[i * nx + j];
        chol_solve(col, sol);
        for (int i = 0; i < nu; ++i) KK[i * nx + j] = sol[i];
      }
      // V update
      double Vx_new[MAXX], Vxx_new[MAXX * MAXX];
      for (int i = 0; i < nx; ++i) {
        double s = Qx[i];
        for (int k = 0; k < nu; ++k) s -= Qux[k * nx + i] * kk[k];
        Vx_new[i] = s;
      }
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nx; ++j) {
          double s = Qxx[i * nx + j];
          for (int k = 0; k < nu; ++k) s -= Qux[k * nx + i] * KK[k * nx + j];
          Vxx_new[i * nx + j] = s;
        }
      for (int i = 0; i < nx; ++i)
        for (int j = 0; j < nx; ++j)
          Vxx[i * nx + j] =
              0.5 * (Vxx_new[i * nx + j] + Vxx_new[j * nx + i]);
      std::memcpy(Vx, Vx_new, nx * sizeof(double));
    }
    if (kkt < tol && !bad) break;
    // --- backtracking rollout ---
    bool accepted = false;
    for (int ai = 0; ai < 12 && !accepted; ++ai) {
      double alpha = std::pow(0.5, ai);
      std::memcpy(xs_try, x0, nx * sizeof(double));
      for (int t = 0; t < T; ++t) {
        const double* kk = ks + t * nu;
        const double* KK = Ks + t * nu * nx;
        double* u = us_try + t * nu;
        const double* x = xs_try + t * nx;
        const double* xr = xs + t * nx;
        for (int i = 0; i < nu; ++i) {
          double fb = 0;
          for (int j = 0; j < nx; ++j) fb += KK[i * nx + j] * (x[j] - xr[j]);
          u[i] = us[t * nu + i] - alpha * kk[i] - fb;
        }
        fd_step(P.m, dt, x, u, xs_try + (t + 1) * nx);
      }
      double cost_try = total_cost(P, xs_try, us_try);
      if (std::isfinite(cost_try) && cost_try < cost) {
        std::memcpy(xs, xs_try, (T + 1) * nx * sizeof(double));
        std::memcpy(us, us_try, T * nu * sizeof(double));
        cost = cost_try;
        accepted = true;
      }
    }
    if (accepted) {
      reg = std::max(reg / 10.0, 1e-12);
    } else {
      reg = std::min(reg * 10.0, 1e9);
      if (reg >= 1e9) break;
    }
  }
  *kkt_out = kkt;
  *iters_out = it;
  return (kkt < tol) ? 0 : 1;
}

}  // extern "C"
