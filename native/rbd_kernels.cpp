// Native rigid-body dynamics kernels (C++17, no dependencies).
//
// Role: independent implementation of RNEA / CRBA / forward dynamics over the
// same compiled model arrays as the JAX kernels — the cross-language
// validation oracle this project uses where the reference validated against
// Pinocchio (SURVEY.md §4), and a host-side CPU fallback for environments
// without an accelerator. Kinematic TREES (branched topologies: the forward
// pass indexes parents, the backward pass accumulates forces to parents —
// any topologically-ordered parent array works) with revolute/prismatic
// joints (the model classes the URDF compiler emits).
//
// Conventions match agimus_controller_tpu/ops/spatial.py:
//   motion = [w; v] local frame, force = [n; f],
//   placement (R, p): x_parent = R x_child + p.

#include <cmath>
#include <cstring>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 v3(const double* p) { return {p[0], p[1], p[2]}; }
inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct Mat3 {
  double m[9];  // row major
  Vec3 mul(Vec3 v) const {
    return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
            m[3] * v.x + m[4] * v.y + m[5] * v.z,
            m[6] * v.x + m[7] * v.y + m[8] * v.z};
  }
  Vec3 tmul(Vec3 v) const {  // transpose multiply
    return {m[0] * v.x + m[3] * v.y + m[6] * v.z,
            m[1] * v.x + m[4] * v.y + m[7] * v.z,
            m[2] * v.x + m[5] * v.y + m[8] * v.z};
  }
  Mat3 mulm(const Mat3& o) const {
    Mat3 r{};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += m[3 * i + k] * o.m[3 * k + j];
        r.m[3 * i + j] = s;
      }
    return r;
  }
};

Mat3 axis_angle(Vec3 axis, double angle) {
  double c = std::cos(angle), s = std::sin(angle), t = 1.0 - c;
  double x = axis.x, y = axis.y, z = axis.z;
  return {{t * x * x + c,     t * x * y - s * z, t * x * z + s * y,
           t * x * y + s * z, t * y * y + c,     t * y * z - s * x,
           t * x * z - s * y, t * y * z + s * x, t * z * z + c}};
}

struct Motion {
  Vec3 w, v;
};
struct Force {
  Vec3 n, f;
};

struct Placement {
  Mat3 R;
  Vec3 p;
};

// transform motion from child frame to parent frame given child placement
Motion motion_act(const Placement& X, Motion m) {
  Vec3 w = X.R.mul(m.w);
  return {w, X.R.mul(m.v) + cross(X.p, w)};
}
Motion motion_act_inv(const Placement& X, Motion m) {
  Vec3 w = X.R.tmul(m.w);
  return {w, X.R.tmul(m.v - cross(X.p, m.w))};
}
Force force_act(const Placement& X, Force f) {
  Vec3 fl = X.R.mul(f.f);
  return {X.R.mul(f.n) + cross(X.p, fl), fl};
}

struct Model {
  int nj;
  const int* parent;          // [nj]
  const int* jtype;           // [nj] 0 = revolute, 1 = prismatic
  const double* joint_rot;    // [nj*9]
  const double* joint_trans;  // [nj*3]
  const double* axis;         // [nj*3]
  const double* mass;         // [nj]
  const double* com;          // [nj*3]
  const double* inertia;      // [nj*9] about CoM
  const double* gravity;      // [3]
};

Placement joint_placement(const Model& mdl, int i, double qi) {
  Mat3 Rj;
  std::memcpy(Rj.m, mdl.joint_rot + 9 * i, sizeof(Rj.m));
  Vec3 pj = v3(mdl.joint_trans + 3 * i);
  Vec3 ax = v3(mdl.axis + 3 * i);
  if (mdl.jtype[i] == 0) {
    return {Rj.mulm(axis_angle(ax, qi)), pj};
  }
  return {Rj, pj + Rj.mul(qi * ax)};
}

Force inertia_apply(const Model& mdl, int i, Motion m) {
  Vec3 c = v3(mdl.com + 3 * i);
  Mat3 I;
  std::memcpy(I.m, mdl.inertia + 9 * i, sizeof(I.m));
  Vec3 plin = mdl.mass[i] * (m.v + cross(m.w, c));
  return {I.mul(m.w) + cross(c, plin), plin};
}

void rnea_impl(const Model& mdl, const double* q, const double* vq,
               const double* aq, double* tau) {
  const int N = mdl.nj;
  Placement X[64];
  Motion vel[64], acc[64];
  Force frc[64];
  Vec3 g = v3(mdl.gravity);
  for (int i = 0; i < N; ++i) {
    X[i] = joint_placement(mdl, i, q[i]);
    Vec3 ax = v3(mdl.axis + 3 * i);
    Motion S = mdl.jtype[i] == 0 ? Motion{ax, {0, 0, 0}} : Motion{{0, 0, 0}, ax};
    int p = mdl.parent[i];
    Motion vp = p >= 0 ? vel[p] : Motion{{0, 0, 0}, {0, 0, 0}};
    Motion ap = p >= 0 ? acc[p] : Motion{{0, 0, 0}, {-g.x, -g.y, -g.z}};
    Motion vi = motion_act_inv(X[i], vp);
    vi.w = vi.w + vq[i] * S.w;
    vi.v = vi.v + vq[i] * S.v;
    Motion ai = motion_act_inv(X[i], ap);
    ai.w = ai.w + aq[i] * S.w;
    ai.v = ai.v + aq[i] * S.v;
    // + v x (S qdot)
    Vec3 sw = vq[i] * S.w, sv = vq[i] * S.v;
    ai.w = ai.w + cross(vi.w, sw);
    ai.v = ai.v + cross(vi.w, sv) + cross(vi.v, sw);
    Force h = inertia_apply(mdl, i, vi);
    Force fi = inertia_apply(mdl, i, ai);
    // + v x* h
    fi.n = fi.n + cross(vi.w, h.n) + cross(vi.v, h.f);
    fi.f = fi.f + cross(vi.w, h.f);
    vel[i] = vi;
    acc[i] = ai;
    frc[i] = fi;
  }
  for (int i = N - 1; i >= 0; --i) {
    Vec3 ax = v3(mdl.axis + 3 * i);
    tau[i] = mdl.jtype[i] == 0 ? dot(ax, frc[i].n) : dot(ax, frc[i].f);
    int p = mdl.parent[i];
    if (p >= 0) {
      Force fp = force_act(X[i], frc[i]);
      frc[p].n = frc[p].n + fp.n;
      frc[p].f = frc[p].f + fp.f;
    }
  }
}

}  // namespace

extern "C" {

void rnea(int nj, const int* parent, const int* jtype, const double* joint_rot,
          const double* joint_trans, const double* axis, const double* mass,
          const double* com, const double* inertia, const double* gravity,
          const double* q, const double* v, const double* a, double* tau) {
  Model mdl{nj, parent, jtype, joint_rot, joint_trans,
            axis, mass, com, inertia, gravity};
  rnea_impl(mdl, q, v, a, tau);
}

// CRBA via RNEA columns: M[:, j] = rnea(q, 0, e_j) - rnea(q, 0, 0).
// O(n^2) but independent of the JAX CRBA implementation (different
// algorithm), which is exactly what an oracle wants.
void crba(int nj, const int* parent, const int* jtype, const double* joint_rot,
          const double* joint_trans, const double* axis, const double* mass,
          const double* com, const double* inertia, const double* gravity,
          const double* q, double* M) {
  Model mdl{nj, parent, jtype, joint_rot, joint_trans,
            axis, mass, com, inertia, gravity};
  double zero[64] = {0}, e[64] = {0}, g0[64], col[64];
  rnea_impl(mdl, q, zero, zero, g0);
  for (int j = 0; j < nj; ++j) {
    e[j] = 1.0;
    rnea_impl(mdl, q, zero, e, col);
    e[j] = 0.0;
    for (int i = 0; i < nj; ++i) M[i * nj + j] = col[i] - g0[i];
  }
}

// forward dynamics: solve (M + diag(armature)) a = tau - rnea(q, v, 0)
void forward_dynamics(int nj, const int* parent, const int* jtype,
                      const double* joint_rot, const double* joint_trans,
                      const double* axis, const double* mass, const double* com,
                      const double* inertia, const double* gravity,
                      const double* armature, const double* q, const double* v,
                      const double* tau, double* a) {
  Model mdl{nj, parent, jtype, joint_rot, joint_trans,
            axis, mass, com, inertia, gravity};
  double M[64 * 64], zero[64] = {0}, b[64];
  crba(nj, parent, jtype, joint_rot, joint_trans, axis, mass, com, inertia,
       gravity, q, M);
  rnea_impl(mdl, q, v, zero, b);
  for (int i = 0; i < nj; ++i) {
    M[i * nj + i] += armature[i];
    b[i] = tau[i] - b[i];
  }
  // Cholesky solve (M is SPD)
  double L[64 * 64] = {0};
  for (int i = 0; i < nj; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = M[i * nj + j];
      for (int k = 0; k < j; ++k) s -= L[i * nj + k] * L[j * nj + k];
      L[i * nj + j] = (i == j) ? std::sqrt(s) : s / L[j * nj + j];
    }
  }
  double y[64];
  for (int i = 0; i < nj; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * nj + k] * y[k];
    y[i] = s / L[i * nj + i];
  }
  for (int i = nj - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < nj; ++k) s -= L[k * nj + i] * a[k];
    a[i] = s / L[i * nj + i];
  }
}

}  // extern "C"
