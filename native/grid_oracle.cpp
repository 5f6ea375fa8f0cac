// grid_oracle — native (C++, float64) rigid-body dynamics oracle.
//
// An implementation of the framework's algorithm family that shares NO code
// with the Python/JAX stack: it consumes the same robot description
// (transform coefficients, joint subspaces, spatial inertias) but implements
// the recursions independently, in plain C++. Used by the test suite as a
// third opinion alongside the NumPy golden model and jax autodiff, and
// usable as a fast host-side reference for data generation.
//
// Conventions (identical to gridcodegenerator_tpu): spatial vectors are
// [angular; linear]; X_i(q) = Xb + f1(q)·Xs + f2(q)·Xc with (f1,f2) =
// (sin,cos) for revolute and (q,0) for prismatic; gravity enters as the
// fictitious base acceleration [0,…,0,−gravity].
//
// Build: g++ -O2 -shared -fPIC -o libgrid_oracle.so grid_oracle.cpp
// (done automatically by gridcodegenerator_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

using Vec6 = double[6];

struct Mat6 {
  double m[6][6];
};

inline void mat6_zero(Mat6& A) { std::memset(A.m, 0, sizeof(A.m)); }

inline void matvec(const Mat6& A, const double* x, double* y) {
  for (int r = 0; r < 6; ++r) {
    double acc = 0;
    for (int c = 0; c < 6; ++c) acc += A.m[r][c] * x[c];
    y[r] = acc;
  }
}

inline void matTvec(const Mat6& A, const double* x, double* y) {
  for (int r = 0; r < 6; ++r) {
    double acc = 0;
    for (int c = 0; c < 6; ++c) acc += A.m[c][r] * x[c];
    y[r] = acc;
  }
}

inline void matmat(const Mat6& A, const Mat6& B, Mat6& C) {
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) {
      double acc = 0;
      for (int k = 0; k < 6; ++k) acc += A.m[r][k] * B.m[k][c];
      C.m[r][c] = acc;
    }
}

inline void matTmat(const Mat6& A, const Mat6& B, Mat6& C) {
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) {
      double acc = 0;
      for (int k = 0; k < 6; ++k) acc += A.m[k][r] * B.m[k][c];
      C.m[r][c] = acc;
    }
}

inline void cross3(const double* a, const double* b, double* out) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

// motion cross product m × x = [w×x_w ; w×x_v + v×x_w]
inline void crm_apply(const double* m, const double* x, double* out) {
  double t1[3], t2[3], t3[3];
  cross3(m, x, t1);
  cross3(m, x + 3, t2);
  cross3(m + 3, x, t3);
  out[0] = t1[0]; out[1] = t1[1]; out[2] = t1[2];
  out[3] = t2[0] + t3[0]; out[4] = t2[1] + t3[1]; out[5] = t2[2] + t3[2];
}

// force cross product m ×* x = [w×x_w + v×x_v ; w×x_v]
inline void crf_apply(const double* m, const double* x, double* out) {
  double t1[3], t2[3], t3[3];
  cross3(m, x, t1);
  cross3(m + 3, x + 3, t2);
  cross3(m, x + 3, t3);
  out[0] = t1[0] + t2[0]; out[1] = t1[1] + t2[1]; out[2] = t1[2] + t2[2];
  out[3] = t3[0]; out[4] = t3[1]; out[5] = t3[2];
}

struct Robot {
  int n;
  const int* parents;
  const int* jtype;  // 0 = revolute, 1 = prismatic
  const double* Xb;  // n × 36 row-major
  const double* Xs;
  const double* Xc;
  const double* S;       // n × 6
  const double* inertia; // n × 36
  const double* damping; // n
  const double* armature; // n — reflected rotor inertia (joint space)
};

void joint_xforms(const Robot& rb, const double* q, std::vector<Mat6>& X) {
  X.resize(rb.n);
  for (int i = 0; i < rb.n; ++i) {
    double f1, f2;
    if (rb.jtype[i] == 1) { f1 = q[i]; f2 = 0.0; }
    else { f1 = std::sin(q[i]); f2 = std::cos(q[i]); }
    const double* b = rb.Xb + 36 * i;
    const double* s = rb.Xs + 36 * i;
    const double* c = rb.Xc + 36 * i;
    for (int r = 0; r < 6; ++r)
      for (int cc = 0; cc < 6; ++cc)
        X[i].m[r][cc] = b[6 * r + cc] + f1 * s[6 * r + cc] + f2 * c[6 * r + cc];
  }
}

inline const Mat6& imat(const Robot& rb, int i, Mat6& tmp) {
  const double* p = rb.inertia + 36 * i;
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) tmp.m[r][c] = p[6 * r + c];
  return tmp;
}

// Forward/backward RNEA. v_out/a_out/f_out may be null if not wanted.
// If qdd == nullptr the bias-force variant runs. f is backward-accumulated.
void rnea(const Robot& rb, const std::vector<Mat6>& X, const double* q,
          const double* qd, const double* qdd, double gravity, double* c_out,
          double* v_out, double* a_out, double* f_out) {
  const int n = rb.n;
  std::vector<double> v(6 * n), a(6 * n), f(6 * n);
  double a_base[6] = {0, 0, 0, 0, 0, -gravity};
  for (int i = 0; i < n; ++i) {
    const int p = rb.parents[i];
    const double* Si = rb.S + 6 * i;
    double Sqd[6];
    for (int r = 0; r < 6; ++r) Sqd[r] = Si[r] * qd[i];
    if (p < 0) {
      for (int r = 0; r < 6; ++r) v[6 * i + r] = Sqd[r];
      matvec(X[i], a_base, &a[6 * i]);
    } else {
      matvec(X[i], &v[6 * p], &v[6 * i]);
      for (int r = 0; r < 6; ++r) v[6 * i + r] += Sqd[r];
      matvec(X[i], &a[6 * p], &a[6 * i]);
    }
    double cor[6];
    crm_apply(&v[6 * i], Sqd, cor);
    for (int r = 0; r < 6; ++r) a[6 * i + r] += cor[r];
    if (qdd)
      for (int r = 0; r < 6; ++r) a[6 * i + r] += Si[r] * qdd[i];
  }
  Mat6 I;
  for (int i = 0; i < n; ++i) {
    imat(rb, i, I);
    double Iv[6], Ia[6], fx[6];
    matvec(I, &v[6 * i], Iv);
    matvec(I, &a[6 * i], Ia);
    crf_apply(&v[6 * i], Iv, fx);
    for (int r = 0; r < 6; ++r) f[6 * i + r] = Ia[r] + fx[r];
  }
  for (int i = n - 1; i >= 0; --i) {
    const int p = rb.parents[i];
    if (p >= 0) {
      double up[6];
      matTvec(X[i], &f[6 * i], up);
      for (int r = 0; r < 6; ++r) f[6 * p + r] += up[r];
    }
  }
  if (c_out) {
    for (int i = 0; i < n; ++i) {
      double acc = 0;
      for (int r = 0; r < 6; ++r) acc += rb.S[6 * i + r] * f[6 * i + r];
      c_out[i] = acc + rb.damping[i] * qd[i]
                 + (qdd ? rb.armature[i] * qdd[i] : 0.0);
    }
  }
  if (v_out) std::memcpy(v_out, v.data(), sizeof(double) * 6 * n);
  if (a_out) std::memcpy(a_out, a.data(), sizeof(double) * 6 * n);
  if (f_out) std::memcpy(f_out, f.data(), sizeof(double) * 6 * n);
}

// Analytic M^-1 (dense symmetric output).
void minv(const Robot& rb, const std::vector<Mat6>& X, double* M_out) {
  const int n = rb.n;
  std::vector<Mat6> IA(n);
  Mat6 tmp;
  for (int i = 0; i < n; ++i) {
    imat(rb, i, tmp);
    IA[i] = tmp;
  }
  std::vector<double> Minv(n * n, 0.0), F(n * 6 * n, 0.0), U(n * 6, 0.0),
      Dinv(n, 0.0);
  auto Fat = [&](int i, int r, int col) -> double& {
    return F[(i * 6 + r) * n + col];
  };
  for (int i = n - 1; i >= 0; --i) {
    const double* Si = rb.S + 6 * i;
    double* Ui = &U[6 * i];
    matvec(IA[i], Si, Ui);
    double d = 0;
    for (int r = 0; r < 6; ++r) d += Si[r] * Ui[r];
    Dinv[i] = 1.0 / (d + rb.armature[i]);  // D = S^T U + armature
    Minv[i * n + i] = Dinv[i];
    for (int col = 0; col < n; ++col) {
      double sf = 0;
      for (int r = 0; r < 6; ++r) sf += Si[r] * Fat(i, r, col);
      Minv[i * n + col] -= Dinv[i] * sf;
    }
    const int p = rb.parents[i];
    if (p >= 0) {
      for (int col = 0; col < n; ++col)
        for (int r = 0; r < 6; ++r) Fat(i, r, col) += Ui[r] * Minv[i * n + col];
      for (int col = 0; col < n; ++col) {
        double fcol[6], up[6];
        for (int r = 0; r < 6; ++r) fcol[r] = Fat(i, r, col);
        matTvec(X[i], fcol, up);
        for (int r = 0; r < 6; ++r) Fat(p, r, col) += up[r];
      }
      Mat6 Ia = IA[i], IaX, XIaX;
      for (int r = 0; r < 6; ++r)
        for (int c = 0; c < 6; ++c) Ia.m[r][c] -= Ui[r] * Dinv[i] * Ui[c];
      matmat(Ia, X[i], IaX);
      matTmat(X[i], IaX, XIaX);
      for (int r = 0; r < 6; ++r)
        for (int c = 0; c < 6; ++c) IA[p].m[r][c] += XIaX.m[r][c];
    }
  }
  for (int i = 0; i < n; ++i) {
    const int p = rb.parents[i];
    const double* Si = rb.S + 6 * i;
    if (p >= 0) {
      double UX[6];
      matTvec(X[i], &U[6 * i], UX);  // (U^T X)^T
      for (int col = i; col < n; ++col) {
        double acc = 0;
        for (int r = 0; r < 6; ++r) acc += UX[r] * Fat(p, r, col);
        Minv[i * n + col] -= Dinv[i] * acc;
      }
    }
    for (int col = i; col < n; ++col) {
      double xf[6] = {0, 0, 0, 0, 0, 0};
      if (p >= 0) {
        double fcol[6];
        for (int r = 0; r < 6; ++r) fcol[r] = Fat(p, r, col);
        matvec(X[i], fcol, xf);
      }
      for (int r = 0; r < 6; ++r)
        Fat(i, r, col) = Si[r] * Minv[i * n + col] + xf[r];
    }
  }
  // densify (mirror upper into lower)
  for (int r = 0; r < n; ++r)
    for (int c = 0; c < n; ++c)
      M_out[r * n + c] = (c >= r) ? Minv[r * n + c] : Minv[c * n + r];
}

// Analytic dID: dc_dq, dc_dqd (each n×n row-major).
void rnea_grad(const Robot& rb, const std::vector<Mat6>& X, const double* qd,
               const double* v, const double* a, const double* f,
               double gravity, double* dcdq, double* dcdqd) {
  const int n = rb.n;
  Mat6 I;
  std::vector<double> Iv(6 * n), Xv(6 * n, 0.0), Xa(6 * n);
  double a_base[6] = {0, 0, 0, 0, 0, -gravity};
  for (int i = 0; i < n; ++i) {
    imat(rb, i, I);
    matvec(I, v + 6 * i, &Iv[6 * i]);
    const int p = rb.parents[i];
    if (p >= 0) {
      matvec(X[i], v + 6 * p, &Xv[6 * i]);
      matvec(X[i], a + 6 * p, &Xa[6 * i]);
    } else {
      matvec(X[i], a_base, &Xa[6 * i]);
    }
  }
  std::vector<double> SxXv(6 * n), SxXa(6 * n), Sxv(6 * n), Sxf(6 * n);
  for (int i = 0; i < n; ++i) {
    crm_apply(rb.S + 6 * i, &Xv[6 * i], &SxXv[6 * i]);
    crm_apply(rb.S + 6 * i, &Xa[6 * i], &SxXa[6 * i]);
    crm_apply(rb.S + 6 * i, v + 6 * i, &Sxv[6 * i]);
    // force cross for the backward correction (correct for prismatic too)
    crf_apply(rb.S + 6 * i, f + 6 * i, &Sxf[6 * i]);
  }
  // column-major-ish storage: d[side][i] is 6×n (row r, col j)
  auto idx = [&](int i, int r, int j) { return (i * 6 + r) * n + j; };
  for (int side = 0; side < 2; ++side) {
    const bool is_q = side == 0;
    std::vector<double> dv(n * 6 * n, 0.0), da(n * 6 * n, 0.0),
        df(n * 6 * n, 0.0);
    for (int i = 0; i < n; ++i) {
      const int p = rb.parents[i];
      if (p >= 0) {
        for (int j = 0; j < n; ++j) {
          double col[6], out[6];
          for (int r = 0; r < 6; ++r) col[r] = dv[idx(p, r, j)];
          matvec(X[i], col, out);
          for (int r = 0; r < 6; ++r) dv[idx(i, r, j)] = out[r];
        }
        if (is_q)
          for (int r = 0; r < 6; ++r) dv[idx(i, r, i)] -= SxXv[6 * i + r];
      }
      if (!is_q)
        for (int r = 0; r < 6; ++r) dv[idx(i, r, i)] += rb.S[6 * i + r];
    }
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < n; ++j) {
        double col[6], out[6];
        for (int r = 0; r < 6; ++r) col[r] = dv[idx(i, r, j)];
        // crm(S)·col — note da = −qd·crm(S)·dv
        crm_apply(rb.S + 6 * i, col, out);
        for (int r = 0; r < 6; ++r) da[idx(i, r, j)] = -qd[i] * out[r];
      }
      const double* seed = is_q ? &SxXa[6 * i] : &Sxv[6 * i];
      for (int r = 0; r < 6; ++r) da[idx(i, r, i)] -= seed[r];
    }
    for (int i = 0; i < n; ++i) {
      const int p = rb.parents[i];
      if (p < 0) continue;
      for (int j = 0; j < n; ++j) {
        double col[6], out[6];
        for (int r = 0; r < 6; ++r) col[r] = da[idx(p, r, j)];
        matvec(X[i], col, out);
        for (int r = 0; r < 6; ++r) da[idx(i, r, j)] += out[r];
      }
    }
    Mat6 Im;
    for (int i = 0; i < n; ++i) {
      imat(rb, i, Im);
      for (int j = 0; j < n; ++j) {
        double dvc[6], dac[6], t1[6], t2[6], t3[6], Idv[6];
        for (int r = 0; r < 6; ++r) {
          dvc[r] = dv[idx(i, r, j)];
          dac[r] = da[idx(i, r, j)];
        }
        crf_apply(dvc, &Iv[6 * i], t1);        // crf(dv)·Iv
        matvec(Im, dac, t2);                   // I·da
        matvec(Im, dvc, Idv);
        crf_apply(v + 6 * i, Idv, t3);         // crf(v)·(I·dv)
        for (int r = 0; r < 6; ++r) df[idx(i, r, j)] = t1[r] + t2[r] + t3[r];
      }
    }
    for (int i = n - 1; i >= 0; --i) {
      const int p = rb.parents[i];
      if (p < 0) continue;
      for (int j = 0; j < n; ++j) {
        double col[6], out[6];
        for (int r = 0; r < 6; ++r) col[r] = df[idx(i, r, j)];
        matTvec(X[i], col, out);
        for (int r = 0; r < 6; ++r) df[idx(p, r, j)] += out[r];
      }
      if (is_q) {
        double out[6];
        matTvec(X[i], &Sxf[6 * i], out);
        for (int r = 0; r < 6; ++r) df[idx(p, r, i)] += out[r];
      }
    }
    double* dst = is_q ? dcdq : dcdqd;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = 0;
        for (int r = 0; r < 6; ++r) acc += rb.S[6 * i + r] * df[idx(i, r, j)];
        dst[i * n + j] = acc;
      }
    if (!is_q)
      for (int i = 0; i < n; ++i) dcdqd[i * n + i] += rb.damping[i];
  }
}

Robot make_robot(int n, const int* parents, const int* jtype,
                 const double* Xb, const double* Xs, const double* Xc,
                 const double* S, const double* inertia,
                 const double* damping, const double* armature) {
  Robot rb;
  rb.n = n; rb.parents = parents; rb.jtype = jtype;
  rb.Xb = Xb; rb.Xs = Xs; rb.Xc = Xc;
  rb.S = S; rb.inertia = inertia; rb.damping = damping; rb.armature = armature;
  return rb;
}


// World-frame linear contact rows J (3k × (6+n)) and base-frame contact
// points x_b (k × 3) — the free-flyer point Jacobian of
// ops/contact.py::fb_contact_jacobian.
void fb_contact_rows(const Robot& rb, const std::vector<double>& Rb_fk,
                     const std::vector<double>& p_fk, const double R[3][3],
                     int k, const int* links, const double* offsets,
                     std::vector<double>& J, std::vector<double>& xb_all) {
  const int n = rb.n, m = 6 + n;
  J.assign(3 * k * m, 0.0);
  xb_all.assign(3 * k, 0.0);
  for (int i = 0; i < k; ++i) {
    const int l = links[i];
    double* xb = &xb_all[3 * i];
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int c = 0; c < 3; ++c)
        acc += Rb_fk[9 * l + 3 * r + c] * offsets[3 * i + c];
      xb[r] = p_fk[3 * l + r] + acc;
    }
    // base block in base coords: [−skew(x_b) | I₃]
    double B6[3][6] = {{0, xb[2], -xb[1], 1, 0, 0},
                       {-xb[2], 0, xb[0], 0, 1, 0},
                       {xb[1], -xb[0], 0, 0, 0, 1}};
    // arm columns (linear rows of the base-frame point Jacobian)
    std::vector<double> Ja(3 * n, 0.0);
    for (int j = l; j >= 0; j = rb.parents[j]) {
      double aang[3], alin[3];
      for (int r = 0; r < 3; ++r) {
        double a1 = 0, a2 = 0;
        for (int c = 0; c < 3; ++c) {
          a1 += Rb_fk[9 * j + 3 * r + c] * rb.S[6 * j + c];
          a2 += Rb_fk[9 * j + 3 * r + c] * rb.S[6 * j + 3 + c];
        }
        aang[r] = a1;
        alin[r] = a2;
      }
      double d[3] = {xb[0] - p_fk[3 * j], xb[1] - p_fk[3 * j + 1],
                     xb[2] - p_fk[3 * j + 2]};
      double cr[3];
      cross3(aang, d, cr);
      for (int r = 0; r < 3; ++r) Ja[r * n + j] = cr[r] + alin[r];
    }
    // world rows: R · [B6 | Ja]
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 6; ++c) {
        double acc = 0;
        for (int t = 0; t < 3; ++t) acc += R[r][t] * B6[t][c];
        J[(3 * i + r) * m + c] = acc;
      }
      for (int j = 0; j < n; ++j) {
        double acc = 0;
        for (int t = 0; t < 3; ++t) acc += R[r][t] * Ja[t * n + j];
        J[(3 * i + r) * m + 6 + j] = acc;
      }
    }
  }
}

// World contact bias J̇·[vb; q̇] (3k) — analytic, via the moving-base
// spatial sweep at v̇b = 0 (body rate), q̈ = 0, no gravity, then the
// classical-acceleration conversion a_cl = a_lin(P) + ω × v_lin(P) in
// link coordinates and rotation to world. Matches the exact jvp the
// Python engine computes (ops/contact.py::fb_contact_bias).
void fb_contact_bias_w(const Robot& rb, const std::vector<Mat6>& X,
                       const std::vector<double>& Rb_fk,
                       const double R[3][3], const double* vb,
                       const double* qd, int k, const int* links,
                       const double* offsets, std::vector<double>& bias) {
  const int n = rb.n;
  std::vector<double> v(6 * n), a(6 * n);
  double a0[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < n; ++i) {
    const int pj = rb.parents[i];
    double Sqd[6], t[6];
    for (int r = 0; r < 6; ++r) Sqd[r] = rb.S[6 * i + r] * qd[i];
    matvec(X[i], pj < 0 ? vb : &v[6 * pj], &v[6 * i]);
    for (int r = 0; r < 6; ++r) v[6 * i + r] += Sqd[r];
    matvec(X[i], pj < 0 ? a0 : &a[6 * pj], &a[6 * i]);
    crm_apply(&v[6 * i], Sqd, t);
    for (int r = 0; r < 6; ++r) a[6 * i + r] += t[r];
  }
  bias.assign(3 * k, 0.0);
  for (int i = 0; i < k; ++i) {
    const int l = links[i];
    const double* o = offsets + 3 * i;
    const double* w = &v[6 * l];       // [ω; v_lin] at link frame origin
    const double* al = &a[6 * l];      // [α; a_lin] spatial
    double wxo[3], axo[3], vpt[3], acl[3], wxv[3];
    cross3(w, o, wxo);
    cross3(al, o, axo);
    for (int r = 0; r < 3; ++r) vpt[r] = w[3 + r] + wxo[r];
    cross3(w, vpt, wxv);
    for (int r = 0; r < 3; ++r) acl[r] = al[3 + r] + axo[r] + wxv[r];
    // world = R(quat) · R_base←link · a_cl
    double ab[3];
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int c = 0; c < 3; ++c) acc += Rb_fk[9 * l + 3 * r + c] * acl[c];
      ab[r] = acc;
    }
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int c = 0; c < 3; ++c) acc += R[r][c] * ab[c];
      bias[3 * i + r] = acc;
    }
  }
}

}  // namespace

// ==========================================================================
// Free-flyer helpers shared by grid_fb_fd and the contact oracle
// (grid_fb_step_ground): base rotation, moving-base bias + CRBA mass
// matrix, dense Cholesky, base-frame arm FK.
// ==========================================================================
namespace {

inline void quat_rot_wb(const double* quat, double R[3][3]) {
  const double w = quat[0], x = quat[1], y = quat[2], z = quat[3];
  R[0][0] = 1 - 2 * (y * y + z * z); R[0][1] = 2 * (x * y - w * z);
  R[0][2] = 2 * (x * z + w * y);
  R[1][0] = 2 * (x * y + w * z); R[1][1] = 1 - 2 * (x * x + z * z);
  R[1][2] = 2 * (y * z - w * x);
  R[2][0] = 2 * (x * z - w * y); R[2][1] = 2 * (y * z + w * x);
  R[2][2] = 1 - 2 * (x * x + y * y);
}

// bias wrench pb (6), joint bias cj (n, incl. damping), and the
// (6+n)×(6+n) free-flyer mass matrix — the same construction grid_fb_fd
// uses (moving-base RNEA sweep + CRBA with a 6-DoF base joint).
void fb_bias_mass(const Robot& rb, const std::vector<Mat6>& X,
                  const double* I_base, const double R[3][3],
                  const double* vb, const double* qd, double gravity,
                  double* pb, double* cj, std::vector<double>& M) {
  const int n = rb.n, m = 6 + n;
  double gb[3];
  for (int r = 0; r < 3; ++r) gb[r] = R[2][r] * gravity;  // R^T (0,0,g)
  double a0[6] = {0, 0, 0, -gb[0], -gb[1], -gb[2]};
  std::vector<double> v(6 * n), a(6 * n), f(6 * n);
  for (int i = 0; i < n; ++i) {
    const int p = rb.parents[i];
    const double* vp = p < 0 ? vb : &v[6 * p];
    const double* ap = p < 0 ? a0 : &a[6 * p];
    double Sqd[6], t[6];
    for (int r = 0; r < 6; ++r) Sqd[r] = rb.S[6 * i + r] * qd[i];
    matvec(X[i], vp, &v[6 * i]);
    for (int r = 0; r < 6; ++r) v[6 * i + r] += Sqd[r];
    matvec(X[i], ap, &a[6 * i]);
    crm_apply(&v[6 * i], Sqd, t);
    for (int r = 0; r < 6; ++r) a[6 * i + r] += t[r];
    Mat6 Itmp;
    const Mat6& Ii = imat(rb, i, Itmp);
    double Iv[6], Ia[6], fx[6];
    matvec(Ii, &v[6 * i], Iv);
    matvec(Ii, &a[6 * i], Ia);
    crf_apply(&v[6 * i], Iv, fx);
    for (int r = 0; r < 6; ++r) f[6 * i + r] = Ia[r] + fx[r];
  }
  Mat6 Ib;
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) Ib.m[r][c] = I_base[6 * r + c];
  double Ivb[6], Iab[6], fxb[6];
  matvec(Ib, vb, Ivb);
  matvec(Ib, a0, Iab);
  crf_apply(vb, Ivb, fxb);
  for (int r = 0; r < 6; ++r) pb[r] = Iab[r] + fxb[r];
  for (int i = n - 1; i >= 0; --i) {
    const int p = rb.parents[i];
    double t[6];
    matTvec(X[i], &f[6 * i], t);
    double* dst = p < 0 ? pb : &f[6 * p];
    for (int r = 0; r < 6; ++r) dst[r] += t[r];
  }
  for (int i = 0; i < n; ++i) {
    double acc = 0;
    for (int r = 0; r < 6; ++r) acc += rb.S[6 * i + r] * f[6 * i + r];
    cj[i] = acc + rb.damping[i] * qd[i];
  }
  // CRBA with the 6-DoF base
  std::vector<Mat6> IC(n);
  Mat6 ICb = Ib;
  for (int i = 0; i < n; ++i) imat(rb, i, IC[i]);
  for (int i = n - 1; i >= 0; --i) {
    Mat6 t1, t2;
    matmat(IC[i], X[i], t1);
    matTmat(X[i], t1, t2);
    const int p = rb.parents[i];
    Mat6& dst = p < 0 ? ICb : IC[p];
    for (int r = 0; r < 6; ++r)
      for (int c = 0; c < 6; ++c) dst.m[r][c] += t2.m[r][c];
  }
  M.assign(m * m, 0.0);
  for (int r = 0; r < 6; ++r)
    for (int c = 0; c < 6; ++c) M[r * m + c] = ICb.m[r][c];
  for (int i = 0; i < n; ++i) {
    double F[6];
    matvec(IC[i], rb.S + 6 * i, F);
    double acc = 0;
    for (int r = 0; r < 6; ++r) acc += rb.S[6 * i + r] * F[r];
    M[(6 + i) * m + (6 + i)] = acc + rb.armature[i];
    int j = i;
    while (rb.parents[j] >= 0) {
      double t[6];
      matTvec(X[j], F, t);
      std::memcpy(F, t, sizeof(t));
      j = rb.parents[j];
      double val = 0;
      for (int r = 0; r < 6; ++r) val += F[r] * rb.S[6 * j + r];
      M[(6 + i) * m + (6 + j)] = val;
      M[(6 + j) * m + (6 + i)] = val;
    }
    double t[6];
    matTvec(X[j], F, t);
    for (int r = 0; r < 6; ++r) {
      M[(6 + i) * m + r] = t[r];
      M[r * m + (6 + i)] = t[r];
    }
  }
}

void chol_fac(int m, const std::vector<double>& A, std::vector<double>& L) {
  L.assign(m * m, 0.0);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j <= i; ++j) {
      double acc = A[i * m + j];
      for (int k = 0; k < j; ++k) acc -= L[i * m + k] * L[j * m + k];
      if (i == j) L[i * m + i] = std::sqrt(acc);
      else L[i * m + j] = acc / L[j * m + j];
    }
}

void chol_sol(int m, const std::vector<double>& L, const double* rhs,
              double* out) {
  std::vector<double> y(m);
  for (int i = 0; i < m; ++i) {
    double acc = rhs[i];
    for (int k = 0; k < i; ++k) acc -= L[i * m + k] * y[k];
    y[i] = acc / L[i * m + i];
  }
  for (int i = m - 1; i >= 0; --i) {
    double acc = y[i];
    for (int k = i + 1; k < m; ++k) acc -= L[k * m + i] * out[k];
    out[i] = acc / L[i * m + i];
  }
}

// base-frame FK of the arm: world<-link is NOT needed — everything stays in
// base coordinates. R_i = R_parent · Eᵀ, p_i = p_parent + R_parent · r with
// E = X[:3,:3], r = unskew(−Eᵀ · X[3:,:3]) (the motion-transform origin
// recovery, ops/kinematics.py::fk).
void arm_fk(const Robot& rb, const std::vector<Mat6>& X,
            std::vector<double>& Rb /*n*9*/, std::vector<double>& pb /*n*3*/) {
  const int n = rb.n;
  Rb.assign(n * 9, 0.0);
  pb.assign(n * 3, 0.0);
  for (int i = 0; i < n; ++i) {
    const int p = rb.parents[i];
    double Rp[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
    double pp[3] = {0, 0, 0};
    if (p >= 0) {
      for (int r = 0; r < 3; ++r) {
        pp[r] = pb[3 * p + r];
        for (int c = 0; c < 3; ++c) Rp[r][c] = Rb[9 * p + 3 * r + c];
      }
    }
    // B = Eᵀ · X_bl (bottom-left 3×3); r_vec = [−B21, −B02, −B10]
    double B[3][3];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        for (int k = 0; k < 3; ++k) acc += X[i].m[k][r] * X[i].m[3 + k][c];
        B[r][c] = acc;
      }
    const double rv[3] = {-B[2][1], -B[0][2], -B[1][0]};
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += Rp[r][k] * rv[k];
      pb[3 * i + r] = pp[r] + acc;
      for (int c = 0; c < 3; ++c) {
        double a2 = 0;
        for (int k = 0; k < 3; ++k) a2 += Rp[r][k] * X[i].m[c][k];  // Rp·Eᵀ
        Rb[9 * i + 3 * r + c] = a2;
      }
    }
  }
}

}  // namespace

extern "C" {

void grid_rnea(int n, const int* parents, const int* jtype, const double* Xb,
               const double* Xs, const double* Xc, const double* S,
               const double* inertia, const double* damping, const double* armature, const double* q,
               const double* qd, const double* qdd /* nullable */,
               double gravity, double* c_out) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  rnea(rb, X, q, qd, qdd, gravity, c_out, nullptr, nullptr, nullptr);
}

void grid_minv(int n, const int* parents, const int* jtype, const double* Xb,
               const double* Xs, const double* Xc, const double* S,
               const double* inertia, const double* damping, const double* armature, const double* q,
               double* minv_out) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  minv(rb, X, minv_out);
}

void grid_fd(int n, const int* parents, const int* jtype, const double* Xb,
             const double* Xs, const double* Xc, const double* S,
             const double* inertia, const double* damping, const double* armature, const double* q,
             const double* qd, const double* u, double gravity,
             double* qdd_out) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  std::vector<double> c(n), M(n * n);
  rnea(rb, X, q, qd, nullptr, gravity, c.data(), nullptr, nullptr, nullptr);
  minv(rb, X, M.data());
  for (int i = 0; i < n; ++i) {
    double acc = 0;
    for (int j = 0; j < n; ++j) acc += M[i * n + j] * (u[j] - c[j]);
    qdd_out[i] = acc;
  }
}

// Free-flyer forward dynamics (quaternion base, S0 = I6): the independent
// float64 oracle for ops/freeflyer.py. quat is (w,x,y,z) world<-base; vb is
// the base twist in base coordinates; solves the dense SPD (6+n) system
// with an in-place Cholesky.
void grid_fb_fd(int n, const int* parents, const int* jtype, const double* Xb,
                const double* Xs, const double* Xc, const double* S,
                const double* inertia, const double* damping, const double* armature,
                const double* I_base /*36*/, const double* quat,
                const double* q, const double* vb, const double* qd,
                const double* tau, double gravity, double* dvb_out,
                double* qdd_out) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  const int m = 6 + n;
  double R[3][3];
  quat_rot_wb(quat, R);
  // moving-base bias (pb, cj) + the free-flyer CRBA mass matrix, then
  // one SPD solve: M [dvb; qdd] = [-pb; tau - cj]
  double pb6[6];
  std::vector<double> cj(n), M, L, rhs(m), sol(m);
  fb_bias_mass(rb, X, I_base, R, vb, qd, gravity, pb6, cj.data(), M);
  chol_fac(m, M, L);
  for (int r = 0; r < 6; ++r) rhs[r] = -pb6[r];
  for (int i = 0; i < n; ++i) rhs[6 + i] = tau[i] - cj[i];
  chol_sol(m, L, rhs.data(), sol.data());
  for (int r = 0; r < 6; ++r) dvb_out[r] = sol[r];
  for (int i = 0; i < n; ++i) qdd_out[i] = sol[6 + i];
}

void grid_fd_grad(int n, const int* parents, const int* jtype,
                  const double* Xb, const double* Xs, const double* Xc,
                  const double* S, const double* inertia,
                  const double* damping, const double* armature, const double* q, const double* qd,
                  const double* u, double gravity, double* dfdu_out /*n×2n*/) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  std::vector<double> c(n), M(n * n), qdd(n);
  rnea(rb, X, q, qd, nullptr, gravity, c.data(), nullptr, nullptr, nullptr);
  minv(rb, X, M.data());
  for (int i = 0; i < n; ++i) {
    double acc = 0;
    for (int j = 0; j < n; ++j) acc += M[i * n + j] * (u[j] - c[j]);
    qdd[i] = acc;
  }
  std::vector<double> v(6 * n), a(6 * n), f(6 * n), dcdq(n * n), dcdqd(n * n);
  rnea(rb, X, q, qd, qdd.data(), gravity, nullptr, v.data(), a.data(),
       f.data());
  rnea_grad(rb, X, qd, v.data(), a.data(), f.data(), gravity, dcdq.data(),
            dcdqd.data());
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < 2 * n; ++j) {
      const double* dc = j < n ? dcdq.data() : dcdqd.data();
      const int jj = j < n ? j : j - n;
      double acc = 0;
      for (int k = 0; k < n; ++k) acc += M[i * n + k] * dc[k * n + jj];
      dfdu_out[i * 2 * n + j] = -acc;
    }
}

}  // extern "C"

// ==========================================================================
// Contact oracle: one frictional ground step of the free-flyer
// (independent float64 reference for ops/contact.py::fb_step_ground and
// the fused kernel ops/kernels/contact_fused.py::step_ground_fused).
// ==========================================================================

extern "C" {

void grid_fb_step_ground(
    int n, const int* parents, const int* jtype, const double* Xb,
    const double* Xs, const double* Xc, const double* S,
    const double* inertia, const double* damping, const double* armature, const double* I_base,
    const double* quat, const double* pos, const double* q,
    const double* vb, const double* qd, const double* tau, double dt, int k,
    const int* links, const double* offsets /*k×3*/, const double* mu /*k*/,
    double ground_z, double gravity, int iters, double erp, double margin,
    double restitution, double* quat2, double* pos2, double* q2,
    double* vb2, double* qd2, double* imp /*k×3*/) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  const int m = 6 + n;
  double R[3][3];
  quat_rot_wb(quat, R);

  // free-velocity step: v_free = v + dt·M⁻¹([−pb; τ − cj])
  double pb6[6];
  std::vector<double> cj(n), M, L;
  fb_bias_mass(rb, X, I_base, R, vb, qd, gravity, pb6, cj.data(), M);
  chol_fac(m, M, L);
  std::vector<double> v(m), rhs(m), acc_free(m), v_free(m);
  for (int r = 0; r < 6; ++r) { v[r] = vb[r]; rhs[r] = -pb6[r]; }
  for (int i = 0; i < n; ++i) { v[6 + i] = qd[i]; rhs[6 + i] = tau[i] - cj[i]; }
  chol_sol(m, L, rhs.data(), acc_free.data());
  for (int c = 0; c < m; ++c) v_free[c] = v[c] + dt * acc_free[c];

  // world contact rows [x, y, z(=normal)] per foot + plane gaps
  std::vector<double> Rb_fk, p_fk, J, xb_all, gaps(k), active(k);
  arm_fk(rb, X, Rb_fk, p_fk);
  fb_contact_rows(rb, Rb_fk, p_fk, R, k, links, offsets, J, xb_all);
  for (int i = 0; i < k; ++i) {
    double xw2 = 0;
    for (int c = 0; c < 3; ++c) xw2 += R[2][c] * xb_all[3 * i + c];
    gaps[i] = pos[2] + xw2 - ground_z;
    active[i] = gaps[i] < margin ? 1.0 : 0.0;
  }

  // Delassus G = J M⁻¹ Jᵀ + 1e-9·I and the PGS right-hand side
  std::vector<double> MiJt(m * 3 * k), G(9 * k * k), b(3 * k);
  for (int r = 0; r < 3 * k; ++r)
    chol_sol(m, L, &J[r * m], &MiJt[r * m]);  // row r of J → col r of M⁻¹Jᵀ
  for (int r = 0; r < 3 * k; ++r)
    for (int s = 0; s < 3 * k; ++s) {
      double acc = 0;
      for (int c = 0; c < m; ++c) acc += J[r * m + c] * MiJt[s * m + c];
      G[r * 3 * k + s] = acc + (r == s ? 1e-9 : 0.0);
    }
  for (int i = 0; i < k; ++i) {
    double vn_now = 0;
    for (int c = 0; c < m; ++c) vn_now += J[(3 * i + 2) * m + c] * v[c];
    const double v_star =
        -erp * std::min(gaps[i], 0.0) / dt -
        restitution * std::min(vn_now, 0.0);
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int c = 0; c < m; ++c) acc += J[(3 * i + r) * m + c] * v_free[c];
      b[3 * i + r] = acc - (r == 2 ? v_star : 0.0);
    }
  }

  // projected Gauss-Seidel with friction-cone projection (pgs_solve)
  std::vector<double> p(3 * k, 0.0);
  for (int it = 0; it < iters; ++it)
    for (int i = 0; i < k; ++i) {
      const int s = 3 * i;
      double cand[3];
      for (int r = 0; r < 3; ++r) {
        double res = b[s + r];
        for (int c = 0; c < 3 * k; ++c) res += G[(s + r) * 3 * k + c] * p[c];
        const double diag = std::max(G[(s + r) * 3 * k + s + r], 1e-9);
        cand[r] = p[s + r] - res / diag;
      }
      const double pn = std::max(cand[2], 0.0) * active[i];
      const double norm_t =
          std::sqrt(cand[0] * cand[0] + cand[1] * cand[1] + 1e-30);
      const double scale = std::min(1.0, mu[i] * pn / norm_t);
      p[s] = cand[0] * scale;
      p[s + 1] = cand[1] * scale;
      p[s + 2] = pn;
    }

  // integrate: v⁺ = v_free + M⁻¹Jᵀ p; manifold pose update
  std::vector<double> v_new(v_free);
  for (int c = 0; c < m; ++c)
    for (int r = 0; r < 3 * k; ++r) v_new[c] += MiJt[r * m + c] * p[r];
  for (int r = 0; r < 6; ++r) vb2[r] = v_new[r];
  for (int i = 0; i < n; ++i) {
    qd2[i] = v_new[6 + i];
    q2[i] = q[i] + dt * qd2[i];
  }
  // quat2 = normalize(quat ⊗ exp_body(ω⁺ dt))
  const double hx = 0.5 * vb2[0] * dt, hy = 0.5 * vb2[1] * dt,
               hz = 0.5 * vb2[2] * dt;
  const double ang = std::sqrt(hx * hx + hy * hy + hz * hz + 1e-30);
  const double sa = std::sin(ang) / ang;
  const double e[4] = {std::cos(ang), sa * hx, sa * hy, sa * hz};
  const double aw = quat[0], ax = quat[1], ay = quat[2], az = quat[3];
  double qn[4] = {aw * e[0] - ax * e[1] - ay * e[2] - az * e[3],
                  aw * e[1] + ax * e[0] + ay * e[3] - az * e[2],
                  aw * e[2] + ay * e[0] + az * e[1] - ax * e[3],
                  aw * e[3] + az * e[0] + ax * e[2] - ay * e[1]};
  double nq2 = std::sqrt(qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2] +
                         qn[3] * qn[3]);
  for (int r = 0; r < 4; ++r) quat2[r] = qn[r] / nq2;
  double R2[3][3];
  quat_rot_wb(quat2, R2);
  for (int r = 0; r < 3; ++r) {
    double acc = 0;
    for (int c = 0; c < 3; ++c) acc += R2[r][c] * vb2[3 + c];
    pos2[r] = pos[r] + dt * acc;
  }
  for (int i = 0; i < 3 * k; ++i) imp[i] = p[i];
}

void grid_fb_stance(
    int n, const int* parents, const int* jtype, const double* Xb,
    const double* Xs, const double* Xc, const double* S,
    const double* inertia, const double* damping, const double* armature, const double* I_base,
    const double* quat, const double* pos, const double* q,
    const double* vb, const double* qd, const double* tau, int k,
    const int* links, const double* offsets /*k×3*/,
    const double* anchors /*k×3 or null*/, double gravity, double alpha,
    double beta, double reg, double* dvb_out, double* qdd_out,
    double* lam_out /*3k*/) {
  Robot rb = make_robot(n, parents, jtype, Xb, Xs, Xc, S, inertia, damping, armature);
  std::vector<Mat6> X;
  joint_xforms(rb, q, X);
  const int m = 6 + n;
  double R[3][3];
  quat_rot_wb(quat, R);

  double pb6[6];
  std::vector<double> cj(n), M, L;
  fb_bias_mass(rb, X, I_base, R, vb, qd, gravity, pb6, cj.data(), M);
  chol_fac(m, M, L);
  std::vector<double> rhs(m), y_free(m), v(m);
  for (int r = 0; r < 6; ++r) { rhs[r] = -pb6[r]; v[r] = vb[r]; }
  for (int i = 0; i < n; ++i) { rhs[6 + i] = tau[i] - cj[i]; v[6 + i] = qd[i]; }
  chol_sol(m, L, rhs.data(), y_free.data());

  std::vector<double> Rb_fk, p_fk, J, xb_all, bias;
  arm_fk(rb, X, Rb_fk, p_fk);
  fb_contact_rows(rb, Rb_fk, p_fk, R, k, links, offsets, J, xb_all);
  fb_contact_bias_w(rb, X, Rb_fk, R, vb, qd, k, links, offsets, bias);

  // Baumgarte targets: a* = −2α·Jv − β²·(x_w − anchor)
  std::vector<double> a_star(3 * k, 0.0);
  if (alpha != 0.0)
    for (int r = 0; r < 3 * k; ++r) {
      double jv = 0;
      for (int c = 0; c < m; ++c) jv += J[r * m + c] * v[c];
      a_star[r] -= 2.0 * alpha * jv;
    }
  if (beta != 0.0 && anchors)
    for (int i = 0; i < k; ++i)
      for (int r = 0; r < 3; ++r) {
        double xw = pos[r];
        for (int c = 0; c < 3; ++c) xw += R[r][c] * xb_all[3 * i + c];
        a_star[3 * i + r] -= beta * beta * (xw - anchors[3 * i + r]);
      }

  // Delassus solve: G λ = −(J y_free + bias − a*)
  std::vector<double> MiJt(m * 3 * k), G(9 * k * k), grhs(3 * k),
      lam(3 * k), Lg;
  for (int r = 0; r < 3 * k; ++r)
    chol_sol(m, L, &J[r * m], &MiJt[r * m]);
  for (int r = 0; r < 3 * k; ++r)
    for (int s2 = 0; s2 < 3 * k; ++s2) {
      double acc = 0;
      for (int c = 0; c < m; ++c) acc += J[r * m + c] * MiJt[s2 * m + c];
      G[r * 3 * k + s2] = acc + (r == s2 ? reg : 0.0);
    }
  for (int r = 0; r < 3 * k; ++r) {
    double jy = 0;
    for (int c = 0; c < m; ++c) jy += J[r * m + c] * y_free[c];
    grhs[r] = -(jy + bias[r] - a_star[r]);
  }
  chol_fac(3 * k, G, Lg);
  chol_sol(3 * k, Lg, grhs.data(), lam.data());

  std::vector<double> y(y_free);
  for (int c = 0; c < m; ++c)
    for (int r = 0; r < 3 * k; ++r) y[c] += MiJt[r * m + c] * lam[r];
  for (int r = 0; r < 6; ++r) dvb_out[r] = y[r];
  for (int i = 0; i < n; ++i) qdd_out[i] = y[6 + i];
  for (int r = 0; r < 3 * k; ++r) lam_out[r] = lam[r];
}

}  // extern "C"

// ==========================================================================
// Multi-dof oracle: spherical (ball) + in-tree floating joints, quaternion
// coordinates (nq != nv). Independent float64 reference for
// gridcodegenerator_tpu/ops/multidof.py (generalized RNEA / CRBA / FD with
// (6,w) motion subspaces; conventions mirrored from
// multidof.py::md_joint_transforms / md_rnea / md_crba).
// ==========================================================================
namespace md {

struct MdRobot {
  int n, nv, nq;
  const int* parents;
  const int* jtype;      // 0 revolute, 1 prismatic, 2 spherical, 3 floating
  const int* qs;         // per-joint q start
  const int* vs;         // per-joint v start
  const double* XT;      // n x 36 row-major origin transforms
  const double* axis;    // n x 3 single-dof axes
  const double* inertia; // n x 36
  const double* damping; // nv
  const double* armature; // nv
};

inline int vwidth(int t) { return t == 2 ? 3 : (t == 3 ? 6 : 1); }

// R (world<-base) from a unit quaternion (w,x,y,z)
inline void quat_rot(const double* quat, double R[9]) {
  const double w = quat[0], x = quat[1], y = quat[2], z = quat[3];
  R[0] = 1 - 2 * (y * y + z * z); R[1] = 2 * (x * y - w * z); R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z); R[4] = 1 - 2 * (x * x + z * z); R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y); R[7] = 2 * (y * z + w * x); R[8] = 1 - 2 * (x * x + y * y);
}

// XJ = [[E, 0], [-E p_hat, E]] (p nullable -> pure rotation blockdiag)
inline void xj_from_E(const double E[9], const double* p, Mat6& XJ) {
  mat6_zero(XJ);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      XJ.m[r][c] = E[r * 3 + c];
      XJ.m[r + 3][c + 3] = E[r * 3 + c];
    }
  if (p) {
    const double P[9] = {0, -p[2], p[1], p[2], 0, -p[0], -p[1], p[0], 0};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        for (int k = 0; k < 3; ++k) acc += E[r * 3 + k] * P[k * 3 + c];
        XJ.m[r + 3][c] = -acc;
      }
  }
}

void joint_xforms(const MdRobot& rb, const double* q, std::vector<Mat6>& X) {
  X.resize(rb.n);
  for (int i = 0; i < rb.n; ++i) {
    const int t = rb.jtype[i];
    const double* qi = q + rb.qs[i];
    Mat6 XJ;
    if (t == 3 || t == 2) {            // floating / spherical: E = R^T
      double R[9], E[9];
      quat_rot(qi, R);
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) E[r * 3 + c] = R[c * 3 + r];
      xj_from_E(E, t == 3 ? qi + 4 : nullptr, XJ);
    } else if (t == 1) {               // prismatic: I + q * [[0,0],[-K,0]]
      const double* a = rb.axis + 3 * i;
      const double K[9] = {0, -a[2], a[1], a[2], 0, -a[0], -a[1], a[0], 0};
      mat6_zero(XJ);
      for (int r = 0; r < 6; ++r) XJ.m[r][r] = 1.0;
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c)
          XJ.m[r + 3][c] = -qi[0] * K[r * 3 + c];
    } else {                           // revolute Rodrigues: E = I - sK + (1-c)K^2
      const double* a = rb.axis + 3 * i;
      const double K[9] = {0, -a[2], a[1], a[2], 0, -a[0], -a[1], a[0], 0};
      const double s = std::sin(qi[0]), cc = 1.0 - std::cos(qi[0]);
      double E[9];
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) {
          double kk = 0;
          for (int k = 0; k < 3; ++k) kk += K[r * 3 + k] * K[k * 3 + c];
          E[r * 3 + c] = (r == c ? 1.0 : 0.0) - s * K[r * 3 + c] + cc * kk;
        }
      xj_from_E(E, nullptr, XJ);
    }
    Mat6 XT;
    std::memcpy(&XT.m[0][0], rb.XT + 36 * i, sizeof(XT.m));
    matmat(XJ, XT, X[i]);
  }
}

// column c of joint i's (6, w) motion subspace
inline void S_col(const MdRobot& rb, int i, int c, double* s6) {
  for (int r = 0; r < 6; ++r) s6[r] = 0.0;
  const int t = rb.jtype[i];
  if (t == 3 || t == 2) {
    s6[c] = 1.0;                       // I6 / angular-identity columns
  } else if (t == 1) {
    for (int r = 0; r < 3; ++r) s6[3 + r] = rb.axis[3 * i + r];
  } else {
    for (int r = 0; r < 3; ++r) s6[r] = rb.axis[3 * i + r];
  }
}

// generalized RNEA: tau(nv) = ID(q, qd, qdd) (qdd nullable -> bias force);
// damping * qd always added (multidof.py::md_rnea semantics)
void rnea(const MdRobot& rb, const std::vector<Mat6>& X, const double* qd,
          const double* qdd, double gravity, double* tau_out) {
  const int n = rb.n;
  std::vector<double> v(6 * n), a(6 * n), f(6 * n);
  for (int i = 0; i < n; ++i) {
    const int p = rb.parents[i];
    const int w = vwidth(rb.jtype[i]);
    double vJ[6] = {0, 0, 0, 0, 0, 0}, s6[6];
    for (int c = 0; c < w; ++c) {
      S_col(rb, i, c, s6);
      for (int r = 0; r < 6; ++r) vJ[r] += s6[r] * qd[rb.vs[i] + c];
    }
    double* vi = &v[6 * i];
    double* ai = &a[6 * i];
    if (p < 0) {
      for (int r = 0; r < 6; ++r) vi[r] = vJ[r];
      double ab[6] = {0, 0, 0, 0, 0, -gravity};
      matvec(X[i], ab, ai);
    } else {
      matvec(X[i], &v[6 * p], vi);
      for (int r = 0; r < 6; ++r) vi[r] += vJ[r];
      matvec(X[i], &a[6 * p], ai);
    }
    double cr[6];
    crm_apply(vi, vJ, cr);
    for (int r = 0; r < 6; ++r) ai[r] += cr[r];
    if (qdd) {
      for (int c = 0; c < w; ++c) {
        S_col(rb, i, c, s6);
        for (int r = 0; r < 6; ++r) ai[r] += s6[r] * qdd[rb.vs[i] + c];
      }
    }
    Mat6 I;
    std::memcpy(&I.m[0][0], rb.inertia + 36 * i, sizeof(I.m));
    double Iv[6], Ia[6], cf[6];
    matvec(I, vi, Iv);
    matvec(I, ai, Ia);
    crf_apply(vi, Iv, cf);
    for (int r = 0; r < 6; ++r) f[6 * i + r] = Ia[r] + cf[r];
  }
  for (int i = n - 1; i >= 0; --i) {
    const int p = rb.parents[i];
    if (p >= 0) {
      double up[6];
      matTvec(X[i], &f[6 * i], up);
      for (int r = 0; r < 6; ++r) f[6 * p + r] += up[r];
    }
  }
  for (int i = 0; i < n; ++i) {
    const int w = vwidth(rb.jtype[i]);
    double s6[6];
    for (int c = 0; c < w; ++c) {
      S_col(rb, i, c, s6);
      double acc = 0;
      for (int r = 0; r < 6; ++r) acc += s6[r] * f[6 * i + r];
      const int j = rb.vs[i] + c;
      tau_out[j] = acc + rb.damping[j] * qd[j]
                   + (qdd ? rb.armature[j] * qdd[j] : 0.0);
    }
  }
}

// generalized CRBA: dense symmetric M (nv x nv, row-major)
void crba(const MdRobot& rb, const std::vector<Mat6>& X, double* M) {
  const int n = rb.n, nv = rb.nv;
  std::vector<Mat6> IC(n);
  for (int i = 0; i < n; ++i)
    std::memcpy(&IC[i].m[0][0], rb.inertia + 36 * i, sizeof(IC[i].m));
  for (int i = n - 1; i >= 0; --i) {
    const int p = rb.parents[i];
    if (p >= 0) {
      Mat6 T1, T2;
      matmat(IC[i], X[i], T1);     // IC_i X_i
      matTmat(X[i], T1, T2);       // X_i^T IC_i X_i
      for (int k = 0; k < 36; ++k) (&IC[p].m[0][0])[k] += (&T2.m[0][0])[k];
    }
  }
  for (int k = 0; k < nv * nv; ++k) M[k] = 0.0;
  for (int i = 0; i < n; ++i) {
    const int wi = vwidth(rb.jtype[i]);
    double F[36];                    // 6 x wi column-major-by-c
    double s6[6];
    for (int c = 0; c < wi; ++c) {
      S_col(rb, i, c, s6);
      matvec(IC[i], s6, F + 6 * c);
    }
    for (int ci = 0; ci < wi; ++ci)
      for (int cj = 0; cj < wi; ++cj) {
        S_col(rb, i, cj, s6);
        double acc = 0;
        for (int r = 0; r < 6; ++r) acc += s6[r] * F[6 * ci + r];
        if (ci == cj) acc += rb.armature[rb.vs[i] + ci];  // rotor inertia
        M[(rb.vs[i] + ci) * nv + (rb.vs[i] + cj)] = acc;
      }
    int j = i;
    while (rb.parents[j] >= 0) {
      for (int c = 0; c < wi; ++c) {
        double t[6];
        matTvec(X[j], F + 6 * c, t);
        std::memcpy(F + 6 * c, t, sizeof(t));
      }
      j = rb.parents[j];
      const int wj = vwidth(rb.jtype[j]);
      for (int ci = 0; ci < wi; ++ci)
        for (int cj = 0; cj < wj; ++cj) {
          S_col(rb, j, cj, s6);
          double acc = 0;
          for (int r = 0; r < 6; ++r) acc += s6[r] * F[6 * ci + r];
          M[(rb.vs[i] + ci) * nv + (rb.vs[j] + cj)] = acc;
          M[(rb.vs[j] + cj) * nv + (rb.vs[i] + ci)] = acc;
        }
    }
  }
}

}  // namespace md

extern "C" {

void grid_md_id(int n, int nv, int nq, const int* parents, const int* jtype,
                const int* q_start, const int* v_start, const double* XT,
                const double* axis, const double* inertia,
                const double* damping, const double* armature, const double* q, const double* qd,
                const double* qdd /* nullable */, double gravity,
                double* tau_out) {
  md::MdRobot rb{n, nv, nq, parents, jtype, q_start, v_start,
                 XT, axis, inertia, damping, armature};
  std::vector<Mat6> X;
  md::joint_xforms(rb, q, X);
  md::rnea(rb, X, qd, qdd, gravity, tau_out);
}

void grid_md_fd(int n, int nv, int nq, const int* parents, const int* jtype,
                const int* q_start, const int* v_start, const double* XT,
                const double* axis, const double* inertia,
                const double* damping, const double* armature, const double* q, const double* qd,
                const double* u, double gravity, double* qdd_out) {
  md::MdRobot rb{n, nv, nq, parents, jtype, q_start, v_start,
                 XT, axis, inertia, damping, armature};
  std::vector<Mat6> X;
  md::joint_xforms(rb, q, X);
  std::vector<double> c(nv), M(nv * nv);
  md::rnea(rb, X, qd, nullptr, gravity, c.data());
  md::crba(rb, X, M.data());
  // in-place Cholesky solve of M qdd = u - c
  std::vector<double> L(M);
  for (int i = 0; i < nv; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = L[i * nv + j];
      for (int k = 0; k < j; ++k) s -= L[i * nv + k] * L[j * nv + k];
      L[i * nv + j] = (i == j) ? std::sqrt(s) : s / L[j * nv + j];
    }
  }
  std::vector<double> y(nv);
  for (int i = 0; i < nv; ++i) {
    double s = u[i] - c[i];
    for (int k = 0; k < i; ++k) s -= L[i * nv + k] * y[k];
    y[i] = s / L[i * nv + i];
  }
  for (int i = nv - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < nv; ++k) s -= L[k * nv + i] * qdd_out[k];
    qdd_out[i] = s / L[i * nv + i];
  }
}

}  // extern "C"
