// Native PnP pose solver: SQPnP primary, EPnP fallback, Levenberg-
// Marquardt refinement — self-contained (no Eigen/OpenCV dependency).
//
// Replaces the reference's OpenCV calls (lib/pose_estimation.py:30-131)
// with the same contract: per-image foreground 3D<->2D correspondences,
// a sweep over focal-length proposals with intrinsics diag(f, f, 1) and
// principal point 0, positive-depth validity, mean-reprojection-error
// selection, and iterative refinement from the best candidate.
//
// Exposed via a C ABI for ctypes (see nerf_from_image_tpu/invert/pnp.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Small dense linear algebra (double precision).
// ---------------------------------------------------------------------------

// Jacobi eigendecomposition of a symmetric n x n matrix A (row major).
// Outputs eigenvalues (ascending) and eigenvectors as columns of V.
void jacobi_eigen(std::vector<double> a, int n, std::vector<double>& evals,
                  std::vector<double>& evecs) {
  std::vector<double> v(n * n, 0.0);
  for (int i = 0; i < n; ++i) v[i * n + i] = 1.0;

  for (int sweep = 0; sweep < 100; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += a[p * n + q] * a[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = a[p * n + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = a[p * n + p], aqq = a[q * n + q];
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
        double c = 1.0 / std::sqrt(1.0 + t * t);
        double s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = a[k * n + p], akq = a[k * n + q];
          a[k * n + p] = c * akp - s * akq;
          a[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = a[p * n + k], aqk = a[q * n + k];
          a[p * n + k] = c * apk - s * aqk;
          a[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = v[k * n + p], vkq = v[k * n + q];
          v[k * n + p] = c * vkp - s * vkq;
          v[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  // Sort ascending by eigenvalue.
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::vector<double> diag(n);
  for (int i = 0; i < n; ++i) diag[i] = a[i * n + i];
  std::sort(order.begin(), order.end(),
            [&](int x, int y) { return diag[x] < diag[y]; });
  evals.resize(n);
  evecs.resize(n * n);
  for (int i = 0; i < n; ++i) {
    evals[i] = diag[order[i]];
    for (int k = 0; k < n; ++k) evecs[k * n + i] = v[k * n + order[i]];
  }
}

// Solve a small symmetric positive (semi)definite system via Cholesky with
// damping fallback; a is n x n row-major, b is n. Returns false if singular.
bool solve_spd(std::vector<double> a, std::vector<double> b, int n,
               double* x) {
  for (int i = 0; i < n; ++i) {
    for (int j = i; j < n; ++j) {
      double sum = a[i * n + j];
      for (int k = 0; k < i; ++k) sum -= a[i * n + k] * a[j * n + k];
      if (i == j) {
        if (sum <= 1e-18) return false;
        a[i * n + i] = std::sqrt(sum);
      } else {
        a[j * n + i] = sum / a[i * n + i];
      }
    }
  }
  // Forward/backward substitution (a holds L in lower triangle).
  for (int i = 0; i < n; ++i) {
    double sum = b[i];
    for (int k = 0; k < i; ++k) sum -= a[i * n + k] * b[k];
    b[i] = sum / a[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double sum = b[i];
    for (int k = i + 1; k < n; ++k) sum -= a[k * n + i] * b[k];
    b[i] = sum / a[i * n + i];
  }
  std::memcpy(x, b.data(), n * sizeof(double));
  return true;
}

struct Mat3 {
  double m[9];
};
struct Vec3 {
  double v[3];
};

Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.v[1] * b.v[2] - a.v[2] * b.v[1],
          a.v[2] * b.v[0] - a.v[0] * b.v[2],
          a.v[0] * b.v[1] - a.v[1] * b.v[0]};
}

// Rodrigues: rotation vector -> matrix.
Mat3 rodrigues(const double* r) {
  double theta = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
  Mat3 out;
  if (theta < 1e-12) {
    for (int i = 0; i < 9; ++i) out.m[i] = (i % 4 == 0) ? 1.0 : 0.0;
    return out;
  }
  double kx = r[0] / theta, ky = r[1] / theta, kz = r[2] / theta;
  double c = std::cos(theta), s = std::sin(theta), c1 = 1.0 - c;
  out.m[0] = c + kx * kx * c1;
  out.m[1] = kx * ky * c1 - kz * s;
  out.m[2] = kx * kz * c1 + ky * s;
  out.m[3] = ky * kx * c1 + kz * s;
  out.m[4] = c + ky * ky * c1;
  out.m[5] = ky * kz * c1 - kx * s;
  out.m[6] = kz * kx * c1 - ky * s;
  out.m[7] = kz * ky * c1 + kx * s;
  out.m[8] = c + kz * kz * c1;
  return out;
}

// Rotation matrix -> rotation vector.
void rodrigues_inv(const Mat3& R, double* r) {
  double tr = R.m[0] + R.m[4] + R.m[8];
  double cos_t = std::max(-1.0, std::min(1.0, (tr - 1.0) / 2.0));
  double theta = std::acos(cos_t);
  if (theta < 1e-12) {
    r[0] = r[1] = r[2] = 0.0;
    return;
  }
  double rx = R.m[7] - R.m[5], ry = R.m[2] - R.m[6], rz = R.m[3] - R.m[1];
  double s = std::sqrt(rx * rx + ry * ry + rz * rz);
  if (s < 1e-12) {
    // theta ~ pi: extract axis from diagonal.
    double xx = std::sqrt(std::max(0.0, (R.m[0] + 1.0) / 2.0));
    double yy = std::sqrt(std::max(0.0, (R.m[4] + 1.0) / 2.0));
    double zz = std::sqrt(std::max(0.0, (R.m[8] + 1.0) / 2.0));
    // Fix signs using off-diagonals.
    if (R.m[1] < 0) yy = -yy;
    if (R.m[2] < 0) zz = -zz;
    r[0] = theta * xx;
    r[1] = theta * yy;
    r[2] = theta * zz;
    return;
  }
  double k = theta / s;
  r[0] = rx * k;
  r[1] = ry * k;
  r[2] = rz * k;
}

// ---------------------------------------------------------------------------
// EPnP (Lepetit et al.).
// ---------------------------------------------------------------------------

struct PnPResult {
  Mat3 R;
  Vec3 t;
  double err = 1e30;  // mean reprojection error (pixels in normalized units)
  bool valid = false;
};

// RMS over the 2n residual coordinates: ||residuals||_2 / sqrt(2n).
// This is cv2.solvePnPGeneric's reprojectionError definition (verified
// numerically against recorded cv2 outputs in
// tests/test_inversion_trajectory.py::test_native_pnp_matches_recorded_cv2);
// the candidate ranking, refinement acceptance, and focal sweep all
// compare these values, so the formula must match the reference's
// (lib/pose_estimation.py:64-105 ranks by cv2's err).
double mean_reproj_error(const double* pw, const double* uv, int n,
                         double f, const Mat3& R, const Vec3& t) {
  double total = 0.0;
  for (int i = 0; i < n; ++i) {
    const double* p = pw + 3 * i;
    double xc = R.m[0] * p[0] + R.m[1] * p[1] + R.m[2] * p[2] + t.v[0];
    double yc = R.m[3] * p[0] + R.m[4] * p[1] + R.m[5] * p[2] + t.v[1];
    double zc = R.m[6] * p[0] + R.m[7] * p[1] + R.m[8] * p[2] + t.v[2];
    double u = f * xc / zc, v = f * yc / zc;
    double du = u - uv[2 * i], dv = v - uv[2 * i + 1];
    total += du * du + dv * dv;
  }
  return std::sqrt(total / (2.0 * n));
}

// Horn alignment: find R, t s.t. pc ~= R * pw + t (pc known camera coords).
void horn_align(const double* pw, const double* pc, int n, Mat3& R, Vec3& t) {
  double cw[3] = {0, 0, 0}, cc[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      cw[d] += pw[3 * i + d];
      cc[d] += pc[3 * i + d];
    }
  for (int d = 0; d < 3; ++d) {
    cw[d] /= n;
    cc[d] /= n;
  }
  // Covariance H = sum (pw - cw)(pc - cc)^T.
  double h[9] = {0};
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        h[a * 3 + b] += (pw[3 * i + a] - cw[a]) * (pc[3 * i + b] - cc[b]);
  // SVD of H via eigen of H^T H (V) and H H^T (U).
  std::vector<double> hth(9), hht(9);
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) {
      double s1 = 0, s2 = 0;
      for (int k = 0; k < 3; ++k) {
        s1 += h[k * 3 + a] * h[k * 3 + b];
        s2 += h[a * 3 + k] * h[b * 3 + k];
      }
      hth[a * 3 + b] = s1;
      hht[a * 3 + b] = s2;
    }
  std::vector<double> ev1, V1, ev2, U2;
  jacobi_eigen(hth, 3, ev1, V1);  // columns: V (ascending)
  // R = U S V^T with U = H V / sigma; build directly:
  // For robustness use: M = H^T; R = V * U^T where H = U S V^T.
  // Compute U columns: u_i = H v_i / ||H v_i||.
  double U[9], Vm[9];
  for (int i = 0; i < 3; ++i) {
    int col = 2 - i;  // descending
    double v0 = V1[0 * 3 + col], v1 = V1[1 * 3 + col], v2 = V1[2 * 3 + col];
    double u0 = h[0] * v0 + h[1] * v1 + h[2] * v2;
    double u1 = h[3] * v0 + h[4] * v1 + h[5] * v2;
    double u2 = h[6] * v0 + h[7] * v1 + h[8] * v2;
    double norm = std::sqrt(u0 * u0 + u1 * u1 + u2 * u2);
    if (norm < 1e-12) {
      // Degenerate direction; complete with cross product later.
      u0 = u1 = u2 = 0.0;
    } else {
      u0 /= norm;
      u1 /= norm;
      u2 /= norm;
    }
    U[0 * 3 + i] = u0;
    U[1 * 3 + i] = u1;
    U[2 * 3 + i] = u2;
    Vm[0 * 3 + i] = v0;
    Vm[1 * 3 + i] = v1;
    Vm[2 * 3 + i] = v2;
  }
  // Complete degenerate third column of U via cross product.
  {
    Vec3 u0 = {U[0], U[3], U[6]};
    Vec3 u1 = {U[1], U[4], U[7]};
    double n2 = U[2] * U[2] + U[5] * U[5] + U[8] * U[8];
    if (n2 < 1e-12) {
      Vec3 u2 = cross(u0, u1);
      U[2] = u2.v[0];
      U[5] = u2.v[1];
      U[8] = u2.v[2];
    }
  }
  // R = U * diag(1,1,det(U V^T)) * V^T  (note: maps world->cam, pc = R pw).
  // Here H = sum dw dc^T, the aligning rotation is R = U' V'^T of H^T...
  // Use the standard Kabsch on H: R_cam = (U S V^T decomposition of H):
  // R = V_h U_h^T where H = U_h S V_h^T... We built U (of H) and V (of H).
  double Rm[9];
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += U[a * 3 + k] * Vm[b * 3 + k];
      Rm[a * 3 + b] = s;  // U V^T -- candidate
    }
  // Kabsch: R = U diag(1,1,d) V^T with d = det(U V^T); but our H maps
  // world (rows a) x cam (cols b): H = sum dw dc^T, so pc = R pw needs
  // R = (U V^T)^T with possible reflection fix.
  double det = Rm[0] * (Rm[4] * Rm[8] - Rm[5] * Rm[7]) -
               Rm[1] * (Rm[3] * Rm[8] - Rm[5] * Rm[6]) +
               Rm[2] * (Rm[3] * Rm[7] - Rm[4] * Rm[6]);
  if (det < 0) {
    // Flip last column of U.
    for (int a = 0; a < 3; ++a) U[a * 3 + 2] = -U[a * 3 + 2];
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += U[a * 3 + k] * Vm[b * 3 + k];
        Rm[a * 3 + b] = s;
      }
  }
  // pc - cc = R^T? Validate orientation: we want pc ~= R pw + t. With
  // H = sum (pw-cw)(pc-cc)^T, Kabsch gives R = V U^T ... transpose:
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) R.m[a * 3 + b] = Rm[b * 3 + a];
  t.v[0] = cc[0] - (R.m[0] * cw[0] + R.m[1] * cw[1] + R.m[2] * cw[2]);
  t.v[1] = cc[1] - (R.m[3] * cw[0] + R.m[4] * cw[1] + R.m[5] * cw[2]);
  t.v[2] = cc[2] - (R.m[6] * cw[0] + R.m[7] * cw[1] + R.m[8] * cw[2]);
}

// EPnP main. pw: (n, 3) world points; uv: (n, 2) image points (normalized
// by focal f externally? no — f passed, principal point 0).
PnPResult epnp_solve(const double* pw, const double* uv, int n, double f) {
  PnPResult result;
  if (n < 4) return result;

  // Control points: centroid + principal directions.
  double c0[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) c0[d] += pw[3 * i + d];
  for (int d = 0; d < 3; ++d) c0[d] /= n;
  std::vector<double> cov(9, 0.0);
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        cov[a * 3 + b] +=
            (pw[3 * i + a] - c0[a]) * (pw[3 * i + b] - c0[b]);
  for (int k = 0; k < 9; ++k) cov[k] /= n;
  std::vector<double> evals, evecs;
  jacobi_eigen(cov, 3, evals, evecs);

  double cws[4][3];
  for (int d = 0; d < 3; ++d) cws[0][d] = c0[d];
  for (int i = 0; i < 3; ++i) {
    double lam = std::sqrt(std::max(evals[2 - i], 1e-12));
    for (int d = 0; d < 3; ++d)
      cws[i + 1][d] = c0[d] + lam * evecs[d * 3 + (2 - i)];
  }

  // Barycentric coordinates: alphas solve [cw1-cw0, cw2-cw0, cw3-cw0] x =
  // p - cw0; alpha0 = 1 - sum.
  double cc_inv[9];
  {
    double m[9];
    for (int j = 0; j < 3; ++j)
      for (int d = 0; d < 3; ++d) m[d * 3 + j] = cws[j + 1][d] - cws[0][d];
    double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                 m[1] * (m[3] * m[8] - m[5] * m[6]) +
                 m[2] * (m[3] * m[7] - m[4] * m[6]);
    if (std::fabs(det) < 1e-12) return result;
    double inv_det = 1.0 / det;
    cc_inv[0] = (m[4] * m[8] - m[5] * m[7]) * inv_det;
    cc_inv[1] = (m[2] * m[7] - m[1] * m[8]) * inv_det;
    cc_inv[2] = (m[1] * m[5] - m[2] * m[4]) * inv_det;
    cc_inv[3] = (m[5] * m[6] - m[3] * m[8]) * inv_det;
    cc_inv[4] = (m[0] * m[8] - m[2] * m[6]) * inv_det;
    cc_inv[5] = (m[2] * m[3] - m[0] * m[5]) * inv_det;
    cc_inv[6] = (m[3] * m[7] - m[4] * m[6]) * inv_det;
    cc_inv[7] = (m[1] * m[6] - m[0] * m[7]) * inv_det;
    cc_inv[8] = (m[0] * m[4] - m[1] * m[3]) * inv_det;
  }
  std::vector<double> alphas(4 * n);
  for (int i = 0; i < n; ++i) {
    double d0 = pw[3 * i] - cws[0][0];
    double d1 = pw[3 * i + 1] - cws[0][1];
    double d2 = pw[3 * i + 2] - cws[0][2];
    double a1 = cc_inv[0] * d0 + cc_inv[1] * d1 + cc_inv[2] * d2;
    double a2 = cc_inv[3] * d0 + cc_inv[4] * d1 + cc_inv[5] * d2;
    double a3 = cc_inv[6] * d0 + cc_inv[7] * d1 + cc_inv[8] * d2;
    alphas[4 * i + 0] = 1.0 - a1 - a2 - a3;
    alphas[4 * i + 1] = a1;
    alphas[4 * i + 2] = a2;
    alphas[4 * i + 3] = a3;
  }

  // M^T M accumulation (12 x 12).
  std::vector<double> mtm(144, 0.0);
  for (int i = 0; i < n; ++i) {
    double u = uv[2 * i], v = uv[2 * i + 1];
    double row_u[12], row_v[12];
    for (int j = 0; j < 4; ++j) {
      double a = alphas[4 * i + j];
      row_u[3 * j + 0] = a * f;
      row_u[3 * j + 1] = 0.0;
      row_u[3 * j + 2] = -a * u;
      row_v[3 * j + 0] = 0.0;
      row_v[3 * j + 1] = a * f;
      row_v[3 * j + 2] = -a * v;
    }
    for (int a = 0; a < 12; ++a)
      for (int b = a; b < 12; ++b)
        mtm[a * 12 + b] += row_u[a] * row_u[b] + row_v[a] * row_v[b];
  }
  for (int a = 0; a < 12; ++a)
    for (int b = 0; b < a; ++b) mtm[a * 12 + b] = mtm[b * 12 + a];

  std::vector<double> evals12, evecs12;
  jacobi_eigen(mtm, 12, evals12, evecs12);

  // Null-space candidates v1..v4 (smallest eigenvalues first).
  double vk[4][12];
  for (int k = 0; k < 4; ++k)
    for (int d = 0; d < 12; ++d) vk[k][d] = evecs12[d * 12 + k];

  // Distances between world control points (6 pairs).
  int pair_a[6] = {0, 0, 0, 1, 1, 2};
  int pair_b[6] = {1, 2, 3, 2, 3, 3};
  double rho[6];
  for (int p = 0; p < 6; ++p) {
    double s = 0;
    for (int d = 0; d < 3; ++d) {
      double diff = cws[pair_a[p]][d] - cws[pair_b[p]][d];
      s += diff * diff;
    }
    rho[p] = s;
  }

  auto try_betas = [&](const double* betas) -> PnPResult {
    PnPResult cand;
    // Camera control points.
    double ccs[4][3];
    for (int j = 0; j < 4; ++j)
      for (int d = 0; d < 3; ++d) {
        double s = 0;
        for (int k = 0; k < 4; ++k) s += betas[k] * vk[k][3 * j + d];
        ccs[j][d] = s;
      }
    // Sign: camera points must have positive depth on average.
    std::vector<double> pc(3 * n);
    double zsum = 0;
    for (int i = 0; i < n; ++i) {
      for (int d = 0; d < 3; ++d) {
        double s = 0;
        for (int j = 0; j < 4; ++j) s += alphas[4 * i + j] * ccs[j][d];
        pc[3 * i + d] = s;
      }
      zsum += pc[3 * i + 2];
    }
    if (zsum < 0)
      for (int i = 0; i < 3 * n; ++i) pc[i] = -pc[i];
    Mat3 R;
    Vec3 t;
    horn_align(pw, pc.data(), n, R, t);
    cand.R = R;
    cand.t = t;
    cand.err = mean_reproj_error(pw, uv, n, f, R, t);
    cand.valid = t.v[2] > 0;
    return cand;
  };

  // Gauss-Newton refinement of betas against control-point distances.
  auto gauss_newton_betas = [&](double* betas, int iters) {
    for (int it = 0; it < iters; ++it) {
      std::vector<double> A(6 * 4), r(6);
      for (int p = 0; p < 6; ++p) {
        // d_p(beta) = || sum_k beta_k (vk[a] - vk[b]) ||^2
        double dv[4][3];
        for (int k = 0; k < 4; ++k)
          for (int d = 0; d < 3; ++d)
            dv[k][d] = vk[k][3 * pair_a[p] + d] - vk[k][3 * pair_b[p] + d];
        double cur[3] = {0, 0, 0};
        for (int k = 0; k < 4; ++k)
          for (int d = 0; d < 3; ++d) cur[d] += betas[k] * dv[k][d];
        double dist = cur[0] * cur[0] + cur[1] * cur[1] + cur[2] * cur[2];
        r[p] = rho[p] - dist;
        for (int k = 0; k < 4; ++k)
          A[p * 4 + k] = 2.0 * (cur[0] * dv[k][0] + cur[1] * dv[k][1] +
                                cur[2] * dv[k][2]);
      }
      // Normal equations (4x4).
      std::vector<double> ata(16, 0.0), atb(4, 0.0);
      for (int p = 0; p < 6; ++p)
        for (int a = 0; a < 4; ++a) {
          atb[a] += A[p * 4 + a] * r[p];
          for (int b = 0; b < 4; ++b)
            ata[a * 4 + b] += A[p * 4 + a] * A[p * 4 + b];
        }
      for (int a = 0; a < 4; ++a) ata[a * 4 + a] += 1e-9;
      double dx[4];
      if (!solve_spd(ata, atb, 4, dx)) break;
      for (int k = 0; k < 4; ++k) betas[k] += dx[k];
    }
  };

  // Case N=1: beta1 = sign/scale matching distances.
  // Case N=1 (cv2 epnp find_betas_approx_1): least squares over the
  // FULL 4-vector via unknowns (b11, b12, b13, b14) — distances
  // ~ b11 d11 + 2 b12 d12 + 2 b13 d13 + 2 b14 d14 — then
  // b1 = sqrt|b11|, bk = b1k / b1 (sign-folded through b11). A
  // scale-only init on v1 alone explores one ray of the kernel and
  // regularly converges to a mirrored local optimum (batch 1 of the
  // inversion trajectory golden found this).
  auto init_case1 = [&](double* betas) {
    std::vector<double> A(6 * 4), rr(6);
    for (int p = 0; p < 6; ++p) {
      double dv[4][3];
      for (int k = 0; k < 4; ++k)
        for (int d = 0; d < 3; ++d)
          dv[k][d] = vk[k][3 * pair_a[p] + d] - vk[k][3 * pair_b[p] + d];
      auto dot = [&](int a, int b) {
        return dv[a][0] * dv[b][0] + dv[a][1] * dv[b][1] +
               dv[a][2] * dv[b][2];
      };
      A[p * 4 + 0] = dot(0, 0);
      A[p * 4 + 1] = 2.0 * dot(0, 1);
      A[p * 4 + 2] = 2.0 * dot(0, 2);
      A[p * 4 + 3] = 2.0 * dot(0, 3);
      rr[p] = rho[p];
    }
    std::vector<double> ata(16, 0.0), atb(4, 0.0);
    for (int p = 0; p < 6; ++p)
      for (int a = 0; a < 4; ++a) {
        atb[a] += A[p * 4 + a] * rr[p];
        for (int b = 0; b < 4; ++b)
          ata[a * 4 + b] += A[p * 4 + a] * A[p * 4 + b];
      }
    for (int a = 0; a < 4; ++a) ata[a * 4 + a] += 1e-9;
    double x[4];
    if (!solve_spd(ata, atb, 4, x)) {
      betas[0] = 1e-3;
      betas[1] = betas[2] = betas[3] = 0.0;
      return;
    }
    const double sgn = (x[0] < 0) ? -1.0 : 1.0;
    betas[0] = std::sqrt(std::fabs(x[0]));
    betas[1] = sgn * x[1] / betas[0];
    betas[2] = sgn * x[2] / betas[0];
    betas[3] = sgn * x[3] / betas[0];
  };

  // Case N=2 and N=3 approximate linearization (betas_ij = b_i b_j).
  auto init_case2 = [&](double* betas) {
    // Unknowns: b11, b12, b22 -> solve least squares over 6 distances.
    std::vector<double> A(6 * 3), rr(6);
    for (int p = 0; p < 6; ++p) {
      double d1[3], d2[3];
      for (int d = 0; d < 3; ++d) {
        d1[d] = vk[0][3 * pair_a[p] + d] - vk[0][3 * pair_b[p] + d];
        d2[d] = vk[1][3 * pair_a[p] + d] - vk[1][3 * pair_b[p] + d];
      }
      A[p * 3 + 0] = d1[0] * d1[0] + d1[1] * d1[1] + d1[2] * d1[2];
      A[p * 3 + 1] =
          2.0 * (d1[0] * d2[0] + d1[1] * d2[1] + d1[2] * d2[2]);
      A[p * 3 + 2] = d2[0] * d2[0] + d2[1] * d2[1] + d2[2] * d2[2];
      rr[p] = rho[p];
    }
    std::vector<double> ata(9, 0.0), atb(3, 0.0);
    for (int p = 0; p < 6; ++p)
      for (int a = 0; a < 3; ++a) {
        atb[a] += A[p * 3 + a] * rr[p];
        for (int b = 0; b < 3; ++b)
          ata[a * 3 + b] += A[p * 3 + a] * A[p * 3 + b];
      }
    for (int a = 0; a < 3; ++a) ata[a * 3 + a] += 1e-9;
    double x[3];
    if (!solve_spd(ata, atb, 3, x)) {
      betas[0] = betas[1] = 1e-3;
      betas[2] = betas[3] = 0;
      return;
    }
    double b1 = std::sqrt(std::fabs(x[0]));
    double b2 = std::sqrt(std::fabs(x[2]));
    if (x[1] < 0) b2 = -b2;
    betas[0] = b1;
    betas[1] = b2;
    betas[2] = betas[3] = 0.0;
  };

  // Case N=3 (EPnP paper eq. 13 approximation): unknowns
  // (b11, b12, b22, b13, b23), least squares over the 6 distances, then
  // b1 = sqrt|b11|, b2 = sqrt|b22| sign(b12), b3 = b13 / b1.
  auto init_case3 = [&](double* betas) {
    std::vector<double> A(6 * 5), rr(6);
    for (int p = 0; p < 6; ++p) {
      double dv[3][3];
      for (int k = 0; k < 3; ++k)
        for (int d = 0; d < 3; ++d)
          dv[k][d] = vk[k][3 * pair_a[p] + d] - vk[k][3 * pair_b[p] + d];
      auto dot = [&](int a, int b) {
        return dv[a][0] * dv[b][0] + dv[a][1] * dv[b][1] +
               dv[a][2] * dv[b][2];
      };
      A[p * 5 + 0] = dot(0, 0);
      A[p * 5 + 1] = 2.0 * dot(0, 1);
      A[p * 5 + 2] = dot(1, 1);
      A[p * 5 + 3] = 2.0 * dot(0, 2);
      A[p * 5 + 4] = 2.0 * dot(1, 2);
      rr[p] = rho[p];
    }
    std::vector<double> ata(25, 0.0), atb(5, 0.0);
    for (int p = 0; p < 6; ++p)
      for (int a = 0; a < 5; ++a) {
        atb[a] += A[p * 5 + a] * rr[p];
        for (int b = 0; b < 5; ++b)
          ata[a * 5 + b] += A[p * 5 + a] * A[p * 5 + b];
      }
    for (int a = 0; a < 5; ++a) ata[a * 5 + a] += 1e-9;
    double x[5];
    if (!solve_spd(ata, atb, 5, x)) {
      betas[0] = betas[1] = betas[2] = 1e-3;
      betas[3] = 0;
      return;
    }
    double b1 = std::sqrt(std::fabs(x[0]));
    double b2 = std::sqrt(std::fabs(x[2]));
    if (x[1] < 0) b2 = -b2;
    betas[0] = b1;
    betas[1] = b2;
    betas[2] = (b1 > 1e-12) ? x[3] / b1 : 0.0;
    betas[3] = 0.0;
  };

  // cv2's EPnP selects among the beta cases purely by reprojection
  // error and returns that single pose; positive-depth validity is the
  // CALLER's check (select_best_valid_pose). Preferring valid
  // candidates here would diverge from the reference's fallback chain.
  // Candidate selection: the distance objective the Gauss-Newton betas
  // refinement descends is full of near-equal optima on noisy coords,
  // and its ENDPOINT is regularly a mirrored, negative-depth pose even
  // when the path passed straight through the good basin (batch 1 of
  // the inversion trajectory golden: cv2's 5-iteration GN happens to
  // stop in the good basin at err 0.257 where the converged endpoint
  // is an invalid tz=-0.03 at err 0.370). So evaluate a pose candidate
  // at EVERY GN iterate of every init case and prefer the best
  // positive-depth candidate; candidates cost one Horn alignment each
  // at tiny n. This is strictly more robust than cv2's endpoint-only
  // evaluation and identical on well-conditioned inputs.
  PnPResult best_valid, best_any;
  bool have_any = false;
  auto consider = [&](const PnPResult& cand) {
    if (cand.valid && cand.err < best_valid.err) best_valid = cand;
    if (!have_any || cand.err < best_any.err) {
      best_any = cand;
      have_any = true;
    }
  };
  for (int c = 0; c < 3; ++c) {
    double betas[4];
    if (c == 0)
      init_case1(betas);
    else if (c == 1)
      init_case2(betas);
    else
      init_case3(betas);
    consider(try_betas(betas));
    for (int it = 0; it < 10; ++it) {
      gauss_newton_betas(betas, 1);
      consider(try_betas(betas));
    }
  }
  return best_valid.valid ? best_valid : best_any;
}

// ---------------------------------------------------------------------------
// Levenberg-Marquardt refinement over (rvec, tvec).
// ---------------------------------------------------------------------------

double reproj_cost(const double* pw, const double* uv, int n, double f,
                   const double* rt) {
  Mat3 R = rodrigues(rt);
  Vec3 t = {rt[3], rt[4], rt[5]};
  return mean_reproj_error(pw, uv, n, f, R, t);
}

PnPResult lm_refine(const double* pw, const double* uv, int n, double f,
                    const Mat3& R0, const Vec3& t0, int iters) {
  double rt[6];
  rodrigues_inv(R0, rt);
  rt[3] = t0.v[0];
  rt[4] = t0.v[1];
  rt[5] = t0.v[2];

  double lambda = 1e-3;
  auto residuals = [&](const double* p, std::vector<double>& res) {
    Mat3 R = rodrigues(p);
    res.resize(2 * n);
    for (int i = 0; i < n; ++i) {
      const double* w = pw + 3 * i;
      double xc = R.m[0] * w[0] + R.m[1] * w[1] + R.m[2] * w[2] + p[3];
      double yc = R.m[3] * w[0] + R.m[4] * w[1] + R.m[5] * w[2] + p[4];
      double zc = R.m[6] * w[0] + R.m[7] * w[1] + R.m[8] * w[2] + p[5];
      double inv_z = 1.0 / zc;
      res[2 * i] = f * xc * inv_z - uv[2 * i];
      res[2 * i + 1] = f * yc * inv_z - uv[2 * i + 1];
    }
  };

  std::vector<double> res, res2;
  residuals(rt, res);
  double cost = 0;
  for (double r : res) cost += r * r;

  for (int it = 0; it < iters; ++it) {
    // Numeric Jacobian (6 params).
    std::vector<double> J(2 * n * 6);
    double eps = 1e-6;
    for (int k = 0; k < 6; ++k) {
      double saved = rt[k];
      rt[k] = saved + eps;
      residuals(rt, res2);
      rt[k] = saved;
      for (int i = 0; i < 2 * n; ++i)
        J[i * 6 + k] = (res2[i] - res[i]) / eps;
    }
    std::vector<double> jtj(36, 0.0), jtr(6, 0.0);
    for (int i = 0; i < 2 * n; ++i)
      for (int a = 0; a < 6; ++a) {
        jtr[a] += J[i * 6 + a] * res[i];
        for (int b = 0; b < 6; ++b)
          jtj[a * 6 + b] += J[i * 6 + a] * J[i * 6 + b];
      }
    bool improved = false;
    for (int attempt = 0; attempt < 6; ++attempt) {
      std::vector<double> damped = jtj;
      for (int a = 0; a < 6; ++a) damped[a * 6 + a] *= (1.0 + lambda);
      double dx[6];
      std::vector<double> neg_jtr(6);
      for (int a = 0; a < 6; ++a) neg_jtr[a] = -jtr[a];
      if (!solve_spd(damped, neg_jtr, 6, dx)) {
        lambda *= 10.0;
        continue;
      }
      double trial[6];
      for (int a = 0; a < 6; ++a) trial[a] = rt[a] + dx[a];
      residuals(trial, res2);
      double cost2 = 0;
      for (double r : res2) cost2 += r * r;
      if (cost2 < cost) {
        std::memcpy(rt, trial, sizeof(trial));
        res = res2;
        cost = cost2;
        lambda = std::max(lambda * 0.3, 1e-12);
        improved = true;
        break;
      }
      lambda *= 10.0;
    }
    if (!improved) break;
  }

  PnPResult out;
  out.R = rodrigues(rt);
  out.t = {rt[3], rt[4], rt[5]};
  out.err = mean_reproj_error(pw, uv, n, f, out.R, out.t);
  out.valid = out.t.v[2] > 0;
  return out;
}

// ---------------------------------------------------------------------------
// SQPnP (Terzakis & Lourakis, ECCV 2020): PnP as a quadratically
// constrained quadratic program over vec(R), solved by sequential
// quadratic programming from the small-eigenvalue eigenvectors of the
// data matrix. Matches the reference solver chain's primary attempt
// (lib/pose_estimation.py:60-61 uses cv2.SOLVEPNP_SQPNP first).
// ---------------------------------------------------------------------------

// Solves a dense n x n linear system in place (partial pivoting).
// Returns false when singular.
bool solve_linear(std::vector<double>& a, std::vector<double>& b, int n) {
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int r = col + 1; r < n; ++r)
      if (std::fabs(a[r * n + col]) > std::fabs(a[piv * n + col])) piv = r;
    if (std::fabs(a[piv * n + col]) < 1e-14) return false;
    if (piv != col) {
      for (int c = 0; c < n; ++c) std::swap(a[col * n + c], a[piv * n + c]);
      std::swap(b[col], b[piv]);
    }
    double inv = 1.0 / a[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      double fac = a[r * n + col] * inv;
      if (fac == 0.0) continue;
      for (int c = col; c < n; ++c) a[r * n + c] -= fac * a[col * n + c];
      b[r] -= fac * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (int c = r + 1; c < n; ++c) s -= a[r * n + c] * b[c];
    b[r] = s / a[r * n + r];
  }
  return true;
}

// Nearest rotation to a 3x3 matrix (Davenport q-method: the quaternion is
// the leading eigenvector of the symmetric 4x4 profile matrix).
void nearest_rotation(const double* m, Mat3& R) {
  const double m00 = m[0], m01 = m[1], m02 = m[2];
  const double m10 = m[3], m11 = m[4], m12 = m[5];
  const double m20 = m[6], m21 = m[7], m22 = m[8];
  std::vector<double> K = {
      m00 + m11 + m22, m21 - m12,       m02 - m20,       m10 - m01,
      m21 - m12,       m00 - m11 - m22, m01 + m10,       m02 + m20,
      m02 - m20,       m01 + m10,       m11 - m00 - m22, m12 + m21,
      m10 - m01,       m02 + m20,       m12 + m21,       m22 - m00 - m11};
  std::vector<double> evals, evecs;
  jacobi_eigen(K, 4, evals, evecs);
  // Largest eigenvalue is last (ascending); eigenvectors are columns.
  double qw = evecs[0 * 4 + 3], qx = evecs[1 * 4 + 3];
  double qy = evecs[2 * 4 + 3], qz = evecs[3 * 4 + 3];
  double nq = std::sqrt(qw * qw + qx * qx + qy * qy + qz * qz);
  qw /= nq; qx /= nq; qy /= nq; qz /= nq;
  R.m[0] = 1 - 2 * (qy * qy + qz * qz);
  R.m[1] = 2 * (qx * qy - qz * qw);
  R.m[2] = 2 * (qx * qz + qy * qw);
  R.m[3] = 2 * (qx * qy + qz * qw);
  R.m[4] = 1 - 2 * (qx * qx + qz * qz);
  R.m[5] = 2 * (qy * qz - qx * qw);
  R.m[6] = 2 * (qx * qz - qy * qw);
  R.m[7] = 2 * (qy * qz + qx * qw);
  R.m[8] = 1 - 2 * (qx * qx + qy * qy);
}

// Orthogonality residuals h(r) in R^6 for r = vec(R) by rows.
void so3_residuals(const double* r, double* h) {
  const double* r1 = r;
  const double* r2 = r + 3;
  const double* r3 = r + 6;
  auto dot3 = [](const double* a, const double* b) {
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
  };
  h[0] = dot3(r1, r1) - 1.0;
  h[1] = dot3(r2, r2) - 1.0;
  h[2] = dot3(r3, r3) - 1.0;
  h[3] = dot3(r1, r2);
  h[4] = dot3(r1, r3);
  h[5] = dot3(r2, r3);
}

PnPResult sqpnp_solve(const double* pw, const double* uv, int n, double f) {
  PnPResult result;
  if (n < 4) return result;

  // Accumulate Omega = sum A_i^T W_i A_i  and the t-elimination blocks,
  // with W_i = Q_i^T Q_i, Q_i = [1 0 -u; 0 1 -v] (image coords on the
  // unit-focal plane).
  double sw[9] = {0};      // sum W_i (3x3)
  std::vector<double> swa(27, 0.0);  // sum W_i A_i (3x9)
  std::vector<double> omega(81, 0.0);  // sum A_i^T W_i A_i (9x9)
  for (int i = 0; i < n; ++i) {
    const double u = uv[2 * i] / f;
    const double v = uv[2 * i + 1] / f;
    const double* p = pw + 3 * i;
    // W = [[1, 0, -u], [0, 1, -v], [-u, -v, u^2+v^2]].
    const double W[9] = {1, 0, -u, 0, 1, -v, -u, -v, u * u + v * v};
    for (int a = 0; a < 9; ++a) sw[a] += W[a];
    // A_i has rows [p 0 0; 0 p 0; 0 0 p] => (W A)_{a, 3b+c} = W[a,b] p[c].
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        for (int c = 0; c < 3; ++c)
          swa[a * 9 + 3 * b + c] += W[a * 3 + b] * p[c];
    // (A^T W A)_{3a+c, 3b+d} = W[a,b] p[c] p[d].
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b) {
        const double w = W[a * 3 + b];
        if (w == 0.0) continue;
        for (int c = 0; c < 3; ++c)
          for (int d = 0; d < 3; ++d)
            omega[(3 * a + c) * 9 + (3 * b + d)] += w * p[c] * p[d];
      }
  }

  // P = -(sum W)^{-1} (sum W A): solve 3x3 systems for each column.
  std::vector<double> P(27, 0.0);
  for (int col = 0; col < 9; ++col) {
    std::vector<double> a(sw, sw + 9);
    std::vector<double> b = {swa[0 * 9 + col], swa[1 * 9 + col],
                             swa[2 * 9 + col]};
    if (!solve_linear(a, b, 3)) return result;
    P[0 * 9 + col] = -b[0];
    P[1 * 9 + col] = -b[1];
    P[2 * 9 + col] = -b[2];
  }
  // Omega -= P^T (sum W) P  (the reduced quadratic form after
  // eliminating t; equals sum (A+P)^T W (A+P)).
  for (int a = 0; a < 9; ++a)
    for (int b = 0; b < 9; ++b) {
      double s = 0;
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
          s += P[i * 9 + a] * sw[i * 3 + j] * P[j * 9 + b];
      omega[a * 9 + b] -= s;
    }

  std::vector<double> evals, evecs;
  jacobi_eigen(omega, 9, evals, evecs);

  // SQP from +/- each eigenvector, smallest eigenvalue first (the
  // unconstrained minima come in sign pairs whose nearest rotations
  // differ; starting from both covers the mirrored basin). cv2's SQPnP
  // walks the spectrum until the error stops improving; on noisy
  // coords (e.g. an untrained bootstrap encoder early in the pipeline)
  // the best basin is regularly NOT among the 3 smallest — exploring
  // all 9 costs only 9 extra 15x15 KKT solves per focal proposal.
  const int kStarts = 18;
  for (int s_idx = 0; s_idx < kStarts; ++s_idx) {
    const double sign = (s_idx & 1) ? -1.0 : 1.0;
    double e[9];
    for (int a = 0; a < 9; ++a) e[a] = sign * evecs[a * 9 + (s_idx / 2)];
    Mat3 R0;
    nearest_rotation(e, R0);
    double r[9];
    std::memcpy(r, R0.m, sizeof(r));

    for (int it = 0; it < 15; ++it) {
      double h[6];
      so3_residuals(r, h);
      // KKT system: [2*Omega  H^T; H  0] [delta; lambda] = [-2*Omega r; -h].
      const int kn = 15;
      std::vector<double> kkt(kn * kn, 0.0), rhs(kn, 0.0);
      for (int a = 0; a < 9; ++a)
        for (int b = 0; b < 9; ++b) kkt[a * kn + b] = 2.0 * omega[a * 9 + b];
      // H = dh/dr (6x9).
      double H[6][9] = {{0}};
      for (int d = 0; d < 3; ++d) {
        for (int c = 0; c < 3; ++c) H[d][3 * d + c] = 2.0 * r[3 * d + c];
      }
      const int pairs[3][2] = {{0, 1}, {0, 2}, {1, 2}};
      for (int pi = 0; pi < 3; ++pi) {
        int a = pairs[pi][0], b = pairs[pi][1];
        for (int c = 0; c < 3; ++c) {
          H[3 + pi][3 * a + c] = r[3 * b + c];
          H[3 + pi][3 * b + c] = r[3 * a + c];
        }
      }
      for (int cr = 0; cr < 6; ++cr)
        for (int cc = 0; cc < 9; ++cc) {
          kkt[(9 + cr) * kn + cc] = H[cr][cc];
          kkt[cc * kn + (9 + cr)] = H[cr][cc];
        }
      for (int a = 0; a < 9; ++a) {
        double s = 0;
        for (int b = 0; b < 9; ++b) s += omega[a * 9 + b] * r[b];
        rhs[a] = -2.0 * s;
      }
      for (int cr = 0; cr < 6; ++cr) rhs[9 + cr] = -h[cr];
      if (!solve_linear(kkt, rhs, kn)) break;
      double step = 0;
      for (int a = 0; a < 9; ++a) {
        r[a] += rhs[a];
        step += rhs[a] * rhs[a];
      }
      if (step < 1e-20) break;
    }

    // Project back to SO(3) and recover t. The best candidate is chosen
    // by error REGARDLESS of depth sign — cv2's SQPnP returns its global
    // optimum even with tvec z < 0, and the reference then REJECTS it
    // and falls back to EPnP (select_best_valid_pose +
    // lib/pose_estimation.py:66-81). Filtering negative-z basins here
    // would instead return a worse positive-z local optimum and skip
    // that fallback — a recorded-trajectory divergence (batch 1 of
    // tests/golden/trajectory_inversion_l1.npz).
    Mat3 Rc;
    nearest_rotation(r, Rc);
    Vec3 t;
    for (int a = 0; a < 3; ++a) {
      double s = 0;
      for (int b = 0; b < 9; ++b) s += P[a * 9 + b] * Rc.m[b];
      t.v[a] = s;
    }
    double err = mean_reproj_error(pw, uv, n, f, Rc, t);
    if (err < result.err) {
      result.R = Rc;
      result.t = t;
      result.err = err;
      result.valid = t.v[2] > 0;
    }
  }
  return result;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI.
// ---------------------------------------------------------------------------

extern "C" {

// Solves PnP for a batch of images over focal proposals.
//
// coords:  (bs, h, w, 3) float64 canonical coordinates.
// masks:   (bs, h, w) uint8 foreground masks.
// focals:  (n_focals,) float64 focal proposals.
// refine:  nonzero -> run LM refinement from the best EPnP candidate.
// out_world2cam: (bs, 16) float64 — world2cam matrices INCLUDING the
//   reference's flip (diag(1,-1,-1,1) premultiplied; run
//   lib/pose_estimation.py:119-125 semantics).
// out_focal: (bs,) chosen focal; out_err: (bs,) best error (10.0 dummy).
void nfi_solve_pnp_batch(const double* coords, const uint8_t* masks, int bs,
                         int h, int w, const double* focals, int n_focals,
                         int refine, double* out_world2cam, double* out_focal,
                         double* out_err) {
  std::vector<double> pts_xyz, pts_uv;
  for (int b = 0; b < bs; ++b) {
    pts_xyz.clear();
    pts_uv.clear();
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        if (!masks[(b * h + y) * w + x]) continue;
        const double* p = coords + (((b * h) + y) * w + x) * 3;
        pts_xyz.push_back(p[0]);
        pts_xyz.push_back(p[1]);
        pts_xyz.push_back(p[2]);
        pts_uv.push_back(static_cast<double>(x) / w - 0.5);
        pts_uv.push_back(static_cast<double>(y) / h - 0.5);
      }
    }
    int n = static_cast<int>(pts_uv.size() / 2);

    PnPResult best;
    double best_focal = 1.0;
    if (n >= 4) {
      for (int fi = 0; fi < n_focals; ++fi) {
        double f = focals[fi];
        // Solver chain parity (lib/pose_estimation.py:57-75): SQPnP
        // first, EPnP as fallback when it yields no valid pose, then
        // iterative refinement from the chosen candidate.
        PnPResult cand = sqpnp_solve(pts_xyz.data(), pts_uv.data(), n, f);
        if (!cand.valid)
          cand = epnp_solve(pts_xyz.data(), pts_uv.data(), n, f);
        if (!cand.valid) continue;
        if (refine) {
          // Accepted whenever depth stays positive — the reference
          // replaces the pose unconditionally on a valid refine result,
          // even if its error is worse (lib/pose_estimation.py:87-103).
          PnPResult refined = lm_refine(pts_xyz.data(), pts_uv.data(), n, f,
                                        cand.R, cand.t, 20);
          if (refined.valid) cand = refined;
        }
        if (cand.valid && cand.err < best.err) {
          best = cand;
          best_focal = f;
        }
      }
    }

    double* m = out_world2cam + 16 * b;
    std::memset(m, 0, 16 * sizeof(double));
    if (best.valid) {
      // flip = diag(1,-1,-1,1); out = flip @ [R | t; 0 1].
      double sign[3] = {1.0, -1.0, -1.0};
      for (int r = 0; r < 3; ++r) {
        for (int c = 0; c < 3; ++c) m[r * 4 + c] = sign[r] * best.R.m[r * 3 + c];
        m[r * 4 + 3] = sign[r] * best.t.v[r];
      }
      m[15] = 1.0;
      out_focal[b] = best_focal;
      out_err[b] = best.err;
    } else {
      // Dummy pose pointing away from the object (pose_estimation.py:112-118).
      m[0] = 1.0;
      m[5] = -1.0;
      m[10] = -1.0;
      m[15] = 1.0;
      m[2 * 4 + 3] = 10.0;  // flip applied to tz=-10 -> +10
      out_focal[b] = 1.0;
      out_err[b] = 10.0;
    }
  }
}

// Solver-level probe for tests: runs one solver on pre-extracted point
// correspondences. solver_mode: 0 = chain (SQPnP -> EPnP fallback),
// 1 = SQPnP only, 2 = EPnP only. Returns the valid flag; fills R (9),
// t (3), err (1) with the raw (unflipped) camera pose.
int nfi_solve_pnp_single(const double* pts_xyz, const double* pts_uv, int n,
                         double f, int solver_mode, int refine,
                         double* out_r, double* out_t, double* out_err) {
  PnPResult cand;
  if (solver_mode == 0) {
    cand = sqpnp_solve(pts_xyz, pts_uv, n, f);
    if (!cand.valid) cand = epnp_solve(pts_xyz, pts_uv, n, f);
  } else if (solver_mode == 1) {
    cand = sqpnp_solve(pts_xyz, pts_uv, n, f);
  } else {
    cand = epnp_solve(pts_xyz, pts_uv, n, f);
  }
  if (refine && cand.valid) {
    PnPResult refined = lm_refine(pts_xyz, pts_uv, n, f, cand.R, cand.t, 20);
    if (refined.valid) cand = refined;
  }
  std::memcpy(out_r, cand.R.m, 9 * sizeof(double));
  std::memcpy(out_t, cand.t.v, 3 * sizeof(double));
  *out_err = cand.err;
  return cand.valid ? 1 : 0;
}

int nfi_pnp_version() { return 3; }  // 3: cv2-parity error metric + chain

}  // extern "C"
