// Native (CPU, C++) surface-wave dispersion solver — TRANSLITERATED
// GOLDEN, not an independent implementation.
//
// The secular-function core (var_q, dltar1/dltar4, dnka) deliberately
// mirrors the reference's Fortran branch-for-branch
// (src/extensions/surfdisp96.f: var / dltar1 / dltar4 / dnka) so that
// f64 bit-comparison tests isolate JAX-kernel bugs from formula
// differences, per SURVEY.md §7.  A mirrored golden cannot catch a
// bug inherited from the reference; the independent anchors are the
// committed reference-output fixtures (tests/fixtures/st3_*.dat) and
// the physics property tests (tests/test_native_physics.py).
//
// Build: see Makefile (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kTwoPi = 2.0 * M_PI;
constexpr double kDc = 0.005;    // phase-velocity grid step
constexpr double kHgr = 0.005;   // group-velocity frequency offset
constexpr double kEarthR = 6370.0;

struct Model {
  int nl;
  std::vector<double> d, a, b, rho;
  bool water;
};

double vert_wavenumber(double wvno, double xk) {
  return std::sqrt((wvno + xk) * std::fabs(wvno - xk));
}

// scaled cos/sin eigenfunction quantities for one wave type
void var_q(double pq, double r, double wvno, double xk, double dpth,
           double* cosp, double* w, double* x, double* ex) {
  if (wvno < xk) {  // propagating
    double sp = std::sin(pq);
    *w = (r == 0.0) ? dpth : sp / r;
    *x = -r * sp;
    *cosp = std::cos(pq);
    *ex = 0.0;
  } else {  // evanescent: carry exp(+pq) implicitly
    double fac = (pq < 16.0) ? std::exp(-2.0 * pq) : 0.0;
    double cosq_ = 0.5 * (1.0 + fac);
    double sinq_ = 0.5 * (1.0 - fac);
    *w = (r == 0.0) ? dpth : sinq_ / r;
    *x = r * sinq_;
    *cosp = cosq_;
    *ex = pq;
  }
}

// Love (SH) period equation: 2-vector Haskell recursion upward
double dltar1(double wvno, double omega, const Model& m) {
  int nl = m.nl;
  double rb = vert_wavenumber(wvno, omega / m.b[nl - 1]);
  double e1 = m.rho[nl - 1] * rb;
  double e2 = 1.0 / (m.b[nl - 1] * m.b[nl - 1]);

  int top = m.water ? 1 : 0;  // skip a surface water layer
  for (int i = nl - 2; i >= top; --i) {
    double xkb = omega / m.b[i];
    double rbi = vert_wavenumber(wvno, xkb);
    double xmu = m.rho[i] * m.b[i] * m.b[i];
    double cosq, y, z, ex;
    var_q(rbi * m.d[i], rbi, wvno, xkb, m.d[i], &cosq, &y, &z, &ex);
    double e10 = e1 * cosq + e2 * xmu * z;
    double e20 = e1 * y / xmu + e2 * cosq;
    double nrm = std::max(std::fabs(e10), std::fabs(e20));
    if (nrm < 1e-40) nrm = 1.0;
    e1 = e10 / nrm;
    e2 = e20 / nrm;
  }
  return e1;
}

// Rayleigh (P-SV) period equation: Dunkin 5-vector compound matrix
double dltar4(double wvno, double omega, const Model& m) {
  if (omega < 1.0e-4) omega = 1.0e-4;
  int nl = m.nl;
  double wvno2 = wvno * wvno;

  double ra = vert_wavenumber(wvno, omega / m.a[nl - 1]);
  double rb = vert_wavenumber(wvno, omega / m.b[nl - 1]);
  double t = m.b[nl - 1] / omega;
  double gammk = 2.0 * t * t;
  double gam = gammk * wvno2;
  double gamm1 = gam - 1.0;
  double r = m.rho[nl - 1];
  double e[5] = {
      r * r * (gamm1 * gamm1 - gam * gammk * ra * rb),
      -r * ra,
      r * (gamm1 - gammk * ra * rb),
      r * rb,
      wvno2 - ra * rb};

  for (int i = nl - 2; i >= 0; --i) {
    if (m.water && i == 0) break;  // water top handled below
    double xka = omega / m.a[i];
    double xkb = omega / m.b[i];
    double rai = vert_wavenumber(wvno, xka);
    double rbi = vert_wavenumber(wvno, xkb);
    double ti = m.b[i] / omega;
    double gammki = 2.0 * ti * ti;
    double gami = gammki * wvno2;

    double cosp, w, x, pex, cosq, y, z, sex;
    var_q(rai * m.d[i], rai, wvno, xka, m.d[i], &cosp, &w, &x, &pex);
    var_q(rbi * m.d[i], rbi, wvno, xkb, m.d[i], &cosq, &y, &z, &sex);
    double exa = pex + sex;
    double a0 = (exa < 60.0) ? std::exp(-exa) : 0.0;

    double cpcq = cosp * cosq, cpy = cosp * y, cpz = cosp * z;
    double cqw = cosq * w, cqx = cosq * x;
    double xy = x * y, xz = x * z, wy = w * y, wz = w * z;

    double rho = m.rho[i];
    double gamm1i = gami - 1.0;
    double twgm1 = gami + gamm1i;
    double gmgmk = gami * gammki;
    double gmgm1 = gami * gamm1i;
    double gm1sq = gamm1i * gamm1i;
    double rho2 = rho * rho;
    double a0pq = a0 - cpcq;

    double ca[5][5];
    ca[0][0] = cpcq - 2.0 * gmgm1 * a0pq - gmgmk * xz
               - wvno2 * gm1sq * wy;
    ca[0][1] = (wvno2 * cpy - cqx) / rho;
    ca[0][2] = -(twgm1 * a0pq + gammki * xz + wvno2 * gamm1i * wy)
               / rho;
    ca[0][3] = (cpz - wvno2 * cqw) / rho;
    ca[0][4] = -(2.0 * wvno2 * a0pq + xz + wvno2 * wvno2 * wy) / rho2;
    ca[1][0] = (gmgmk * cpz - gm1sq * cqw) * rho;
    ca[1][1] = cpcq;
    ca[1][2] = gammki * cpz - gamm1i * cqw;
    ca[1][3] = -wz;
    ca[1][4] = ca[0][3];
    ca[3][0] = (gm1sq * cpy - gmgmk * cqx) * rho;
    ca[3][1] = -xy;
    ca[3][2] = gamm1i * cpy - gammki * cqx;
    ca[3][3] = ca[1][1];
    ca[3][4] = ca[0][1];
    ca[4][0] = -(2.0 * gmgmk * gm1sq * a0pq + gmgmk * gmgmk * xz
                 + gm1sq * gm1sq * wy) * rho2;
    ca[4][1] = ca[3][0];
    ca[4][2] = -(gammki * gamm1i * twgm1 * a0pq
                 + gami * gammki * gammki * xz
                 + gamm1i * gm1sq * wy) * rho;
    ca[4][3] = ca[1][0];
    ca[4][4] = ca[0][0];
    double tt = -2.0 * wvno2;
    ca[2][0] = tt * ca[4][2];
    ca[2][1] = tt * ca[3][2];
    ca[2][2] = a0 + 2.0 * (cpcq - ca[0][0]);
    ca[2][3] = tt * ca[1][2];
    ca[2][4] = tt * ca[0][2];

    double ee[5];
    for (int j = 0; j < 5; ++j) {
      ee[j] = 0.0;
      for (int k = 0; k < 5; ++k) ee[j] += e[k] * ca[k][j];
    }
    double nrm = 0.0;
    for (int j = 0; j < 5; ++j) nrm = std::max(nrm, std::fabs(ee[j]));
    if (nrm < 1e-40) nrm = 1.0;
    for (int j = 0; j < 5; ++j) e[j] = ee[j] / nrm;
  }

  if (m.water) {
    double xka = omega / m.a[0];
    double ra0 = vert_wavenumber(wvno, xka);
    double cosp, w, x, ex;
    var_q(ra0 * m.d[0], ra0, wvno, xka, m.d[0], &cosp, &w, &x, &ex);
    return cosp * e[0] - m.rho[0] * w * e[1];
  }
  return e[0];
}

double secular(double c, double omega, int iwave, const Model& m) {
  double wvno = omega / c;
  return (iwave == 1) ? dltar1(wvno, omega, m) : dltar4(wvno, omega, m);
}

// Newton iterations on the halfspace Rayleigh equation
double gtsolh(double a, double b) {
  double c = 0.95 * b;
  for (int i = 0; i < 5; ++i) {
    double gamma = b / a;
    double kappa = c / b;
    double k2 = kappa * kappa;
    double gk2 = (gamma * kappa) * (gamma * kappa);
    double fac1 = std::sqrt(std::max(1.0 - gk2, 1e-30));
    double fac2 = std::sqrt(std::max(1.0 - k2, 1e-30));
    double fr = (2.0 - k2) * (2.0 - k2) - 4.0 * fac1 * fac2;
    double frp = (-4.0 * (2.0 - k2) * kappa
                  + 4.0 * fac2 * gamma * gamma * kappa / fac1
                  + 4.0 * fac1 * kappa / fac2) / b;
    c -= fr / frp;
  }
  return c;
}

// spherical-earth flattening (layer-midpoint mapping, Biswas density)
void sphere_flatten(Model* m, int iwave) {
  int nl = m->nl;
  std::vector<double> d_eff(m->d);
  d_eff[nl - 1] = 1.0;
  double zt = 0.0;
  double ex = (iwave == 1) ? -5.0 : -2.275;
  for (int i = 0; i < nl; ++i) {
    double zb = zt + d_eff[i];
    double r0 = kEarthR - zt;
    double r1 = kEarthR - zb;
    double z0 = kEarthR * std::log(kEarthR / r0);
    double z1 = kEarthR * std::log(kEarthR / r1);
    double tmp = (kEarthR + kEarthR) / (r0 + r1);
    m->d[i] = z1 - z0;
    m->a[i] *= tmp;
    m->b[i] *= tmp;
    m->rho[i] *= std::pow(tmp, ex);
    zt = zb;
  }
  m->d[nl - 1] = 0.0;
}

// find the `mode`-th sign change of the secular function above cm;
// returns refined root or -1 on failure
double find_root(double omega, double cm, double betmx, int iwave,
                 int mode, const Model& m) {
  double s_prev = secular(cm, omega, iwave, m);
  int count = 0;
  double c = cm;
  double lo = -1.0;
  while (c <= betmx + kDc) {
    double cn = c + kDc;
    double s = secular(cn, omega, iwave, m);
    if ((s > 0) != (s_prev > 0)) {
      if (++count == mode) { lo = c; break; }
    }
    s_prev = s;
    c = cn;
  }
  if (lo < 0.0) return -1.0;
  // bisection to ~1e-10 relative
  double hi = lo + kDc;
  double s_lo = secular(lo, omega, iwave, m);
  for (int i = 0; i < 50; ++i) {
    double mid = 0.5 * (lo + hi);
    double s_mid = secular(mid, omega, iwave, m);
    if ((s_mid > 0) == (s_lo > 0)) { lo = mid; s_lo = s_mid; }
    else hi = mid;
  }
  return 0.5 * (lo + hi);
}

}  // namespace

extern "C" {

// Dispersion curve for a layered model.  Mirrors the reference entry
// point semantics (reference: src/extensions/surfdisp96.f:55-56):
//   h/vp/vs/rho[nlayer], halfspace last (h[nlayer-1] ignored)
//   iflsph 0 flat / 1 spherical;  iwave 1 Love / 2 Rayleigh
//   mode >= 1;  igr 0 phase / 1 group;  kmax periods in t[]
// Returns 0 on success; on failure returns 1 with cg zero-filled from
// the first failing period.
int bh_surfdisp(const double* h, const double* vp, const double* vs,
                const double* rho, int nlayer, int iflsph, int iwave,
                int mode, int igr, int kmax, const double* t,
                double* cg) {
  Model m;
  m.nl = nlayer;
  m.d.assign(h, h + nlayer);
  m.a.assign(vp, vp + nlayer);
  m.b.assign(vs, vs + nlayer);
  m.rho.assign(rho, rho + nlayer);
  m.d[nlayer - 1] = 0.0;
  m.water = m.b[0] <= 0.0;
  if (iflsph == 1) sphere_flatten(&m, iwave);

  // lower bound cm and maximum velocity
  double betmn = 1e30, betmx = 0.0;
  int jmn = 0;
  bool jsol = true;
  for (int i = 0; i < m.nl; ++i) {
    double cand = (m.b[i] > 0.01) ? m.b[i] : m.a[i];
    if (cand < betmn) { betmn = cand; jmn = i; jsol = m.b[i] > 0.01; }
    betmx = std::max(betmx, m.b[i]);
  }
  double cc1 = jsol ? gtsolh(m.a[jmn], m.b[jmn]) : betmn;
  double cm = 0.95 * 0.90 * cc1;

  int err = 0;
  bool failed = false;
  for (int k = 0; k < kmax; ++k) {
    double out = 0.0;
    if (!failed) {
      if (igr > 0) {
        double t1a = t[k] / (1.0 + kHgr);
        double t1b = t[k] / (1.0 - kHgr);
        double ca = find_root(kTwoPi / t1a, cm, betmx, iwave, mode, m);
        double cb = find_root(kTwoPi / t1b, cm, betmx, iwave, mode, m);
        if (ca < 0.0 || cb < 0.0) { failed = true; err = 1; }
        else {
          out = (1.0 / t1a - 1.0 / t1b)
                / (1.0 / (t1a * ca) - 1.0 / (t1b * cb));
        }
      } else {
        double c = find_root(kTwoPi / t[k], cm, betmx, iwave, mode, m);
        if (c < 0.0) { failed = true; err = 1; }
        else out = c;
      }
    }
    cg[k] = failed ? 0.0 : out;
  }
  return err;
}

}  // extern "C"
