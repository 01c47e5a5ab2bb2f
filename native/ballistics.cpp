// Native ballistic simulation engine.
//
// The reference outsources its integrator to SciPy's ODEPACK/LSODA (Fortran,
// reference src/bcnf/simulation/physics.py:147) — the only "native" compute
// in its data pipeline. This is the framework's own native equivalent: an
// adaptive Dormand-Prince RK45 velocity integrator with the reference's exact
// position semantics (explicit Euler with the new velocity on the coarse
// frame grid, interpolated ground impact + freeze; physics.py:150-163), with
// a std::thread worker pool across trajectories.
//
// Used as (a) the host-side golden oracle for the JAX RK4 integrator,
// (b) a fast CPU fallback for dataset generation and resimulation on hosts
// without accelerators.
//
// Build: make -C native   (produces libballistics.so; see native/Makefile)
// Python bindings: bcnf_tpu/native.py (ctypes).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double norm() const { return std::sqrt(x * x + y * y + z * z); }
};

struct Params {
  Vec3 x0, v0, g, w, a;
  double b, m, rho, r;
};

// dv/dt = g - g*rho*(4/3)*pi*r^3/m - (0.5*b/m)*(v^2*v/||v|| - w^2*w/||w||) + a
// (elementwise drag form, reference physics.py:48; ||w||=0 guarded).
inline Vec3 ode(const Vec3& v, const Params& p) {
  const double buoy = p.rho * (4.0 / 3.0) * M_PI * p.r * p.r * p.r / p.m;
  const double vn = std::max(v.norm(), 1e-12);
  const double wn = std::max(p.w.norm(), 1e-12);
  const double k = 0.5 * p.b / p.m;
  Vec3 drag = {k * (v.x * v.x * v.x / vn - p.w.x * p.w.x * p.w.x / wn),
               k * (v.y * v.y * v.y / vn - p.w.y * p.w.y * p.w.y / wn),
               k * (v.z * v.z * v.z / vn - p.w.z * p.w.z * p.w.z / wn)};
  return {p.g.x - p.g.x * buoy - drag.x + p.a.x,
          p.g.y - p.g.y * buoy - drag.y + p.a.y,
          p.g.z - p.g.z * buoy - drag.z + p.a.z};
}

// One adaptive Dormand-Prince RK45 step; returns the accepted step size used
// and updates v and h_next.
inline void rk45_step(Vec3& v, double& t, double t_end, double& h,
                      const Params& p, double rtol, double atol) {
  // Dormand-Prince coefficients.
  static const double c2 = 1.0 / 5, c3 = 3.0 / 10, c4 = 4.0 / 5, c5 = 8.0 / 9;
  static const double a21 = 1.0 / 5;
  static const double a31 = 3.0 / 40, a32 = 9.0 / 40;
  static const double a41 = 44.0 / 45, a42 = -56.0 / 15, a43 = 32.0 / 9;
  static const double a51 = 19372.0 / 6561, a52 = -25360.0 / 2187,
                      a53 = 64448.0 / 6561, a54 = -212.0 / 729;
  static const double a61 = 9017.0 / 3168, a62 = -355.0 / 33,
                      a63 = 46732.0 / 5247, a64 = 49.0 / 176,
                      a65 = -5103.0 / 18656;
  static const double b1 = 35.0 / 384, b3 = 500.0 / 1113, b4 = 125.0 / 192,
                      b5 = -2187.0 / 6784, b6 = 11.0 / 84;
  static const double e1 = 71.0 / 57600, e3 = -71.0 / 16695, e4 = 71.0 / 1920,
                      e5 = -17253.0 / 339200, e6 = 22.0 / 525, e7 = -1.0 / 40;
  (void)c2; (void)c3; (void)c4; (void)c5;  // autonomous ODE: stages ignore t

  for (int attempt = 0; attempt < 50; ++attempt) {
    double hs = std::min(h, t_end - t);
    Vec3 k1 = ode(v, p);
    Vec3 k2 = ode(v + k1 * (a21 * hs), p);
    Vec3 k3 = ode(v + k1 * (a31 * hs) + k2 * (a32 * hs), p);
    Vec3 k4 = ode(v + k1 * (a41 * hs) + k2 * (a42 * hs) + k3 * (a43 * hs), p);
    Vec3 k5 = ode(v + k1 * (a51 * hs) + k2 * (a52 * hs) + k3 * (a53 * hs) +
                      k4 * (a54 * hs), p);
    Vec3 k6 = ode(v + k1 * (a61 * hs) + k2 * (a62 * hs) + k3 * (a63 * hs) +
                      k4 * (a64 * hs) + k5 * (a65 * hs), p);
    Vec3 vnew = v + (k1 * b1 + k3 * b3 + k4 * b4 + k5 * b5 + k6 * b6) * hs;
    Vec3 k7 = ode(vnew, p);
    Vec3 err = (k1 * e1 + k3 * e3 + k4 * e4 + k5 * e5 + k6 * e6 + k7 * e7) * hs;

    double sc_x = atol + rtol * std::max(std::abs(v.x), std::abs(vnew.x));
    double sc_y = atol + rtol * std::max(std::abs(v.y), std::abs(vnew.y));
    double sc_z = atol + rtol * std::max(std::abs(v.z), std::abs(vnew.z));
    double errnorm = std::sqrt(((err.x / sc_x) * (err.x / sc_x) +
                                (err.y / sc_y) * (err.y / sc_y) +
                                (err.z / sc_z) * (err.z / sc_z)) / 3.0);

    if (errnorm <= 1.0 || hs <= 1e-10) {
      t += hs;
      v = vnew;
      double factor = errnorm > 0 ? 0.9 * std::pow(errnorm, -0.2) : 5.0;
      h = hs * std::clamp(factor, 0.2, 5.0);
      return;
    }
    h = hs * std::clamp(0.9 * std::pow(errnorm, -0.2), 0.2, 1.0);
  }
}

// Integrate velocity from t to t_end adaptively.
inline void integrate_v(Vec3& v, double t, double t_end, const Params& p,
                        double rtol, double atol) {
  double h = (t_end - t) * 0.5;
  while (t < t_end - 1e-12) {
    rk45_step(v, t, t_end, h, p, rtol, atol);
  }
}

Params load_params(const double* row) {
  // row layout: x0(3), v0(3), g(3), w(3), b, m, rho, r, a(3)  — 19 values
  Params p;
  p.x0 = {row[0], row[1], row[2]};
  p.v0 = {row[3], row[4], row[5]};
  p.g = {row[6], row[7], row[8]};
  p.w = {row[9], row[10], row[11]};
  p.b = row[12];
  p.m = row[13];
  p.rho = row[14];
  p.r = row[15];
  p.a = {row[16], row[17], row[18]};
  return p;
}

void simulate_one(const Params& p, double dt, bool break_on_impact,
                  int n_steps, double rtol, double atol, double* out) {
  Vec3 v = p.v0;
  Vec3 x = p.x0;
  out[0] = x.x; out[1] = x.y; out[2] = x.z;
  bool impacted = false;
  for (int i = 1; i < n_steps; ++i) {
    integrate_v(v, (i - 1) * dt, i * dt, p, rtol, atol);
    if (!impacted) {
      Vec3 xn = x + v * dt;  // Euler with the NEW velocity (physics.py:154)
      if (break_on_impact && xn.z < 0) {
        double tau = (std::abs(v.z) > 1e-12) ? -x.z / v.z : 0.0;
        x = x + v * tau;  // interpolated impact point (physics.py:158-159)
        impacted = true;
      } else {
        x = xn;
      }
    }
    out[3 * i + 0] = x.x; out[3 * i + 1] = x.y; out[3 * i + 2] = x.z;
  }
}

void poi_one(const Params& p, double dt, double* out) {
  // Reference calculate_point_of_impact semantics incl. its old-velocity
  // position update (physics.py:255-276); 120 s cap with the 999 sentinel.
  Vec3 v = p.v0;
  Vec3 x = p.x0;
  double t = 0.0;
  while (t < 120.0) {
    Vec3 xn = x + v * dt;  // OLD velocity (physics.py:260)
    if (xn.z < 0) {
      double tau = (std::abs(v.z) > 1e-12) ? -x.z / v.z : 0.0;
      Vec3 poi = x + v * tau;
      out[0] = poi.x; out[1] = poi.y; out[2] = poi.z;
      return;
    }
    integrate_v(v, t, t + dt, p, 1e-8, 1e-10);
    x = xn;
    t += dt;
  }
  out[0] = out[1] = out[2] = 999.0;
}

template <typename Fn>
void parallel_for(int n, int n_threads, Fn fn) {
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> workers;
  int n_workers = std::min(n_threads, n);
  workers.reserve(n_workers);
  for (int w = 0; w < n_workers; ++w) {
    workers.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : workers) th.join();
}

}  // namespace

extern "C" {

// params: n x 19 (layout above); out: n x n_steps x 3
void simulate_trajectories(const double* params, int n, double T, double dt,
                           int break_on_impact, int n_steps, double rtol,
                           double atol, int n_threads, double* out) {
  (void)T;  // n_steps already encodes the grid length
  parallel_for(n, n_threads, [&](int i) {
    simulate_one(load_params(params + 19 * i), dt, break_on_impact != 0,
                 n_steps, rtol, atol, out + static_cast<long>(i) * n_steps * 3);
  });
}

// params: n x 19; out: n x 3
void points_of_impact(const double* params, int n, double dt, int n_threads,
                      double* out) {
  parallel_for(n, n_threads,
               [&](int i) { poi_one(load_params(params + 19 * i), dt, out + 3 * i); });
}

}  // extern "C"
