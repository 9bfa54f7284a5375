// Native host kernels for the simplex-polynomial algebra and the
// rotation/Euler helpers.
//
// This is the C++ equivalent of the reference's native layer
// (simplex_accel.pyx:28-209 and the used subset of
// _transformations.c): index-table generation for the truncated
// multinomial algebra plus tight mul/pow/eval loops for the
// host-side PolyTrace path.  The JAX/TPU path uses the same tables
// through rayopt_tpu.ops.simplex; NumPy fallbacks exist for every
// entry point (see rayopt_tpu/native/build.py).
//
// Exported with C linkage for ctypes.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// Number of points in the d-m simplex: C(m + d - 1, d).
int64_t simplex_size(int d, int m) {
    int64_t n = 1, p = 1;
    for (int i = 0; i < d; i++) {
        n *= m + i;
        p *= i + 1;
    }
    return n / p;
}

// Enumerate the d-m simplex in the same order as
// rayopt_tpu.ops.simplex.simplex_iter (reference simplex.py:53):
// recursive over dimensions, first index is the residual.
void simplex_enum_rec(int d, int m, std::vector<int> &cur,
                      std::vector<std::vector<int>> &out) {
    if (d == 0) {
        out.push_back(cur);
        return;
    }
    for (int i = 0; i < m; i++) {
        // by construction the recursion yields tuples summing to <= i
        std::vector<std::vector<int>> sub;
        std::vector<int> c2;
        simplex_enum_rec(d - 1, i + 1, c2, sub);
        for (auto &j : sub) {
            int s = 0;
            for (int v : j) s += v;
            std::vector<int> row;
            row.push_back(i - s);
            for (int v : j) row.push_back(v);
            std::vector<int> full(cur);
            for (int v : row) full.push_back(v);
            out.push_back(full);
        }
    }
}

void simplex_tuples(int d, int m, std::vector<std::vector<int>> &out) {
    std::vector<int> cur;
    simplex_enum_rec(d, m, cur, out);
}

int64_t flat_index(const std::vector<int> &idx, int m, int d) {
    int64_t f = 0;
    for (int k = 0; k < d; k++) f = f * m + idx[k];
    return f;
}

}  // namespace

extern "C" {

// Fill idx (m^d int32, forward map) and jdx (q*d int32, backward map).
// Returns q.
int64_t rsx_simplex_enum(int d, int m, int32_t *idx, int32_t *jdx) {
    std::vector<std::vector<int>> tuples;
    simplex_tuples(d, m, tuples);
    int64_t q = (int64_t)tuples.size();
    for (int64_t j = 0; j < q; j++) {
        idx[flat_index(tuples[j], m, d)] = (int32_t)j;
        for (int k = 0; k < d; k++) jdx[j * d + k] = tuples[j][k];
    }
    return q;
}

// Multiplication table: for every product term write (out, ia, ib).
// Caller allocates simplex_size(2d, m) triples.  Returns the count.
int64_t rsx_mul_table(int d, int m, int32_t *out, int32_t *ia,
                      int32_t *ib) {
    std::vector<std::vector<int>> tuples;
    simplex_tuples(d, m, tuples);
    int64_t q = (int64_t)tuples.size();
    // forward map
    std::vector<int32_t> idx((size_t)1, 0);
    {
        size_t tot = 1;
        for (int k = 0; k < d; k++) tot *= m;
        idx.assign(tot, 0);
        for (int64_t j = 0; j < q; j++)
            idx[flat_index(tuples[j], m, d)] = (int32_t)j;
    }
    std::vector<std::vector<int>> pairs;
    simplex_tuples(2 * d, m, pairs);
    int64_t t = 0;
    std::vector<int> p(d), r(d), s(d);
    for (auto &pq : pairs) {
        for (int k = 0; k < d; k++) {
            p[k] = pq[2 * k];
            r[k] = pq[2 * k + 1];
            s[k] = p[k] + r[k];
        }
        out[t] = idx[flat_index(s, m, d)];
        ia[t] = idx[flat_index(p, m, d)];
        ib[t] = idx[flat_index(r, m, d)];
        t++;
    }
    return t;
}

// c = a * b through the (out, ia, ib) table.
void rsx_mul(const int32_t *out, const int32_t *ia, const int32_t *ib,
             int64_t nterms, const double *a, const double *b,
             double *c, int64_t q) {
    std::memset(c, 0, (size_t)q * sizeof(double));
    for (int64_t t = 0; t < nterms; t++)
        c[out[t]] += a[ia[t]] * b[ib[t]];
}

// c = a * b through a table grouped by output coefficient:
// starts[o]..starts[o+1] are the (ia, ib) pairs of c[o].  Register
// accumulation + sequential stores instead of the scattered
// read-modify-write of rsx_mul.
void rsx_mul_grouped(const int32_t *ia, const int32_t *ib,
                     const int64_t *starts, int64_t q,
                     const double *a, const double *b, double *c) {
    for (int64_t o = 0; o < q; o++) {
        double acc = 0.0;
        for (int64_t t = starts[o]; t < starts[o + 1]; t++)
            acc += a[ia[t]] * b[ib[t]];
        c[o] = acc;
    }
}

// z = a ** p, binomial series, using the grouped table.
void rsx_pow_grouped(const int32_t *ia, const int32_t *ib,
                     const int64_t *starts, int64_t q, int order,
                     const double *a, double p, double *z) {
    std::vector<double> x(a, a + q), y(q), w(q);
    x[0] = 0.0;
    for (int64_t i = 0; i < q; i++) {
        y[i] = p * x[i];
        z[i] = y[i];
    }
    z[0] += 1.0;
    for (int i = 1; i < order; i++) {
        rsx_mul_grouped(ia, ib, starts, q, x.data(), y.data(),
                        w.data());
        double f = (p - i) / (i + 1.0);
        for (int64_t jj = 0; jj < q; jj++) {
            y[jj] = f * w[jj];
            z[jj] += y[jj];
        }
    }
    double a0p = std::pow(a[0], p);
    for (int64_t i = 0; i < q; i++) z[i] *= a0p;
}

// z = a ** p as the binomial series around a[0]
// (reference simplex_accel.pyx:49-72).
void rsx_pow(const int32_t *out, const int32_t *ia, const int32_t *ib,
             int64_t nterms, int order, const double *a, double p,
             double *z, int64_t q) {
    std::vector<double> x(a, a + q), y(q), w(q);
    x[0] = 0.0;
    for (int64_t i = 0; i < q; i++) {
        y[i] = p * x[i];
        z[i] = y[i];
    }
    z[0] += 1.0;
    for (int i = 1; i < order; i++) {
        rsx_mul(out, ia, ib, nterms, x.data(), y.data(), w.data(), q);
        double f = (p - i) / (i + 1.0);
        for (int64_t jj = 0; jj < q; jj++) {
            y[jj] = f * w[jj];
            z[jj] += y[jj];
        }
    }
    double a0p = std::pow(a[0], p);
    for (int64_t i = 0; i < q; i++) z[i] *= a0p;
}

// y[e] = sum_i a[i] prod_k x[k*npts + e] ** jdx[i*d + k]
// (reference simplex_accel.pyx:75-96).
void rsx_eval(const int32_t *jdx, int64_t q, int d, const double *a,
              const double *x, int64_t npts, double *y) {
    int nmax = 0;
    for (int64_t i = 0; i < q * d; i++)
        if (jdx[i] > nmax) nmax = jdx[i];
    std::vector<double> xp((size_t)d * (nmax + 1));
    for (int64_t e = 0; e < npts; e++) {
        for (int k = 0; k < d; k++) {
            double *row = &xp[(size_t)k * (nmax + 1)];
            row[0] = 1.0;
            for (int j = 1; j <= nmax; j++)
                row[j] = row[j - 1] * x[(size_t)k * npts + e];
        }
        double acc = 0.0;
        for (int64_t i = 0; i < q; i++) {
            double v = a[i];
            for (int k = 0; k < d; k++)
                v *= xp[(size_t)k * (nmax + 1) + jdx[i * d + k]];
            acc += v;
        }
        y[e] = acc;
    }
}

// -- rotation / Euler helpers (used subset of the reference's
//    _transformations.c; reference elements.py:23-24) ---------------

void rsx_rotation_matrix(double angle, const double *direction,
                         double *out) {
    double x = direction[0], y = direction[1], z = direction[2];
    double n = std::sqrt(x * x + y * y + z * z);
    if (n == 0) {
        std::memset(out, 0, 9 * sizeof(double));
        out[0] = out[4] = out[8] = 1.0;
        return;
    }
    x /= n; y /= n; z /= n;
    double c = std::cos(angle), s = std::sin(angle), t = 1.0 - c;
    out[0] = c + t * x * x;
    out[1] = t * x * y - s * z;
    out[2] = t * x * z + s * y;
    out[3] = t * x * y + s * z;
    out[4] = c + t * y * y;
    out[5] = t * y * z - s * x;
    out[6] = t * x * z - s * y;
    out[7] = t * y * z + s * x;
    out[8] = c + t * z * z;
}

// intrinsic-xyz Euler composition R = Rx(a) Ry(b) Rz(c)
void rsx_euler_matrix_rxyz(double ai, double aj, double ak,
                           double *out) {
    double ca = std::cos(ai), sa = std::sin(ai);
    double cb = std::cos(aj), sb = std::sin(aj);
    double cc = std::cos(ak), sc = std::sin(ak);
    out[0] = cb * cc;
    out[1] = -cb * sc;
    out[2] = sb;
    out[3] = ca * sc + sa * sb * cc;
    out[4] = ca * cc - sa * sb * sc;
    out[5] = -sa * cb;
    out[6] = sa * sc - ca * sb * cc;
    out[7] = sa * cc + ca * sb * sc;
    out[8] = ca * cb;
}

void rsx_euler_from_matrix_rxyz(const double *m, double *abc) {
    double cb = std::hypot(m[0], m[1]);
    if (cb > 1e-15) {
        abc[0] = std::atan2(-m[5], m[8]);
        abc[1] = std::atan2(m[2], cb);
        abc[2] = std::atan2(-m[1], m[0]);
    } else {
        abc[0] = std::atan2(m[3], m[4]);
        abc[1] = std::atan2(m[2], cb);
        abc[2] = 0.0;
    }
}

}  // extern "C"
