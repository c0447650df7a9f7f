// Minimal stand-in for the FFTW3 API subset the reference uses
// (fftw_plan_dft_1d / fftw_execute / fftw_malloc), implemented as a naive
// O(N^2) double-precision DFT - numerically equivalent for the 64-point
// transforms the reference performs (error ~1e-13, far below any decode
// decision threshold). Lets the reference sources compile into a
// golden-vector generator without FFTW installed.
#ifndef FUN_OFDM_TPU_SHIM_FFTW3_H
#define FUN_OFDM_TPU_SHIM_FFTW3_H

#include <cmath>
#include <cstdlib>
#include <cstring>

typedef double fftw_complex[2];

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0)
#define FFTW_ESTIMATE (64)

struct fftw_plan_s {
  int n;
  int sign;
  fftw_complex *in;
  fftw_complex *out;
};
typedef fftw_plan_s *fftw_plan;

static inline void *fftw_malloc(size_t n) { return malloc(n); }
static inline void fftw_free(void *p) { free(p); }

static inline fftw_plan fftw_plan_dft_1d(int n, fftw_complex *in,
                                         fftw_complex *out, int sign,
                                         unsigned /*flags*/) {
  fftw_plan p = new fftw_plan_s;
  p->n = n;
  p->sign = sign;
  p->in = in;
  p->out = out;
  return p;
}

static inline void fftw_execute(fftw_plan p) {
  const int n = p->n;
  // copy input in case in == out
  fftw_complex *tmp = (fftw_complex *)malloc(sizeof(fftw_complex) * n);
  memcpy(tmp, p->in, sizeof(fftw_complex) * n);
  for (int k = 0; k < n; ++k) {
    double re = 0.0, im = 0.0;
    for (int t = 0; t < n; ++t) {
      double ang = p->sign * 2.0 * M_PI * k * t / n;
      double c = cos(ang), s = sin(ang);
      re += tmp[t][0] * c - tmp[t][1] * s;
      im += tmp[t][0] * s + tmp[t][1] * c;
    }
    p->out[k][0] = re;
    p->out[k][1] = im;
  }
  free(tmp);
}

static inline void fftw_destroy_plan(fftw_plan p) { delete p; }

#endif
