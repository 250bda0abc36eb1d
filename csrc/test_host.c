/* Native-level test runner for the piquant-tpu host runtime.
 *
 * Role parity with the reference's gtest suites run directly against the
 * C++ library via ctest (/root/reference/.github/workflows/
 * cmake-multi-platform.yml:59-61,116-119): these checks exercise the
 * pqh_* ABI with no Python in the loop, so the Windows/MSVC CI job tests
 * the native library even where the Python suite exercises less.
 *
 * Plain C99, zero dependencies.  Exit 0 = all pass.
 */
#include <math.h>
#include <stddef.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "piquant_host.h"

static int g_fail = 0;
static int g_pass = 0;

#define CHECK(cond, ...)                                      \
  do {                                                        \
    if (!(cond)) {                                            \
      g_fail++;                                               \
      printf("FAIL %s:%d  ", __func__, __LINE__);             \
      printf(__VA_ARGS__);                                    \
      printf("\n");                                           \
    } else {                                                  \
      g_pass++;                                               \
    }                                                         \
  } while (0)

static void test_version(void) {
  CHECK(pqh_version() >= 2, "version %d", (int)pqh_version());
}

static void test_min_max(void) {
  enum { N = 10007 }; /* odd, not SIMD-aligned */
  float* x = (float*)malloc(N * sizeof(float));
  for (int i = 0; i < N; i++) x[i] = (float)i * 0.25f - 100.0f;
  x[N / 3] = -512.5f;
  x[2 * N / 3] = 9000.25f;
  float mn = 0, mx = 0;
  pqh_min_max(x, PQH_FP_F32, N, 4, &mn, &mx);
  CHECK(mn == -512.5f && mx == 9000.25f, "got [%g, %g]", mn, mx);
  /* single element */
  pqh_min_max(x, PQH_FP_F32, 1, 4, &mn, &mx);
  CHECK(mn == x[0] && mx == x[0], "n=1 [%g, %g]", mn, mx);
  free(x);
}

static void test_quant_params(void) {
  enum { N = 4096 };
  float* x = (float*)malloc(N * sizeof(float));
  for (int i = 0; i < N; i++) x[i] = -2.0f + 4.0f * (float)i / (N - 1);
  float s = 0;
  int64_t zp = 0;
  pqh_compute_quant_params(x, PQH_FP_F32, N, PQH_Q_UINT8, 2, &s, &zp);
  /* range [-2,2] over 255 codes; zp maps -2 -> 0 */
  CHECK(fabsf(s - 4.0f / 255.0f) < 1e-6f, "scale %g", s);
  CHECK(zp >= 127 && zp <= 128, "zp %lld", (long long)zp);
  /* degenerate range -> scale 1.0, zp mid-range */
  for (int i = 0; i < N; i++) x[i] = 3.25f;
  pqh_compute_quant_params(x, PQH_FP_F32, N, PQH_Q_UINT4, 2, &s, &zp);
  CHECK(s == 1.0f, "degenerate scale %g", s);
  CHECK(zp == 7 || zp == 8, "degenerate zp %lld", (long long)zp);
  free(x);
}

/* quantize -> dequantize round trip stays within scale/2 (nearest).
 * Signed dtypes get zero-centered data: with all-positive data the
 * derived zero_point clamps to q_min (reference-parity,
 * src/piquant.cpp:257-258) and the top of the range saturates — a
 * contract, not a bug, but it would break the scale/2 bound here. */
static void roundtrip(int32_t q_dtype, int is_signed, const char* name) {
  enum { N = 1023 }; /* odd: exercises packed tails for sub-byte dtypes */
  float* x = (float*)malloc(N * sizeof(float));
  float* y = (float*)malloc(N * sizeof(float));
  uint8_t* q = (uint8_t*)calloc(N, 8); /* large enough for any dtype */
  unsigned rng = 12345;
  for (int i = 0; i < N; i++) {
    rng = rng * 1664525u + 1013904223u;
    x[i] = (float)(rng >> 8) / (float)(1u << 24); /* [0, 1) */
    if (is_signed) x[i] -= 0.5f;
  }
  /* pin the range ends so the derived zero_point is exactly q_min
   * (unsigned) / mid (signed) — any nonzero data minimum pushes zp out
   * of [q_min, q_max], and the reference-parity clamp then saturates
   * min/scale codes at the far end of the range */
  x[0] = is_signed ? -0.5f : 0.0f;
  float s = 0;
  int64_t zp = 0;
  pqh_compute_quant_params(x, PQH_FP_F32, N, q_dtype, 2, &s, &zp);
  pqh_quantize(x, PQH_FP_F32, q, q_dtype, N, s, zp, PQH_ROUND_NEAREST, 0, 2);
  pqh_dequantize(q, q_dtype, y, PQH_FP_F32, N, s, zp, PQH_REDUCE_SET, 2);
  float worst = 0;
  for (int i = 0; i < N; i++) {
    float e = fabsf(y[i] - x[i]);
    if (e > worst) worst = e;
  }
  CHECK(worst <= s * 0.5f + 1e-6f, "%s worst err %g > scale/2 %g", name,
        worst, s * 0.5f);
  /* ADD accumulates: second dequantize doubles the output */
  pqh_dequantize(q, q_dtype, y, PQH_FP_F32, N, s, zp, PQH_REDUCE_ADD, 2);
  int bad = 0;
  for (int i = 0; i < N; i++) {
    float once = x[i]; /* within scale/2 of the dequant value */
    if (fabsf(y[i] - 2.0f * once) > s + 1e-5f) bad++;
  }
  CHECK(bad == 0, "%s ADD mismatches: %d", name, bad);
  free(x);
  free(y);
  free(q);
}

static void test_roundtrips(void) {
  roundtrip(PQH_Q_UINT2, 0, "uint2");
  roundtrip(PQH_Q_UINT4, 0, "uint4");
  roundtrip(PQH_Q_UINT8, 0, "uint8");
  roundtrip(PQH_Q_INT4, 1, "int4");
  roundtrip(PQH_Q_INT8, 1, "int8");
  roundtrip(PQH_Q_UINT16, 0, "uint16");
  roundtrip(PQH_Q_INT16, 1, "int16");
}

/* sub-byte wire ABI: low nibble first / LSB-first 2-bit fields. */
static void test_wire_layout(void) {
  float x4[4] = {1.0f, 2.0f, 3.0f, 4.0f};
  uint8_t q[4] = {0, 0, 0, 0};
  pqh_quantize(x4, PQH_FP_F32, q, PQH_Q_UINT4, 4, 1.0f, 0,
               PQH_ROUND_NEAREST, 0, 1);
  CHECK(q[0] == (uint8_t)(1 | (2 << 4)), "uint4 byte0 %02x", q[0]);
  CHECK(q[1] == (uint8_t)(3 | (4 << 4)), "uint4 byte1 %02x", q[1]);
  float x2[4] = {0.0f, 1.0f, 2.0f, 3.0f};
  memset(q, 0, sizeof q);
  pqh_quantize(x2, PQH_FP_F32, q, PQH_Q_UINT2, 4, 1.0f, 0,
               PQH_ROUND_NEAREST, 0, 1);
  CHECK(q[0] == (uint8_t)(0 | (1 << 2) | (2 << 4) | (3 << 6)),
        "uint2 byte0 %02x", q[0]);
  /* odd tail: byte past the data stays zeroed in the upper fields */
  float x3[3] = {15.0f, 15.0f, 15.0f};
  memset(q, 0xAA, sizeof q);
  pqh_quantize(x3, PQH_FP_F32, q, PQH_Q_UINT4, 3, 1.0f, 0,
               PQH_ROUND_NEAREST, 0, 1);
  CHECK(q[1] == 0x0F, "uint4 odd tail %02x", q[1]);
}

static void test_requantize(void) {
  enum { N = 777 };
  float *x = (float*)malloc(N * sizeof(float));
  float *a = (float*)malloc(N * sizeof(float));
  float *b = (float*)malloc(N * sizeof(float));
  uint8_t* q = (uint8_t*)calloc(N, 1);
  for (int i = 0; i < N; i++) x[i] = sinf((float)i * 0.1f);
  float s = 0;
  int64_t zp = 0;
  pqh_compute_quant_params(x, PQH_FP_F32, N, PQH_Q_UINT8, 2, &s, &zp);
  /* SET requantize == dequantize(quantize) */
  pqh_quantize(x, PQH_FP_F32, q, PQH_Q_UINT8, N, s, zp, PQH_ROUND_NEAREST,
               0, 2);
  pqh_dequantize(q, PQH_Q_UINT8, a, PQH_FP_F32, N, s, zp, PQH_REDUCE_SET, 2);
  pqh_requantize(x, PQH_FP_F32, b, N, PQH_Q_UINT8, s, zp, PQH_ROUND_NEAREST,
                 PQH_REDUCE_SET, 0, 2);
  int bad = 0;
  for (int i = 0; i < N; i++)
    if (a[i] != b[i]) bad++;
  CHECK(bad == 0, "requantize SET != deq(quant): %d mismatches", bad);
  /* ADD accumulates on top of SET */
  pqh_requantize(x, PQH_FP_F32, b, N, PQH_Q_UINT8, s, zp, PQH_ROUND_NEAREST,
                 PQH_REDUCE_ADD, 0, 2);
  bad = 0;
  for (int i = 0; i < N; i++)
    if (fabsf(b[i] - 2.0f * a[i]) > 1e-6f) bad++;
  CHECK(bad == 0, "requantize ADD: %d mismatches", bad);
  free(x); free(a); free(b); free(q);
}

static void test_stochastic(void) {
  enum { N = 65536 };
  float* x = (float*)malloc(N * sizeof(float));
  uint8_t* q1 = (uint8_t*)calloc(N, 1);
  uint8_t* q2 = (uint8_t*)calloc(N, 1);
  for (int i = 0; i < N; i++) x[i] = 0.5f; /* exactly between codes */
  pqh_quantize(x, PQH_FP_F32, q1, PQH_Q_UINT8, N, 1.0f, 0,
               PQH_ROUND_STOCHASTIC, 7, 2);
  pqh_quantize(x, PQH_FP_F32, q2, PQH_Q_UINT8, N, 1.0f, 0,
               PQH_ROUND_STOCHASTIC, 8, 2);
  double m1 = 0;
  int diff = 0;
  for (int i = 0; i < N; i++) {
    m1 += q1[i];
    diff += q1[i] != q2[i];
  }
  m1 /= N;
  /* unbiased: mean code ~0.5 (4-sigma bound ~0.008) */
  CHECK(fabs(m1 - 0.5) < 0.01, "stochastic mean %g", m1);
  CHECK(diff > N / 8, "seeds 7/8 nearly identical (%d/%d differ)", diff, N);
  /* nearest mode on the same data is deterministic half-even-or-up: all
   * codes equal each other */
  pqh_quantize(x, PQH_FP_F32, q1, PQH_Q_UINT8, N, 1.0f, 0,
               PQH_ROUND_NEAREST, 0, 2);
  int nd = 0;
  for (int i = 1; i < N; i++) nd += q1[i] != q1[0];
  CHECK(nd == 0, "nearest not deterministic: %d", nd);
  free(x); free(q1); free(q2);
}

static void test_nf4(void) {
  enum { N = 513 }; /* odd tail */
  float* x = (float*)malloc(N * sizeof(float));
  float* y = (float*)malloc(N * sizeof(float));
  uint8_t* q = (uint8_t*)calloc((N + 1) / 2, 1);
  unsigned rng = 999;
  float absmax = 0;
  for (int i = 0; i < N; i++) {
    rng = rng * 1664525u + 1013904223u;
    x[i] = ((float)(rng >> 8) / (float)(1u << 24)) * 2.0f - 1.0f;
    if (fabsf(x[i]) > absmax) absmax = fabsf(x[i]);
  }
  pqh_quantize_nf4(x, PQH_FP_F32, q, N, absmax, 2);
  pqh_dequantize_nf4(q, y, PQH_FP_F32, N, absmax, PQH_REDUCE_SET, 2);
  /* NF4 codebook's widest gap is 0.3038 (between -1.0 and -0.6962) in
   * normalized space -> nearest-code error bound is half that */
  float worst = 0;
  for (int i = 0; i < N; i++) {
    float e = fabsf(y[i] - x[i]);
    if (e > worst) worst = e;
  }
  CHECK(worst <= 0.152f * absmax + 1e-6f, "nf4 worst err %g (absmax %g)",
        worst, absmax);
  free(x); free(y); free(q);
}

static void test_bf16_path(void) {
  enum { N = 257 };
  uint16_t* xb = (uint16_t*)malloc(N * sizeof(uint16_t));
  uint16_t* yb = (uint16_t*)malloc(N * sizeof(uint16_t));
  uint8_t* q = (uint8_t*)calloc(N, 1);
  /* bf16(1.0 + i/256) via float bit-pattern truncation */
  for (int i = 0; i < N; i++) {
    float v = 1.0f + (float)i / 256.0f;
    uint32_t bits;
    memcpy(&bits, &v, 4);
    xb[i] = (uint16_t)(bits >> 16);
  }
  pqh_quantize(xb, PQH_FP_BF16, q, PQH_Q_UINT8, N, 0.01f, 0,
               PQH_ROUND_NEAREST, 0, 2);
  pqh_dequantize(q, PQH_Q_UINT8, yb, PQH_FP_BF16, N, 0.01f, 0,
                 PQH_REDUCE_SET, 2);
  int bad = 0;
  for (int i = 0; i < N; i++) {
    uint32_t xb32 = (uint32_t)xb[i] << 16, yb32 = (uint32_t)yb[i] << 16;
    float xf, yf;
    memcpy(&xf, &xb32, 4);
    memcpy(&yf, &yb32, 4);
    if (fabsf(yf - xf) > 0.01f * 0.5f + 0.008f) bad++; /* + bf16 ulp */
  }
  CHECK(bad == 0, "bf16 roundtrip: %d out of bound", bad);
  free(xb); free(yb); free(q);
}

int main(void) {
  test_version();
  test_min_max();
  test_quant_params();
  test_roundtrips();
  test_wire_layout();
  test_requantize();
  test_stochastic();
  test_nf4();
  test_bf16_path();
  printf("%d checks, %d failed\n", g_pass + g_fail, g_fail);
  return g_fail ? 1 : 0;
}
