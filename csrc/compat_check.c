/* Link-and-roundtrip check for the reference-ABI compatibility layer.
 *
 * This is written exactly as a reference FFI consumer would write it: the
 * prototypes below are the reference's public C API (include/piquant.h),
 * and the program must link against libpiquant_host.so and round-trip
 * uint8 + packed uint4 data.  Built and run by tests/test_host_runtime.py.
 */
#include <math.h>
#include <stddef.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct piquant_context_t piquant_context_t;

extern piquant_context_t* piquant_context_create(size_t num_threads);
extern void piquant_context_destroy(piquant_context_t* ctx);
extern void piquant_quantize(piquant_context_t*, const void*, int, void*, int,
                             size_t, float, int64_t, int);
extern void piquant_dequantize(piquant_context_t*, const void*, int, void*,
                               int, size_t, float, int64_t, int);
extern void piquant_compute_quant_params_float32(piquant_context_t*,
                                                 const float*, size_t, int,
                                                 float*, int64_t*);

enum { DT_F32 = 0, DT_BF16 = 1, DT_UINT2 = 2, DT_UINT4 = 3, DT_UINT8 = 4 };

int main(void) {
  const size_t n = 1023; /* odd: exercises the packed tail */
  float* x = malloc(n * sizeof(float));
  float* dq = malloc(n * sizeof(float));
  uint8_t* q8 = malloc(n);
  uint8_t* q4 = malloc((n + 1) / 2);
  for (size_t i = 0; i < n; ++i)
    x[i] = sinf((float)i * 0.37f) * 3.0f;

  piquant_context_t* ctx = piquant_context_create(2);
  if (!ctx) return 1;

  float scale;
  int64_t zp;
  piquant_compute_quant_params_float32(ctx, x, n, DT_UINT8, &scale, &zp);
  if (!(scale > 0.0f)) return 2;

  piquant_quantize(ctx, x, DT_F32, q8, DT_UINT8, n, scale, zp, 0);
  piquant_dequantize(ctx, q8, DT_UINT8, dq, DT_F32, n, scale, zp, 0);
  for (size_t i = 0; i < n; ++i)
    if (fabsf(dq[i] - x[i]) > scale * 0.5f + 1e-5f) return 3;

  /* ADD reduce accumulates */
  piquant_dequantize(ctx, q8, DT_UINT8, dq, DT_F32, n, scale, zp, 1);
  for (size_t i = 0; i < n; ++i)
    if (fabsf(dq[i] - 2.0f * x[i]) > scale * 1.0f + 1e-5f) return 4;

  /* packed uint4 roundtrip */
  piquant_compute_quant_params_float32(ctx, x, n, DT_UINT4, &scale, &zp);
  piquant_quantize(ctx, x, DT_F32, q4, DT_UINT4, n, scale, zp, 0);
  piquant_dequantize(ctx, q4, DT_UINT4, dq, DT_F32, n, scale, zp, 0);
  for (size_t i = 0; i < n; ++i)
    if (fabsf(dq[i] - x[i]) > scale * 0.5f + 1e-5f) return 5;

  piquant_context_destroy(ctx);
  printf("compat ok\n");
  return 0;
}
