/* piquant-tpu host runtime — C99 ABI.
 *
 * Role parity with the reference's include/piquant.h C API: a stable
 * extern-C surface over the host-side quantization kernels, consumable from
 * any FFI (Python binds via ctypes in piquant_tpu/runtime/host.py).
 *
 * Dtype/enum codes must match piquant_tpu/runtime/host.py.
 */
#ifndef PIQUANT_HOST_H
#define PIQUANT_HOST_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* float dtypes */
enum {
  PQH_FP_F32 = 0,
  PQH_FP_BF16 = 1,
  PQH_FP_F64 = 2,
};

/* quant dtypes */
enum {
  PQH_Q_UINT2 = 0,
  PQH_Q_UINT4 = 1,
  PQH_Q_UINT8 = 2,
  PQH_Q_INT4 = 3,
  PQH_Q_INT8 = 4,
  PQH_Q_UINT16 = 5,
  PQH_Q_INT16 = 6,
  PQH_Q_UINT32 = 7,
  PQH_Q_INT32 = 8,
  PQH_Q_UINT64 = 9,
  PQH_Q_INT64 = 10,
};

enum { PQH_ROUND_NEAREST = 0, PQH_ROUND_STOCHASTIC = 1 };
enum { PQH_REDUCE_SET = 0, PQH_REDUCE_ADD = 1 };

/* Quantize `numel` floats at `in` into packed codes at `out`
 * (sub-byte dtypes: LSB-first fields, low nibble first, zeroed tails). */
void pqh_quantize(const void* in, int32_t fp_dtype, void* out,
                  int32_t q_dtype, int64_t numel, float scale,
                  int64_t zero_point, int32_t round_mode, uint64_t seed,
                  int32_t nthreads);

/* Dequantize packed codes; reduce_op ADD accumulates into `out`. */
void pqh_dequantize(const void* in, int32_t q_dtype, void* out,
                    int32_t fp_dtype, int64_t numel, float scale,
                    int64_t zero_point, int32_t reduce_op, int32_t nthreads);

/* Fused quantize->dequantize (fake-quant), SET or ADD store. */
void pqh_requantize(const void* in, int32_t fp_dtype, void* out,
                    int64_t numel, int32_t q_dtype, float scale,
                    int64_t zero_point, int32_t round_mode, int32_t reduce_op,
                    uint64_t seed, int32_t nthreads);

/* Parallel min/max reduction. */
void pqh_min_max(const void* in, int32_t fp_dtype, int64_t numel,
                 int32_t nthreads, float* out_min, float* out_max);

/* Affine (scale, zero_point) from data min/max; degenerate range ->
 * scale 1.0, zp mid-range. */
void pqh_compute_quant_params(const void* in, int32_t fp_dtype, int64_t numel,
                              int32_t q_dtype, int32_t nthreads,
                              float* out_scale, int64_t* out_zp);

/* NF4 (NormalFloat-4, QLoRA codebook): absmax-scaled non-uniform 4-bit.
 * Wire: adjacent-pair nibbles (low first, zeroed tail) — the uint4 wire
 * ABI with codebook semantics.  scale = absmax (w = lut[code] * scale). */
void pqh_quantize_nf4(const void* in, int32_t fp_dtype, uint8_t* out,
                      int64_t numel, float scale, int32_t nthreads);
void pqh_dequantize_nf4(const uint8_t* in, void* out, int32_t fp_dtype,
                        int64_t numel, float scale, int32_t reduce_op,
                        int32_t nthreads);

int32_t pqh_version(void);

#ifdef __cplusplus
}
#endif

#endif /* PIQUANT_HOST_H */
