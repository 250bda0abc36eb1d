// Reference-ABI compatibility layer.
//
// Exports the exact C symbols of the reference's public C99 API
// (reference include/piquant.h:42-85: piquant_context_create/destroy,
// piquant_quantize, piquant_dequantize,
// piquant_compute_quant_params_{float32,bfloat16}) as thin adapters over
// the richer native pqh_* runtime in piquant_host.cpp, so a C/FFI program
// written against the reference header links against libpiquant_host.so
// unchanged.  Declarations here are self-contained on purpose: consumers
// bring the reference header; we only have to match the symbol names and
// call signatures.
//
// Semantic notes:
// - The reference context owns a thread pool sized at creation
//   (src/piquant.cpp: context ctor); our runtime spawns per-call workers,
//   so the context just records the requested thread count (0 means
//   "auto": hardware_concurrency, matching the reference default).
// - The reference's stochastic rounding draws from a context-owned RNG;
//   we derive a fresh seed per call from a context-local counter so
//   repeated calls are decorrelated (the reference makes no cross-call
//   reproducibility promise at the C API level).

#include <atomic>
#include <cstdint>
#include <thread>

#include "piquant_host.h"

#ifdef _MSC_VER
#define PIQUANT_EXPORT __declspec(dllexport)
#else
#define PIQUANT_EXPORT __attribute__((visibility("default")))
#endif

namespace {

// Reference enum values (include/piquant.h): one combined dtype enum
// covering both float and quantized types.
enum RefDtype : int32_t {
  REF_F32 = 0,
  REF_BF16 = 1,
  REF_UINT2 = 2,
  REF_UINT4 = 3,
  REF_UINT8 = 4,
};

int32_t ref_to_fp(int32_t d) { return d == REF_BF16 ? PQH_FP_BF16 : PQH_FP_F32; }

int32_t ref_to_q(int32_t d) {
  switch (d) {
    case REF_UINT2: return PQH_Q_UINT2;
    case REF_UINT4: return PQH_Q_UINT4;
    default: return PQH_Q_UINT8;
  }
}

}  // namespace

extern "C" {

struct piquant_context_t {
  int32_t nthreads;
  std::atomic<uint64_t> seed_counter{0x9e3779b97f4a7c15ull};
};

PIQUANT_EXPORT piquant_context_t* piquant_context_create(size_t num_threads) {
  auto* ctx = new piquant_context_t();
  ctx->nthreads = num_threads
                      ? static_cast<int32_t>(num_threads)
                      : static_cast<int32_t>(std::thread::hardware_concurrency());
  if (ctx->nthreads < 1) ctx->nthreads = 1;
  return ctx;
}

PIQUANT_EXPORT void piquant_context_destroy(piquant_context_t* ctx) {
  delete ctx;
}

PIQUANT_EXPORT void piquant_quantize(piquant_context_t* ctx, const void* in,
                                     int32_t dtype_in, void* out,
                                     int32_t dtype_out, size_t numel,
                                     float scale, int64_t zero_point,
                                     int32_t mode) {
  uint64_t seed = ctx->seed_counter.fetch_add(0x100000001b3ull);
  pqh_quantize(in, ref_to_fp(dtype_in), out, ref_to_q(dtype_out),
               static_cast<int64_t>(numel), scale, zero_point,
               mode ? PQH_ROUND_STOCHASTIC : PQH_ROUND_NEAREST, seed,
               ctx->nthreads);
}

PIQUANT_EXPORT void piquant_dequantize(piquant_context_t* ctx, const void* in,
                                       int32_t dtype_in, void* out,
                                       int32_t dtype_out, size_t numel,
                                       float scale, int64_t zero_point,
                                       int32_t op) {
  pqh_dequantize(in, ref_to_q(dtype_in), out, ref_to_fp(dtype_out),
                 static_cast<int64_t>(numel), scale, zero_point,
                 op ? PQH_REDUCE_ADD : PQH_REDUCE_SET, ctx->nthreads);
}

PIQUANT_EXPORT void piquant_compute_quant_params_float32(
    piquant_context_t* ctx, const float* x, size_t n,
    int32_t target_quant_dtype, float* out_scale, int64_t* out_zero_point) {
  pqh_compute_quant_params(x, PQH_FP_F32, static_cast<int64_t>(n),
                           ref_to_q(target_quant_dtype), ctx->nthreads,
                           out_scale, out_zero_point);
}

PIQUANT_EXPORT void piquant_compute_quant_params_bfloat16(
    piquant_context_t* ctx, const uint16_t* x, size_t n,
    int32_t target_quant_dtype, float* out_scale, int64_t* out_zero_point) {
  pqh_compute_quant_params(x, PQH_FP_BF16, static_cast<int64_t>(n),
                           ref_to_q(target_quant_dtype), ctx->nthreads,
                           out_scale, out_zero_point);
}

}  // extern "C"
