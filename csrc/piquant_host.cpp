// piquant-tpu host runtime: multithreaded CPU quantization kernels.
//
// Role in the TPU framework (NOT a port of the reference's kernel library):
// the TPU compute path is JAX/Pallas; this native layer covers the places a
// TPU serving stack still needs fast *host-side* quantization —
//   * packing checkpoints to INT4/INT8 at load time (multi-GB, before the
//     weights ever reach a chip),
//   * the C99 ABI surface the reference exposes (include/piquant.h) so FFI
//     consumers can link against the same operations,
//   * a CPU fallback for environments with no accelerator.
//
// Semantics match piquant_tpu.ops.reference (which itself preserves the
// reference library's math — see SURVEY.md §2.1):
//   quantize:   q = clamp(round_half_away(x / scale) + zp, qmin, qmax)
//   stochastic: q = clamp(floor(x / scale + u) + zp, ...), u ~ U[0,1) per elem
//   dequant:    d = (q - zp) * scale, store SET or ADD
//   params:     scale = (rmax-rmin)/(qmax-qmin); zp = clamp(round(qmin - rmin/scale))
//               degenerate rmax==rmin -> {1.0, (qmax+qmin)>>1}
// Packing: 4-bit = 2 codes/byte low-nibble-first; 2-bit = 4 codes/byte
// LSB-first; unused tail bits zero.  (Wire ABI shared with the TPU path.)
//
// Threading: std::thread fan-out over pack-aligned ranges (no two workers
// share a packed byte).  SIMD comes from -O3 autovectorization; the hot
// loops are written branch-free to vectorize cleanly.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

#if defined(_MSC_VER)
#define PQH_EXPORT __declspec(dllexport)
#elif defined(__GNUC__)
#define PQH_EXPORT __attribute__((visibility("default")))
#else
#define PQH_EXPORT
#endif

namespace {

// ---- dtype codes (keep in sync with piquant_tpu/runtime/host.py) ----------
enum FpDtype : int32_t { FP_F32 = 0, FP_BF16 = 1, FP_F64 = 2 };
enum QDtype : int32_t {
  Q_UINT2 = 0,
  Q_UINT4 = 1,
  Q_UINT8 = 2,
  Q_INT4 = 3,
  Q_INT8 = 4,
  Q_UINT16 = 5,
  Q_INT16 = 6,
  Q_UINT32 = 7,
  Q_INT32 = 8,
  Q_UINT64 = 9,
  Q_INT64 = 10,
};
enum RoundMode : int32_t { RM_NEAREST = 0, RM_STOCHASTIC = 1 };
enum ReduceOp : int32_t { RO_SET = 0, RO_ADD = 1 };

struct QInfo {
  int bits;
  bool is_signed;
  int64_t qmin, qmax;
  int pack;  // codes per byte (1 for >= 8 bit)
  int stride;  // bytes per storage element
};

QInfo qinfo(QDtype d) {
  switch (d) {
    case Q_UINT2: return {2, false, 0, 3, 4, 1};
    case Q_UINT4: return {4, false, 0, 15, 2, 1};
    case Q_UINT8: return {8, false, 0, 255, 1, 1};
    case Q_INT4: return {4, true, -8, 7, 2, 1};
    case Q_INT8: return {8, true, -128, 127, 1, 1};
    case Q_UINT16: return {16, false, 0, 65535, 1, 2};
    case Q_INT16: return {16, true, -32768, 32767, 1, 2};
    case Q_UINT32: return {32, false, 0, 4294967295LL, 1, 4};
    case Q_INT32: return {32, true, INT32_MIN, INT32_MAX, 1, 4};
    case Q_UINT64: return {64, false, 0, INT64_MAX /* f64-safe cap */, 1, 8};
    case Q_INT64: return {64, true, INT64_MIN, INT64_MAX, 1, 8};
  }
  return {8, false, 0, 255, 1, 1};
}

inline float bf16_to_f32(uint16_t b) {
  uint32_t u = static_cast<uint32_t>(b) << 16;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

inline uint16_t f32_to_bf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  if ((u & 0x7fffffffu) > 0x7f800000u) return static_cast<uint16_t>((u >> 16) | 0x40);  // quiet NaN
  uint32_t rounding = 0x7fffu + ((u >> 16) & 1u);  // round to nearest even
  return static_cast<uint16_t>((u + rounding) >> 16);
}

// xorshift128+ style per-worker PRNG for stochastic rounding.
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    auto next = [&seed]() {
      seed += 0x9e3779b97f4a7c15ull;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
      return z ^ (z >> 31);
    };
    s0 = next();
    s1 = next();
  }
  inline uint64_t next() {
    uint64_t a = s0, b = s1;
    s0 = b;
    a ^= a << 23;
    a ^= a >> 17;
    a ^= b ^ (b >> 26);
    s1 = a;
    return a + b;
  }
  inline float uniform() {  // [0, 1) with 24-bit resolution
    return static_cast<float>(next() >> 40) * (1.0f / 16777216.0f);
  }
};

template <typename F>
void parallel_ranges(int64_t numel, int align, int nthreads, F&& fn) {
  nthreads = std::max(1, nthreads);
  int64_t per = (numel + nthreads - 1) / nthreads;
  per = ((per + align - 1) / align) * align;  // pack-aligned split points
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t begin = t * per;
    int64_t end = std::min(numel, begin + per);
    if (begin >= end) break;
    threads.emplace_back([=, &fn]() { fn(t, begin, end); });
  }
  for (auto& th : threads) th.join();
}

// ---- quantize --------------------------------------------------------------

template <typename In>
inline float load_f(const In* p, int64_t i) {
  if constexpr (std::is_same_v<In, uint16_t>)
    return bf16_to_f32(p[i]);
  else
    return static_cast<float>(p[i]);
}

template <typename In, bool Stochastic>
inline int64_t quant_one(const In* x, int64_t i, float inv_scale, int64_t zp,
                         int64_t qmin, int64_t qmax, Rng* rng) {
  float r = load_f(x, i) * inv_scale;
  float rounded;
  if constexpr (Stochastic) {
    rounded = std::floor(r + rng->uniform());
  } else {
    rounded = std::trunc(r + std::copysign(0.5f, r));
  }
  int64_t v = static_cast<int64_t>(rounded) + zp;
  return std::clamp(v, qmin, qmax);
}

template <typename In, typename OutStore, bool Stochastic>
void quant_plain(const In* x, OutStore* o, int64_t begin, int64_t end,
                 float inv_scale, int64_t zp, int64_t qmin, int64_t qmax, Rng* rng) {
  for (int64_t i = begin; i < end; ++i)
    o[i] = static_cast<OutStore>(quant_one<In, Stochastic>(x, i, inv_scale, zp, qmin, qmax, rng));
}

template <typename In, bool Stochastic>
void quant_packed(const In* x, uint8_t* o, int64_t begin, int64_t end, int bits,
                  float inv_scale, int64_t zp, int64_t qmin, int64_t qmax, Rng* rng) {
  const int pack = 8 / bits;
  const uint8_t mask = static_cast<uint8_t>((1 << bits) - 1);
  for (int64_t i = begin; i < end; i += pack) {
    uint8_t byte = 0;
    const int n = static_cast<int>(std::min<int64_t>(pack, end - i));
    for (int k = 0; k < n; ++k) {
      uint8_t c = static_cast<uint8_t>(
          quant_one<In, Stochastic>(x, i + k, inv_scale, zp, qmin, qmax, rng)) & mask;
      byte |= static_cast<uint8_t>(c << (k * bits));
    }
    o[i / pack] = byte;
  }
}

template <typename In>
void quantize_impl(const In* x, void* out, int64_t numel, QDtype qd, float scale,
                   int64_t zp, RoundMode rm, uint64_t seed, int nthreads) {
  QInfo qi = qinfo(qd);
  float inv = 1.0f / scale;
  int align = qi.pack;
  parallel_ranges(numel, align, nthreads, [&](int t, int64_t b, int64_t e) {
    Rng rng(seed * 0x100000001b3ull + static_cast<uint64_t>(t) + 1);
    auto dispatch_plain = [&](auto* optr) {
      using OS = std::remove_pointer_t<decltype(optr)>;
      if (rm == RM_STOCHASTIC)
        quant_plain<In, OS, true>(x, optr, b, e, inv, zp, qi.qmin, qi.qmax, &rng);
      else
        quant_plain<In, OS, false>(x, optr, b, e, inv, zp, qi.qmin, qi.qmax, &rng);
    };
    if (qi.pack > 1) {
      if (rm == RM_STOCHASTIC)
        quant_packed<In, true>(x, static_cast<uint8_t*>(out), b, e, qi.bits, inv, zp,
                               qi.qmin, qi.qmax, &rng);
      else
        quant_packed<In, false>(x, static_cast<uint8_t*>(out), b, e, qi.bits, inv, zp,
                                qi.qmin, qi.qmax, &rng);
    } else {
      switch (qi.stride) {
        case 1:
          if (qi.is_signed) dispatch_plain(static_cast<int8_t*>(out));
          else dispatch_plain(static_cast<uint8_t*>(out));
          break;
        case 2:
          if (qi.is_signed) dispatch_plain(static_cast<int16_t*>(out));
          else dispatch_plain(static_cast<uint16_t*>(out));
          break;
        case 4:
          if (qi.is_signed) dispatch_plain(static_cast<int32_t*>(out));
          else dispatch_plain(static_cast<uint32_t*>(out));
          break;
        case 8:
          if (qi.is_signed) dispatch_plain(static_cast<int64_t*>(out));
          else dispatch_plain(static_cast<uint64_t*>(out));
          break;
      }
    }
  });
}

// ---- dequantize ------------------------------------------------------------

template <typename Out>
inline void store_f(Out* o, int64_t i, float v, bool add) {
  if constexpr (std::is_same_v<Out, uint16_t>) {
    float cur = add ? bf16_to_f32(o[i]) : 0.0f;
    o[i] = f32_to_bf16(add ? cur + v : v);
  } else {
    if (add) o[i] = o[i] + static_cast<Out>(v);
    else o[i] = static_cast<Out>(v);
  }
}

template <typename Out, bool Add>
void dequant_packed(const uint8_t* q, Out* o, int64_t begin, int64_t end, int bits,
                    bool is_signed, float scale, int64_t zp) {
  const int pack = 8 / bits;
  const int mask = (1 << bits) - 1;
  const int half = 1 << (bits - 1);
  for (int64_t i = begin; i < end; ++i) {
    int c = (q[i / pack] >> ((i % pack) * bits)) & mask;
    if (is_signed && c >= half) c -= (1 << bits);
    store_f(o, i, static_cast<float>(static_cast<int64_t>(c) - zp) * scale, Add);
  }
}

template <typename QT, typename Out, bool Add>
void dequant_plain(const QT* q, Out* o, int64_t begin, int64_t end, float scale,
                   int64_t zp) {
  for (int64_t i = begin; i < end; ++i)
    store_f(o, i, static_cast<float>(static_cast<int64_t>(q[i]) - zp) * scale, Add);
}

template <typename Out>
void dequantize_impl(const void* q, Out* o, int64_t numel, QDtype qd, float scale,
                     int64_t zp, ReduceOp ro, int nthreads) {
  QInfo qi = qinfo(qd);
  parallel_ranges(numel, qi.pack, nthreads, [&](int, int64_t b, int64_t e) {
    if (qi.pack > 1) {
      if (ro == RO_ADD)
        dequant_packed<Out, true>(static_cast<const uint8_t*>(q), o, b, e, qi.bits,
                                  qi.is_signed, scale, zp);
      else
        dequant_packed<Out, false>(static_cast<const uint8_t*>(q), o, b, e, qi.bits,
                                   qi.is_signed, scale, zp);
      return;
    }
    auto run = [&](auto* qptr) {
      using QT = std::remove_pointer_t<decltype(qptr)>;
      if (ro == RO_ADD)
        dequant_plain<QT, Out, true>(qptr, o, b, e, scale, zp);
      else
        dequant_plain<QT, Out, false>(qptr, o, b, e, scale, zp);
    };
    switch (qi.stride) {
      case 1:
        if (qi.is_signed) run(static_cast<const int8_t*>(q));
        else run(static_cast<const uint8_t*>(q));
        break;
      case 2:
        if (qi.is_signed) run(static_cast<const int16_t*>(q));
        else run(static_cast<const uint16_t*>(q));
        break;
      case 4:
        if (qi.is_signed) run(static_cast<const int32_t*>(q));
        else run(static_cast<const uint32_t*>(q));
        break;
      case 8:
        if (qi.is_signed) run(static_cast<const int64_t*>(q));
        else run(static_cast<const uint64_t*>(q));
        break;
    }
  });
}

// ---- requantize (fused fake-quant) ----------------------------------------

template <typename T, bool Stochastic, bool Add>
void requant_impl_t(const T* x, T* o, int64_t begin, int64_t end, float scale,
                    int64_t zp, int64_t qmin, int64_t qmax, Rng* rng) {
  const float inv = 1.0f / scale;
  for (int64_t i = begin; i < end; ++i) {
    int64_t c = quant_one<T, Stochastic>(x, i, inv, zp, qmin, qmax, rng);
    float v = static_cast<float>(c - zp) * scale;
    store_f(o, i, v, Add);
  }
}

// ---- minmax / params -------------------------------------------------------

template <typename In>
void minmax_impl(const In* x, int64_t numel, int nthreads, float* out_min,
                 float* out_max) {
  int n = std::max(1, nthreads);
  std::vector<float> mins(n, std::numeric_limits<float>::infinity());
  std::vector<float> maxs(n, -std::numeric_limits<float>::infinity());
  parallel_ranges(numel, 1, n, [&](int t, int64_t b, int64_t e) {
    float lo = std::numeric_limits<float>::infinity();
    float hi = -std::numeric_limits<float>::infinity();
    for (int64_t i = b; i < e; ++i) {
      float v = load_f(x, i);
      lo = std::min(lo, v);
      hi = std::max(hi, v);
    }
    mins[t] = lo;
    maxs[t] = hi;
  });
  float lo = std::numeric_limits<float>::infinity();
  float hi = -std::numeric_limits<float>::infinity();
  for (int t = 0; t < n; ++t) {
    lo = std::min(lo, mins[t]);
    hi = std::max(hi, maxs[t]);
  }
  *out_min = lo;
  *out_max = hi;
}

}  // namespace

// ---- NF4 (non-uniform NormalFloat-4; QLoRA arXiv:2305.14314) ---------------
// Same codebook as piquant_tpu/quant/linear.py NF4_CODEBOOK (bitsandbytes-
// compatible).  Wire layout: adjacent-pair nibbles, low nibble first —
// the uint4 wire ABI with codebook semantics.  scale = absmax of the
// tensor/group (w = lut[code] * scale).

static const float kNf4Lut[16] = {
    -1.0f, -0.6961928009986877f, -0.5250730514526367f, -0.39491748809814453f,
    -0.28444138169288635f, -0.18477343022823334f, -0.09105003625154495f, 0.0f,
    0.07958029955625534f, 0.16093020141124725f, 0.24611230194568634f,
    0.33791524171829224f, 0.44070982933044434f, 0.5626170039176941f,
    0.7229568362236023f, 1.0f};

inline uint8_t nf4_encode_one(float v) {
  // exact nearest neighbour via midpoint thresholds (sorted codebook)
  uint8_t c = 0;
  for (int i = 0; i < 15; ++i)
    c = static_cast<uint8_t>(c + (v > 0.5f * (kNf4Lut[i] + kNf4Lut[i + 1])));
  return c;
}

template <typename In>
void nf4_quantize_impl(const In* x, uint8_t* out, int64_t numel, float scale,
                       int nthreads) {
  const float inv = scale != 0.0f ? 1.0f / scale : 1.0f;
  parallel_ranges(numel, 2, nthreads, [&](int, int64_t b, int64_t e) {
    for (int64_t i = b; i < e; i += 2) {
      uint8_t lo = nf4_encode_one(load_f(x, i) * inv);
      uint8_t hi = (i + 1 < e)
                       ? nf4_encode_one(load_f(x, i + 1) * inv)
                       : 0;  // zeroed tail, like the affine packers
      out[i / 2] = static_cast<uint8_t>(lo | (hi << 4));
    }
  });
}

template <typename Out>
void nf4_dequantize_impl(const uint8_t* q, Out* o, int64_t numel, float scale,
                         ReduceOp ro, int nthreads) {
  parallel_ranges(numel, 2, nthreads, [&](int, int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      int c = (q[i / 2] >> ((i % 2) * 4)) & 0xF;
      store_f(o, i, kNf4Lut[c] * scale, ro == RO_ADD);
    }
  });
}

extern "C" {

PQH_EXPORT void pqh_quantize(const void* in, int32_t fp_dtype, void* out,
                             int32_t q_dtype, int64_t numel, float scale,
                             int64_t zero_point, int32_t round_mode, uint64_t seed,
                             int32_t nthreads) {
  QDtype qd = static_cast<QDtype>(q_dtype);
  RoundMode rm = static_cast<RoundMode>(round_mode);
  switch (fp_dtype) {
    case FP_F32:
      quantize_impl(static_cast<const float*>(in), out, numel, qd, scale, zero_point, rm, seed, nthreads);
      break;
    case FP_BF16:
      quantize_impl(static_cast<const uint16_t*>(in), out, numel, qd, scale, zero_point, rm, seed, nthreads);
      break;
    case FP_F64:
      quantize_impl(static_cast<const double*>(in), out, numel, qd, scale, zero_point, rm, seed, nthreads);
      break;
  }
}

PQH_EXPORT void pqh_dequantize(const void* in, int32_t q_dtype, void* out,
                               int32_t fp_dtype, int64_t numel, float scale,
                               int64_t zero_point, int32_t reduce_op,
                               int32_t nthreads) {
  QDtype qd = static_cast<QDtype>(q_dtype);
  ReduceOp ro = static_cast<ReduceOp>(reduce_op);
  switch (fp_dtype) {
    case FP_F32:
      dequantize_impl(in, static_cast<float*>(out), numel, qd, scale, zero_point, ro, nthreads);
      break;
    case FP_BF16:
      dequantize_impl(in, static_cast<uint16_t*>(out), numel, qd, scale, zero_point, ro, nthreads);
      break;
    case FP_F64:
      dequantize_impl(in, static_cast<double*>(out), numel, qd, scale, zero_point, ro, nthreads);
      break;
  }
}

PQH_EXPORT void pqh_requantize(const void* in, int32_t fp_dtype, void* out,
                               int64_t numel, int32_t q_dtype, float scale,
                               int64_t zero_point, int32_t round_mode,
                               int32_t reduce_op, uint64_t seed, int32_t nthreads) {
  QInfo qi = qinfo(static_cast<QDtype>(q_dtype));
  bool sto = round_mode == RM_STOCHASTIC;
  bool add = reduce_op == RO_ADD;
  parallel_ranges(numel, 1, nthreads, [&](int t, int64_t b, int64_t e) {
    Rng rng(seed * 0x100000001b3ull + static_cast<uint64_t>(t) + 1);
    auto run = [&](auto* xptr, auto* optr) {
      using T = std::remove_pointer_t<decltype(optr)>;
      if (sto && add) requant_impl_t<T, true, true>(xptr, optr, b, e, scale, zero_point, qi.qmin, qi.qmax, &rng);
      else if (sto) requant_impl_t<T, true, false>(xptr, optr, b, e, scale, zero_point, qi.qmin, qi.qmax, &rng);
      else if (add) requant_impl_t<T, false, true>(xptr, optr, b, e, scale, zero_point, qi.qmin, qi.qmax, &rng);
      else requant_impl_t<T, false, false>(xptr, optr, b, e, scale, zero_point, qi.qmin, qi.qmax, &rng);
    };
    switch (fp_dtype) {
      case FP_F32: run(static_cast<const float*>(in), static_cast<float*>(out)); break;
      case FP_BF16: run(static_cast<const uint16_t*>(in), static_cast<uint16_t*>(out)); break;
      case FP_F64: run(static_cast<const double*>(in), static_cast<double*>(out)); break;
    }
  });
}

PQH_EXPORT void pqh_min_max(const void* in, int32_t fp_dtype, int64_t numel,
                            int32_t nthreads, float* out_min, float* out_max) {
  switch (fp_dtype) {
    case FP_F32: minmax_impl(static_cast<const float*>(in), numel, nthreads, out_min, out_max); break;
    case FP_BF16: minmax_impl(static_cast<const uint16_t*>(in), numel, nthreads, out_min, out_max); break;
    case FP_F64: minmax_impl(static_cast<const double*>(in), numel, nthreads, out_min, out_max); break;
  }
}

PQH_EXPORT void pqh_compute_quant_params(const void* in, int32_t fp_dtype,
                                         int64_t numel, int32_t q_dtype,
                                         int32_t nthreads, float* out_scale,
                                         int64_t* out_zp) {
  float rmin, rmax;
  pqh_min_max(in, fp_dtype, numel, nthreads, &rmin, &rmax);
  QInfo qi = qinfo(static_cast<QDtype>(q_dtype));
  if (rmin == rmax) {
    *out_scale = 1.0f;
    *out_zp = (qi.qmax + qi.qmin) >> 1;
    return;
  }
  float scale = (rmax - rmin) / static_cast<float>(qi.qmax - qi.qmin);
  double zp = static_cast<double>(qi.qmin) - static_cast<double>(rmin) / scale;
  zp = std::clamp(std::round(zp), static_cast<double>(qi.qmin), static_cast<double>(qi.qmax));
  *out_scale = scale;
  *out_zp = static_cast<int64_t>(zp);
}

PQH_EXPORT void pqh_quantize_nf4(const void* in, int32_t fp_dtype,
                                 uint8_t* out, int64_t numel, float scale,
                                 int32_t nthreads) {
  switch (fp_dtype) {
    case FP_F32:
      nf4_quantize_impl(static_cast<const float*>(in), out, numel, scale, nthreads);
      break;
    case FP_BF16:
      nf4_quantize_impl(static_cast<const uint16_t*>(in), out, numel, scale, nthreads);
      break;
    case FP_F64:
      nf4_quantize_impl(static_cast<const double*>(in), out, numel, scale, nthreads);
      break;
  }
}

PQH_EXPORT void pqh_dequantize_nf4(const uint8_t* in, void* out,
                                   int32_t fp_dtype, int64_t numel,
                                   float scale, int32_t reduce_op,
                                   int32_t nthreads) {
  ReduceOp ro = static_cast<ReduceOp>(reduce_op);
  switch (fp_dtype) {
    case FP_F32:
      nf4_dequantize_impl(in, static_cast<float*>(out), numel, scale, ro, nthreads);
      break;
    case FP_BF16:
      nf4_dequantize_impl(in, static_cast<uint16_t*>(out), numel, scale, ro, nthreads);
      break;
    case FP_F64:
      nf4_dequantize_impl(in, static_cast<double*>(out), numel, scale, ro, nthreads);
      break;
  }
}

PQH_EXPORT int32_t pqh_version() { return 2; }  // v2: + NF4

}  // extern "C"
