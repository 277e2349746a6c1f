// Native data-loader core: NIfTI-1 reader + threaded trilinear resample.
//
// The reference's input pipeline decodes NIfTI volumes with nibabel and
// resizes them with torch F.interpolate on the GPU (utils/dataset.py:194-218).
// On TPU the host CPU must keep the chips fed (SURVEY.md §7 'nibabel/PIL host
// IO throughput'), so the decode + window + resample path is native here:
//   * gzip/.nii.gz inflate via zlib
//   * NIfTI-1 header parse (348-byte), dtypes u8/i16/u16/i32/f32/f64,
//     scl_slope/scl_inter applied
//   * fp32 output in the same (x,y,z) Fortran element order nibabel produces
//     (the Python wrapper reshapes with order='F' for bit-parity with the
//     nibabel fallback)
//   * trilinear resample with PyTorch's align_corners=False/True coordinate
//     conventions, parallelized over output slabs with std::thread
//
// Exposed as a C ABI for ctypes (hybrid_vit_cascade_tpu/data/native_io.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

#pragma pack(push, 1)
struct Nifti1Header {
  int32_t sizeof_hdr;
  char data_type[10];
  char db_name[18];
  int32_t extents;
  int16_t session_error;
  char regular;
  char dim_info;
  int16_t dim[8];
  float intent_p1, intent_p2, intent_p3;
  int16_t intent_code;
  int16_t datatype;
  int16_t bitpix;
  int16_t slice_start;
  float pixdim[8];
  float vox_offset;
  float scl_slope;
  float scl_inter;
  int16_t slice_end;
  char slice_code;
  char xyzt_units;
  float cal_max, cal_min;
  float slice_duration;
  float toffset;
  int32_t glmax, glmin;
  char descrip[80];
  char aux_file[24];
  int16_t qform_code, sform_code;
  float quatern_b, quatern_c, quatern_d;
  float qoffset_x, qoffset_y, qoffset_z;
  float srow_x[4], srow_y[4], srow_z[4];
  char intent_name[16];
  char magic[4];
};
#pragma pack(pop)

static_assert(sizeof(Nifti1Header) == 348, "NIfTI-1 header must be 348 bytes");

// NIfTI datatype codes
enum { DT_UINT8 = 2, DT_INT16 = 4, DT_INT32 = 8, DT_FLOAT32 = 16, DT_FLOAT64 = 64, DT_UINT16 = 512 };

bool read_all_maybe_gzip(const char* path, std::vector<uint8_t>& out) {
  // gzFile transparently handles both gzip and raw files.
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  gzbuffer(f, 1 << 20);
  out.clear();
  out.reserve(1 << 22);
  uint8_t buf[1 << 20];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) out.insert(out.end(), buf, buf + n);
  bool ok = (n == 0);
  gzclose(f);
  return ok;
}

template <typename T>
void convert_to_f32(const uint8_t* src, int64_t n, float slope, float inter, float* dst) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 0.0f) slope = 1.0f;
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
  } else {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]) * slope + inter;
  }
}

inline void axis_coords(int64_t out_size, int64_t in_size, bool align_corners,
                        std::vector<int64_t>& lo, std::vector<int64_t>& hi, std::vector<float>& frac) {
  lo.resize(out_size);
  hi.resize(out_size);
  frac.resize(out_size);
  for (int64_t i = 0; i < out_size; ++i) {
    double src;
    if (align_corners) {
      src = (out_size == 1) ? 0.0 : static_cast<double>(i) * (in_size - 1) / (out_size - 1);
    } else {
      src = (i + 0.5) * static_cast<double>(in_size) / out_size - 0.5;
      src = std::min(std::max(src, 0.0), static_cast<double>(in_size - 1));
    }
    int64_t l = static_cast<int64_t>(std::floor(src));
    l = std::min(std::max<int64_t>(l, 0), in_size - 1);
    lo[i] = l;
    hi[i] = std::min<int64_t>(l + 1, in_size - 1);
    frac[i] = static_cast<float>(src - l);
  }
}

}  // namespace

extern "C" {

// Parse header only: dims[0..2], datatype gets written; returns 0 on success.
int nifti_get_dims(const char* path, int64_t* dims_out) {
  std::vector<uint8_t> raw;
  if (!read_all_maybe_gzip(path, raw) || raw.size() < sizeof(Nifti1Header)) return -1;
  Nifti1Header h;
  std::memcpy(&h, raw.data(), sizeof(h));
  if (h.sizeof_hdr != 348) return -2;  // byte-swapped files unsupported
  dims_out[0] = h.dim[1];
  dims_out[1] = h.dim[2];
  dims_out[2] = h.dim[3];
  return 0;
}

// Read a 3-D volume as fp32 in on-disk (Fortran / x-fastest) element order.
// out must hold dim1*dim2*dim3 floats. Returns 0 on success.
int nifti_read_f32(const char* path, float* out, int64_t out_capacity) {
  std::vector<uint8_t> raw;
  if (!read_all_maybe_gzip(path, raw) || raw.size() < sizeof(Nifti1Header)) return -1;
  Nifti1Header h;
  std::memcpy(&h, raw.data(), sizeof(h));
  if (h.sizeof_hdr != 348) return -2;
  const int64_t nx = h.dim[1], ny = h.dim[2], nz = h.dim[3];
  const int64_t n = nx * ny * nz;
  if (n <= 0 || n > out_capacity) return -3;
  const int64_t off = static_cast<int64_t>(h.vox_offset);
  if (off < 348 || static_cast<size_t>(off) >= raw.size()) return -4;
  const uint8_t* data = raw.data() + off;
  const int64_t avail = static_cast<int64_t>(raw.size()) - off;
  const int64_t need = n * (h.bitpix / 8);
  if (avail < need) return -5;
  switch (h.datatype) {
    case DT_UINT8:   convert_to_f32<uint8_t>(data, n, h.scl_slope, h.scl_inter, out); break;
    case DT_INT16:   convert_to_f32<int16_t>(data, n, h.scl_slope, h.scl_inter, out); break;
    case DT_UINT16:  convert_to_f32<uint16_t>(data, n, h.scl_slope, h.scl_inter, out); break;
    case DT_INT32:   convert_to_f32<int32_t>(data, n, h.scl_slope, h.scl_inter, out); break;
    case DT_FLOAT32: convert_to_f32<float>(data, n, h.scl_slope, h.scl_inter, out); break;
    case DT_FLOAT64: convert_to_f32<double>(data, n, h.scl_slope, h.scl_inter, out); break;
    default: return -6;
  }
  return 0;
}

// Trilinear resample of a C-order (d0, d1, d2) fp32 volume to (o0, o1, o2)
// with torch's coordinate conventions; threaded over the leading output axis.
void resample_trilinear_f32(const float* src, int64_t d0, int64_t d1, int64_t d2,
                            float* dst, int64_t o0, int64_t o1, int64_t o2,
                            int align_corners, int num_threads) {
  std::vector<int64_t> lo0, hi0, lo1, hi1, lo2, hi2;
  std::vector<float> f0, f1, f2;
  axis_coords(o0, d0, align_corners, lo0, hi0, f0);
  axis_coords(o1, d1, align_corners, lo1, hi1, f1);
  axis_coords(o2, d2, align_corners, lo2, hi2, f2);
  const int64_t s0 = d1 * d2, s1 = d2;

  auto work = [&](int64_t i_begin, int64_t i_end) {
    for (int64_t i = i_begin; i < i_end; ++i) {
      const float fi = f0[i];
      const float* pa = src + lo0[i] * s0;
      const float* pb = src + hi0[i] * s0;
      float* row_out = dst + i * o1 * o2;
      for (int64_t j = 0; j < o1; ++j) {
        const float fj = f1[j];
        const float* paa = pa + lo1[j] * s1;
        const float* pab = pa + hi1[j] * s1;
        const float* pba = pb + lo1[j] * s1;
        const float* pbb = pb + hi1[j] * s1;
        for (int64_t k = 0; k < o2; ++k) {
          const float fk = f2[k];
          const int64_t ka = lo2[k], kb = hi2[k];
          const float v00 = paa[ka] + fk * (paa[kb] - paa[ka]);
          const float v01 = pab[ka] + fk * (pab[kb] - pab[ka]);
          const float v10 = pba[ka] + fk * (pba[kb] - pba[ka]);
          const float v11 = pbb[ka] + fk * (pbb[kb] - pbb[ka]);
          const float v0 = v00 + fj * (v01 - v00);
          const float v1 = v10 + fj * (v11 - v10);
          row_out[j * o2 + k] = v0 + fi * (v1 - v0);
        }
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : static_cast<int>(std::thread::hardware_concurrency());
  nt = std::max(1, std::min<int>(nt, static_cast<int>(o0)));
  if (nt == 1) {
    work(0, o0);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (o0 + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min<int64_t>(b + chunk, o0);
    if (b >= e) break;
    threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
}

// Fused HU window + affine normalize: out = (clip(x, lo, hi) - lo)/(hi - lo)
// * (r_hi - r_lo) + r_lo  (the dataset's window step, threaded).
void window_normalize_f32(float* data, int64_t n, float w_lo, float w_hi,
                          float r_lo, float r_hi, int num_threads) {
  const float scale = (r_hi - r_lo) / (w_hi - w_lo);
  int nt = num_threads > 0 ? num_threads : static_cast<int>(std::thread::hardware_concurrency());
  nt = std::max(1, nt);
  auto work = [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      float v = std::min(std::max(data[i], w_lo), w_hi);
      data[i] = (v - w_lo) * scale + r_lo;
    }
  };
  if (nt == 1 || n < (1 << 16)) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t b = t * chunk, e = std::min<int64_t>(b + chunk, n);
    if (b >= e) break;
    threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
