// gsio: native IO fast paths for sixdgs_tpu (ctypes ABI).
//
// TPU-native replacement for the data-loading roles the reference delegates
// to native code: the COLMAP binary parsers are pure-Python struct loops in
// the reference (/root/reference/scene/colmap_utils.py:83-294), which is
// minutes for million-point reconstructions; this walks the mmap'd records in
// C++. Also a bulk PLY vertex de/interleaver used by the PLY codec.
//
// Build: g++ -O3 -shared -fPIC -o libgsio.so gsio.cpp  (see Makefile)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- points3D
// Record: uint64 id; 3x double xyz; 3x uint8 rgb; double error;
//         uint64 track_len; track_len x (uint32 image_id, uint32 point2D_idx)

// First pass: number of points, or -1 on error.
long long gsio_count_points3d(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  fclose(f);
  return (long long)n;
}

// Fill xyz [n*3] f64, rgb [n*3] u8, err [n] f64. Returns points read or -1.
long long gsio_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                             double* err, long long max_n) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  if (fread(&n, 8, 1, f) != 1) { fclose(f); return -1; }
  if ((long long)n > max_n) n = (uint64_t)max_n;
  // stream with a buffered reader; records are variable length
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t id;
    if (fread(&id, 8, 1, f) != 1) { fclose(f); return -1; }
    if (fread(xyz + 3 * i, 8, 3, f) != 3) { fclose(f); return -1; }
    if (fread(rgb + 3 * i, 1, 3, f) != 3) { fclose(f); return -1; }
    if (fread(err + i, 8, 1, f) != 1) { fclose(f); return -1; }
    uint64_t track_len;
    if (fread(&track_len, 8, 1, f) != 1) { fclose(f); return -1; }
    if (fseek(f, (long)(8 * track_len), SEEK_CUR) != 0) { fclose(f); return -1; }
  }
  fclose(f);
  return (long long)n;
}

// ------------------------------------------------------------------- PLY
// Interleaved f32 vertex block [n, n_props] -> column-major planes, and back.
// (numpy structured-array views already do this zero-copy for reads; the
// writer benefits from a single interleave pass without temporary tuples.)

void gsio_interleave_f32(const float* const* columns, int n_cols,
                         long long n_rows, float* out) {
  for (long long r = 0; r < n_rows; ++r) {
    float* dst = out + r * n_cols;
    for (int c = 0; c < n_cols; ++c) dst[c] = columns[c][r];
  }
}

void gsio_deinterleave_f32(const float* data, int n_cols, long long n_rows,
                           float* const* columns) {
  for (long long r = 0; r < n_rows; ++r) {
    const float* src = data + r * n_cols;
    for (int c = 0; c < n_cols; ++c) columns[c][r] = src[c];
  }
}

}  // extern "C"
