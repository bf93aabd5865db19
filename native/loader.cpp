// ealdm-tpu native data loader.
//
// Native-runtime counterpart of the reference's DataLoader worker processes
// (/root/reference/main.py:166-241 + STDiff dataset _loadimage): the hot
// host-ETL inner loop — .npy image decode, bilinear resize, [-1,1]
// normalize — implemented in C++ with a pthread batch loader, exposed to
// Python through a C ABI (ctypes; no pybind11 dependency).
//
// Build: make -C native   (produces libealdm_loader.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  int h = 0, w = 0, c = 1;
  bool is_u8 = false;   // |u1
  bool is_f32 = false;  // <f4
  size_t data_offset = 0;
};

// Minimal .npy header parser (v1.0 / v2.0, C-order only).
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  if (header.find("'fortran_order': True") != std::string::npos) return false;
  info->is_u8 = header.find("'|u1'") != std::string::npos ||
                header.find("'descr': '|u1'") != std::string::npos;
  info->is_f32 = header.find("<f4") != std::string::npos;
  if (!info->is_u8 && !info->is_f32) return false;

  size_t p = header.find("'shape':");
  if (p == std::string::npos) return false;
  p = header.find('(', p);
  size_t q = header.find(')', p);
  if (p == std::string::npos || q == std::string::npos) return false;
  std::string shape = header.substr(p + 1, q - p - 1);
  int dims[4] = {0, 0, 0, 0};
  int nd = 0;
  const char* s = shape.c_str();
  while (*s && nd < 4) {
    while (*s == ' ' || *s == ',') s++;
    if (*s == '\0') break;
    dims[nd++] = atoi(s);
    while (*s && *s != ',') s++;
  }
  if (nd == 2) {
    info->h = dims[0]; info->w = dims[1]; info->c = 1;
  } else if (nd == 3) {
    info->h = dims[0]; info->w = dims[1]; info->c = dims[2];
  } else {
    return false;
  }
  return info->h > 0 && info->w > 0 && (info->c == 1 || info->c == 3 || info->c == 4);
}

// Bilinear sample from a HWC float image.
inline float bilinear(const float* img, int h, int w, int c, float y, float x,
                      int ch) {
  int x0 = (int)x, y0 = (int)y;
  int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
  int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
  float fx = x - x0, fy = y - y0;
  const float v00 = img[(y0 * w + x0) * c + ch];
  const float v01 = img[(y0 * w + x1) * c + ch];
  const float v10 = img[(y1 * w + x0) * c + ch];
  const float v11 = img[(y1 * w + x1) * c + ch];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

// Load one .npy image -> float32 [size, size, 3] in [-1, 1].
int load_one(const char* path, int size, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info)) { fclose(f); return -2; }
  size_t n = (size_t)info.h * info.w * info.c;
  std::vector<float> buf(n);
  if (info.is_u8) {
    std::vector<uint8_t> raw(n);
    fseek(f, (long)info.data_offset, SEEK_SET);
    if (fread(raw.data(), 1, n, f) != n) { fclose(f); return -3; }
    for (size_t i = 0; i < n; i++) buf[i] = raw[i] * (1.0f / 255.0f);
  } else {
    fseek(f, (long)info.data_offset, SEEK_SET);
    if (fread(buf.data(), 4, n, f) != n) { fclose(f); return -3; }
    // heuristically rescale 0..255 float sources
    float mx = 0.f;
    for (size_t i = 0; i < n && i < 4096; i++) if (buf[i] > mx) mx = buf[i];
    if (mx > 1.5f) for (size_t i = 0; i < n; i++) buf[i] *= (1.0f / 255.0f);
  }
  fclose(f);

  const float sy = info.h > 1 ? (float)(info.h - 1) / (size > 1 ? size - 1 : 1) : 0.f;
  const float sx = info.w > 1 ? (float)(info.w - 1) / (size > 1 ? size - 1 : 1) : 0.f;
  for (int y = 0; y < size; y++) {
    for (int x = 0; x < size; x++) {
      for (int ch = 0; ch < 3; ch++) {
        int src_ch = info.c == 1 ? 0 : (ch < info.c ? ch : info.c - 1);
        float v = bilinear(buf.data(), info.h, info.w, info.c,
                           y * sy, x * sx, src_ch);
        out[(y * size + x) * 3 + ch] = v * 2.0f - 1.0f;
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Probe an .npy image; returns 0 and fills h/w/c on success.
int ealdm_probe_npy(const char* path, int* h, int* w, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *h = info.h; *w = info.w; *c = info.c;
  return 0;
}

// Load one image to out[size*size*3] float32 in [-1, 1]. Returns 0 on ok.
int ealdm_load_image_f32(const char* path, int size, float* out) {
  return load_one(path, size, out);
}

// Load a batch of n images in parallel with `threads` workers into
// out[n, size, size, 3]. Returns number of failures (0 == all ok).
int ealdm_load_batch_f32(const char** paths, int n, int size, int threads,
                         float* out) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::vector<int> errors(threads, 0);
  const size_t stride = (size_t)size * size * 3;
  std::vector<std::thread> workers;
  for (int t = 0; t < threads; t++) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += threads) {
        if (load_one(paths[i], size, out + stride * i) != 0) errors[t]++;
      }
    });
  }
  for (auto& th : workers) th.join();
  int total = 0;
  for (int e : errors) total += e;
  return total;
}

}  // extern "C"
