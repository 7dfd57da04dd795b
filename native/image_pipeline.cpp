// Native bulk image pipeline: JPEG decode (libjpeg) + bilinear resize,
// OpenMP-parallel over files.
//
// This is the host-side hot loop of dataset startup (the reference decodes
// serially through cv2, /root/reference/data/dataset.py:85-156); here a
// single C call decodes and resizes a whole file list into a preallocated
// uint8 [N, R, R, 3] RGB array.
//
// Resize matches cv2.resize INTER_LINEAR semantics (half-pixel centers,
// edge clamp) so arrays are interchangeable with the cv2 path.
//
// Build: g++ -O3 -fopenmp -shared -fPIC -o libimage_pipeline.so \
//        image_pipeline.cpp -ljpeg

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// Decode one JPEG file into an RGB buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (f == nullptr) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(w) * h * 3);
  const int stride = w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize, cv2 INTER_LINEAR semantics (half-pixel centers, clamp).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    float ty = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float tx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float p00 = src[(static_cast<size_t>(y0c) * sw + x0c) * 3 + c];
        float p01 = src[(static_cast<size_t>(y0c) * sw + x1c) * 3 + c];
        float p10 = src[(static_cast<size_t>(y1c) * sw + x0c) * 3 + c];
        float p11 = src[(static_cast<size_t>(y1c) * sw + x1c) * 3 + c];
        float top = p00 * (1 - tx) + p01 * tx;
        float bot = p10 * (1 - tx) + p11 * tx;
        float v = top * (1 - ty) + bot * ty;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode+resize a list of JPEG paths into out [n, resize_dim, resize_dim, 3]
// (RGB, uint8, preallocated). paths: '\n'-joined. ok[i] set 1 on success.
// Returns the number of successfully decoded images.
int bulk_decode_resize(const char* paths_blob, int64_t blob_len, int n,
                       int resize_dim, uint8_t* out, uint8_t* ok,
                       int num_threads) {
  // split paths
  std::vector<std::pair<const char*, size_t>> paths;
  paths.reserve(n);
  const char* p = paths_blob;
  const char* end = paths_blob + blob_len;
  while (p < end && static_cast<int>(paths.size()) < n) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (nl == nullptr) nl = end;
    paths.emplace_back(p, static_cast<size_t>(nl - p));
    p = nl + 1;
  }

  const size_t img_bytes =
      static_cast<size_t>(resize_dim) * resize_dim * 3;
  int n_ok = 0;

#pragma omp parallel for schedule(dynamic) num_threads(num_threads) \
    reduction(+ : n_ok)
  for (int i = 0; i < static_cast<int>(paths.size()); ++i) {
    std::string path(paths[i].first, paths[i].second);
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    if (decode_jpeg(path.c_str(), rgb, w, h)) {
      resize_bilinear(rgb.data(), w, h, out + img_bytes * i, resize_dim,
                      resize_dim);
      ok[i] = 1;
      n_ok += 1;
    } else {
      ok[i] = 0;
      memset(out + img_bytes * i, 0, img_bytes);
    }
  }
  return n_ok;
}

}  // extern "C"
