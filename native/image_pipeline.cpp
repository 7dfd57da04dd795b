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
// Build: g++ -O3 -fopenmp -shared -fPIC -o libimage_pipeline.so
//        image_pipeline.cpp -ljpeg   (see Makefile)

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
//
// prescale_min > 0 enables DCT-domain scaled decode: the smallest libjpeg
// m/8 scale whose output keeps BOTH dimensions >= prescale_min is used, so
// the IDCT runs on fewer coefficients (large sources decode several times
// faster). The scaled image is then bilinear-resized as usual. 0 = always
// decode at full resolution (bit-identical to the cv2 fallback path).
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h,
                 int prescale_min) {
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
  if (prescale_min > 0) {
    // smallest m in 1..8 keeping ceil(dim*m/8) >= prescale_min for both
    // dims; if the source is already smaller than prescale_min this stays
    // at 8/8 (full resolution, unchanged output).
    unsigned int m = 8;
    for (unsigned int c = 1; c < 8; ++c) {
      const unsigned long sw = (cinfo.image_width * c + 7) / 8;
      const unsigned long sh = (cinfo.image_height * c + 7) / 8;
      if (sw >= static_cast<unsigned long>(prescale_min) &&
          sh >= static_cast<unsigned long>(prescale_min)) {
        m = c;
        break;
      }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);

  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(w) * h * 3);
  const int stride = w * 3;
  // read up to rec_outbuf_height rows per call (fewer per-call overheads
  // than scanline-at-a-time; the decoder caps the count itself)
  JSAMPROW rows[8];
  const int max_rows =
      cinfo.rec_outbuf_height > 8 ? 8
      : (cinfo.rec_outbuf_height < 1 ? 1 : cinfo.rec_outbuf_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    const JDIMENSION base = cinfo.output_scanline;
    int n = max_rows;
    if (base + n > cinfo.output_height) n = cinfo.output_height - base;
    for (int r = 0; r < n; ++r)
      rows[r] = rgb.data() + static_cast<size_t>(base + r) * stride;
    jpeg_read_scanlines(&cinfo, rows, n);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize, cv2 INTER_LINEAR semantics (half-pixel centers, clamp).
//
// Matches cv2's 8-bit path structurally: separable fixed-point (11-bit
// coefficients, 22-bit accumulator) with the horizontal tap offsets and
// weights precomputed per image and the horizontally-resized source rows
// kept in a rolling 2-row cache (the vertical source index is
// non-decreasing, so each source row is resized at most once).  ~6x the
// naive per-pixel float loop and bit-closer to cv2's own rounding.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  constexpr int kBits = 11;                 // cv2 INTER_RESIZE_COEF_BITS
  constexpr int32_t kOne = 1 << kBits;      // 2048
  const double sx = static_cast<double>(sw) / dw;
  const double sy = static_cast<double>(sh) / dh;

  // horizontal taps: byte offsets of the two source pixels + 11-bit weights
  std::vector<int32_t> xofs0(dw), xofs1(dw), xw0(dw), xw1(dw);
  for (int x = 0; x < dw; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);  // floor
    double tx = fx - x0;
    int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
    int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
    xofs0[x] = x0c * 3;
    xofs1[x] = x1c * 3;
    int32_t w1 = static_cast<int32_t>(tx * kOne + 0.5);
    xw1[x] = w1;
    xw0[x] = kOne - w1;
  }

  // rolling cache of two horizontally-resized rows ([dw*3] int32, scaled
  // by 2048; max value 255*2048 so the vertical combine fits int32)
  const int row_elems = dw * 3;
  std::vector<int32_t> rowbuf(2 * static_cast<size_t>(row_elems));
  int cached[2] = {-1, -1};
  auto hresize = [&](int srow_idx, int slot) {
    const uint8_t* srow = src + static_cast<size_t>(srow_idx) * sw * 3;
    int32_t* out_row = rowbuf.data() + static_cast<size_t>(slot) * row_elems;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = srow + xofs0[x];
      const uint8_t* p1 = srow + xofs1[x];
      const int32_t w0 = xw0[x], w1 = xw1[x];
      out_row[x * 3 + 0] = p0[0] * w0 + p1[0] * w1;
      out_row[x * 3 + 1] = p0[1] * w0 + p1[1] * w1;
      out_row[x * 3 + 2] = p0[2] * w0 + p1[2] * w1;
    }
    cached[slot] = srow_idx;
  };
  auto get_row = [&](int srow_idx) -> const int32_t* {
    for (int s = 0; s < 2; ++s) {
      if (cached[s] == srow_idx)
        return rowbuf.data() + static_cast<size_t>(s) * row_elems;
    }
    int slot = cached[0] <= cached[1] ? 0 : 1;  // evict the older row
    hresize(srow_idx, slot);
    return rowbuf.data() + static_cast<size_t>(slot) * row_elems;
  };

  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    double ty = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    const int32_t b1 = static_cast<int32_t>(ty * kOne + 0.5);
    const int32_t b0 = kOne - b1;
    const int32_t* r0 = get_row(y0c);
    const int32_t* r1 = y1c == y0c ? r0 : get_row(y1c);
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    // max accumulator: 255*2048*2048 + 2^21 < 2^31 — int32 is safe
    constexpr int32_t kRound = 1 << (2 * kBits - 1);
    for (int i = 0; i < row_elems; ++i) {
      int32_t v = (r0[i] * b0 + r1[i] * b1 + kRound) >> (2 * kBits);
      drow[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

}  // namespace

extern "C" {

// Decode+resize a list of JPEG paths into out [n, resize_dim, resize_dim, 3]
// (RGB, uint8, preallocated). paths: '\n'-joined. ok[i] set 1 on success.
// Returns the number of successfully decoded images.
//
// prescale_min: see decode_jpeg — 0 decodes at full resolution; a positive
// value enables DCT-domain scaled decode with that minimum dimension.
int bulk_decode_resize2(const char* paths_blob, int64_t blob_len, int n,
                        int resize_dim, int prescale_min, uint8_t* out,
                        uint8_t* ok, int num_threads) {
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
    if (decode_jpeg(path.c_str(), rgb, w, h, prescale_min)) {
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

// Legacy entry point (full-resolution decode), kept so a stale caller
// bound to the old symbol keeps working.
int bulk_decode_resize(const char* paths_blob, int64_t blob_len, int n,
                       int resize_dim, uint8_t* out, uint8_t* ok,
                       int num_threads) {
  return bulk_decode_resize2(paths_blob, blob_len, n, resize_dim, 0, out, ok,
                             num_threads);
}

}  // extern "C"
