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

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

// source pixel width: RGBX (dword per pixel) with turbo extensions,
// plain RGB otherwise — decode_jpeg and resize_bilinear must agree.
#ifdef JCS_EXTENSIONS
constexpr int kSrcPx = 4;
#else
constexpr int kSrcPx = 3;
#endif

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// Shared decode body: runs AFTER the jpeg source (stdio or memory) is
// set on an initialized cinfo. The caller owns setjmp/create/destroy.
//
// prescale_min > 0 enables DCT-domain scaled decode: the smallest libjpeg
// m/8 scale whose output keeps BOTH dimensions >= prescale_min is used, so
// the IDCT runs on fewer coefficients (large sources decode several times
// faster). The scaled image is then bilinear-resized as usual. 0 = always
// decode at full resolution (bit-identical to the cv2 fallback path).
void decode_body(jpeg_decompress_struct& cinfo, std::vector<uint8_t>& rgb,
                 int& w, int& h, int prescale_min) {
  jpeg_read_header(&cinfo, TRUE);
  // RGBX (4 B/px) when libjpeg-turbo extensions exist: every pixel is one
  // aligned dword, which the AVX2 resize gathers directly; the RGB channel
  // values are bit-identical to a JCS_RGB decode.
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_RGBX;
#else
  cinfo.out_color_space = JCS_RGB;
#endif
  if (prescale_min > 0) {
    // smallest SIMD-fast m in {1, 2, 4} keeping ceil(dim*m/8) >=
    // prescale_min for both dims, else 8/8 (full resolution, unchanged
    // output).  Intermediate ratios (3/8..7/8) route libjpeg-turbo to
    // its SCALAR scaled-IDCT (only 1x1/2x2/4x4/8x8 have SIMD kernels)
    // and measured SLOWER than full-res SIMD decode: 66 vs 84 img/s at
    // 1317px -> 439 where the old smallest-any-m rule picked 6/8 (r3).
    unsigned int m = 8;
    const unsigned int kFast[] = {1, 2, 4};
    for (unsigned int c : kFast) {
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
  rgb.resize(static_cast<size_t>(w) * h * kSrcPx);
  const int stride = w * kSrcPx;
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
}

// Decode one JPEG file into an RGB(X) buffer. Returns true on success.
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
  decode_body(cinfo, rgb, w, h, prescale_min);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode one in-memory JPEG (jpeg_mem_src) into an RGB(X) buffer — the
// serving hot path, where request images arrive as bytes, not files.
bool decode_jpeg_from_mem(const uint8_t* data, size_t len,
                          std::vector<uint8_t>& rgb, int& w, int& h,
                          int prescale_min) {
  if (data == nullptr || len == 0) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  decode_body(cinfo, rgb, w, h, prescale_min);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

#if defined(__AVX2__)
// AVX2 resize core for RGBX sources. Bit-identical to the scalar path:
// the horizontal pass computes p0*w0 + p1*w1 per channel with vpmaddwd
// (exact in int32 for 8-bit pixels and 11-bit weights), the vertical
// pass the same (r0*b0 + r1*b1 + round) >> 22 with vpmulld.
void resize_bilinear_rgbx_avx2(const uint8_t* src, int sw, int sh,
                               uint8_t* dst, int dw, int dh,
                               const int32_t* xofs0, const int32_t* xofs1,
                               const int32_t* xw0, const int32_t* xw1,
                               double sy) {
  constexpr int kBits = 11;
  constexpr int32_t kOne = 1 << kBits;
  constexpr int32_t kRound = 1 << (2 * kBits - 1);
  const int row_elems = dw * 4;

  // per-output-pixel horizontal weight block: 8 int16 = [w0 w1] x4, the
  // exact layout vpmaddwd needs against [p0.c p1.c] int16 pairs
  std::vector<int16_t> wpair(static_cast<size_t>(dw) * 8);
  for (int x = 0; x < dw; ++x) {
    for (int c = 0; c < 4; ++c) {
      wpair[x * 8 + c * 2 + 0] = static_cast<int16_t>(xw0[x]);
      wpair[x * 8 + c * 2 + 1] = static_cast<int16_t>(xw1[x]);
    }
  }

  std::vector<int32_t> rowbuf(2 * static_cast<size_t>(row_elems));
  std::vector<uint8_t> rgbx_row(static_cast<size_t>(row_elems));
  int cached[2] = {-1, -1};

  auto hresize = [&](int srow_idx, int slot) {
    const uint8_t* srow = src + static_cast<size_t>(srow_idx) * sw * 4;
    const int* spx = reinterpret_cast<const int*>(srow);
    int32_t* out_row = rowbuf.data() + static_cast<size_t>(slot) * row_elems;
    const __m256i zero = _mm256_setzero_si256();
    int x = 0;
    for (; x + 8 <= dw; x += 8) {
      const __m256i i0 =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(xofs0 + x));
      const __m256i i1 =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(xofs1 + x));
      const __m256i g0 = _mm256_i32gather_epi32(spx, i0, 4);  // 8 px p0
      const __m256i g1 = _mm256_i32gather_epi32(spx, i1, 4);  // 8 px p1
      // interleave p0/p1 bytes, widen to int16 [p0.c p1.c] pairs
      const __m256i lo = _mm256_unpacklo_epi8(g0, g1);  // px 0,1 | 4,5
      const __m256i hi = _mm256_unpackhi_epi8(g0, g1);  // px 2,3 | 6,7
      const __m256i a0 = _mm256_unpacklo_epi8(lo, zero);  // px 0 | 4
      const __m256i a1 = _mm256_unpackhi_epi8(lo, zero);  // px 1 | 5
      const __m256i a2 = _mm256_unpacklo_epi8(hi, zero);  // px 2 | 6
      const __m256i a3 = _mm256_unpackhi_epi8(hi, zero);  // px 3 | 7
      const int16_t* wp = wpair.data() + static_cast<size_t>(x) * 8;
      const __m256i w0 = _mm256_set_m128i(
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 4 * 8)),
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 0 * 8)));
      const __m256i w1 = _mm256_set_m128i(
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 5 * 8)),
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 1 * 8)));
      const __m256i w2 = _mm256_set_m128i(
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 6 * 8)),
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 2 * 8)));
      const __m256i w3 = _mm256_set_m128i(
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 7 * 8)),
          _mm_loadu_si128(reinterpret_cast<const __m128i*>(wp + 3 * 8)));
      const __m256i r0 = _mm256_madd_epi16(a0, w0);  // px0 rgbx | px4
      const __m256i r1 = _mm256_madd_epi16(a1, w1);  // px1 | px5
      const __m256i r2 = _mm256_madd_epi16(a2, w2);  // px2 | px6
      const __m256i r3 = _mm256_madd_epi16(a3, w3);  // px3 | px7
      int32_t* o = out_row + static_cast<size_t>(x) * 4;
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + 0),
                          _mm256_permute2x128_si256(r0, r1, 0x20));
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + 8),
                          _mm256_permute2x128_si256(r2, r3, 0x20));
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + 16),
                          _mm256_permute2x128_si256(r0, r1, 0x31));
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + 24),
                          _mm256_permute2x128_si256(r2, r3, 0x31));
    }
    for (; x < dw; ++x) {  // tail
      const uint8_t* p0 = srow + xofs0[x] * 4;
      const uint8_t* p1 = srow + xofs1[x] * 4;
      out_row[x * 4 + 0] = p0[0] * xw0[x] + p1[0] * xw1[x];
      out_row[x * 4 + 1] = p0[1] * xw0[x] + p1[1] * xw1[x];
      out_row[x * 4 + 2] = p0[2] * xw0[x] + p1[2] * xw1[x];
      out_row[x * 4 + 3] = 0;
    }
    cached[slot] = srow_idx;
  };
  auto get_row = [&](int srow_idx) -> const int32_t* {
    for (int s = 0; s < 2; ++s) {
      if (cached[s] == srow_idx)
        return rowbuf.data() + static_cast<size_t>(s) * row_elems;
    }
    int slot = cached[0] <= cached[1] ? 0 : 1;
    hresize(srow_idx, slot);
    return rowbuf.data() + static_cast<size_t>(slot) * row_elems;
  };

  const __m256i vround = _mm256_set1_epi32(kRound);
  const __m256i lane_fix =
      _mm256_setr_epi32(0, 4, 1, 5, 2, 6, 3, 7);  // undo packs lane split
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    double ty = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    const int32_t b1s = static_cast<int32_t>(ty * kOne + 0.5);
    const int32_t b0s = kOne - b1s;
    const int32_t* r0 = get_row(y0c);
    const int32_t* r1 = y1c == y0c ? r0 : get_row(y1c);
    const __m256i vb0 = _mm256_set1_epi32(b0s);
    const __m256i vb1 = _mm256_set1_epi32(b1s);
    int i = 0;
    auto combine8 = [&](int off) {
      const __m256i u0 =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r0 + off));
      const __m256i u1 =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r1 + off));
      __m256i v = _mm256_add_epi32(
          _mm256_add_epi32(_mm256_mullo_epi32(u0, vb0),
                           _mm256_mullo_epi32(u1, vb1)),
          vround);
      return _mm256_srai_epi32(v, 2 * kBits);
    };
    for (; i + 32 <= row_elems; i += 32) {
      const __m256i va = combine8(i + 0);
      const __m256i vb = combine8(i + 8);
      const __m256i vc = combine8(i + 16);
      const __m256i vd = combine8(i + 24);
      __m256i p01 = _mm256_packs_epi32(va, vb);
      __m256i p23 = _mm256_packs_epi32(vc, vd);
      __m256i p = _mm256_packus_epi16(p01, p23);
      p = _mm256_permutevar8x32_epi32(p, lane_fix);
      _mm256_storeu_si256(
          reinterpret_cast<__m256i*>(rgbx_row.data() + i), p);
    }
    for (; i < row_elems; ++i) {  // tail
      int32_t v = (r0[i] * b0s + r1[i] * b1s + kRound) >> (2 * kBits);
      rgbx_row[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    // compact RGBX -> RGB into the destination row
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    const uint8_t* s = rgbx_row.data();
    for (int x = 0; x < dw; ++x) {
      drow[x * 3 + 0] = s[x * 4 + 0];
      drow[x * 3 + 1] = s[x * 4 + 1];
      drow[x * 3 + 2] = s[x * 4 + 2];
    }
  }
}
#endif  // __AVX2__

// Bilinear resize, cv2 INTER_LINEAR semantics (half-pixel centers, clamp).
//
// Matches cv2's 8-bit path structurally: separable fixed-point (11-bit
// coefficients, 22-bit accumulator) with the horizontal tap offsets and
// weights precomputed per image and the horizontally-resized source rows
// kept in a rolling 2-row cache (the vertical source index is
// non-decreasing, so each source row is resized at most once).
//
// When the source is RGBX (kSrcPx == 4, the libjpeg-turbo decode layout)
// and AVX2 is compiled in, the horizontal pass gathers whole pixels as
// dwords and multiply-adds pairs with vpmaddwd, and the vertical pass
// runs 8 lanes of the same int32 arithmetic — both bit-identical to the
// scalar loops (same 11-bit weights, same rounding, same clamp), which
// is what keeps this interchangeable with the cv2 arrays.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  constexpr int kBits = 11;                 // cv2 INTER_RESIZE_COEF_BITS
  constexpr int32_t kOne = 1 << kBits;      // 2048
  const double sx = static_cast<double>(sw) / dw;
  const double sy = static_cast<double>(sh) / dh;

  // horizontal taps: source PIXEL indices of the two taps + 11-bit weights
  std::vector<int32_t> xofs0(dw), xofs1(dw), xw0(dw), xw1(dw);
  for (int x = 0; x < dw; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);  // floor
    double tx = fx - x0;
    int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
    int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
    xofs0[x] = x0c;
    xofs1[x] = x1c;
    int32_t w1 = static_cast<int32_t>(tx * kOne + 0.5);
    xw1[x] = w1;
    xw0[x] = kOne - w1;
  }

#if defined(__AVX2__)
  if (kSrcPx == 4) {
    resize_bilinear_rgbx_avx2(src, sw, sh, dst, dw, dh, xofs0.data(),
                              xofs1.data(), xw0.data(), xw1.data(), sy);
    return;
  }
#endif

  // rolling cache of two horizontally-resized rows ([dw*px] int32, scaled
  // by 2048; max value 255*2048 so the vertical combine fits int32)
  const int row_elems = dw * kSrcPx;
  std::vector<int32_t> rowbuf(2 * static_cast<size_t>(row_elems));
  int cached[2] = {-1, -1};
  auto hresize = [&](int srow_idx, int slot) {
    const uint8_t* srow =
        src + static_cast<size_t>(srow_idx) * sw * kSrcPx;
    int32_t* out_row = rowbuf.data() + static_cast<size_t>(slot) * row_elems;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = srow + xofs0[x] * kSrcPx;
      const uint8_t* p1 = srow + xofs1[x] * kSrcPx;
      const int32_t w0 = xw0[x], w1 = xw1[x];
      out_row[x * kSrcPx + 0] = p0[0] * w0 + p1[0] * w1;
      out_row[x * kSrcPx + 1] = p0[1] * w0 + p1[1] * w1;
      out_row[x * kSrcPx + 2] = p0[2] * w0 + p1[2] * w1;
      if (kSrcPx == 4) out_row[x * kSrcPx + 3] = 0;
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
    for (int x = 0; x < dw; ++x) {
      const int32_t* q0 = r0 + x * kSrcPx;
      const int32_t* q1 = r1 + x * kSrcPx;
      for (int c = 0; c < 3; ++c) {
        int32_t v = (q0[c] * b0 + q1[c] * b1 + kRound) >> (2 * kBits);
        drow[x * 3 + c] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode-rule/ABI version of this library.  Bump whenever the PIXELS a
// given (path, resize_dim, prescale_min) call produces can change — e.g.
// the prescale m-selection rule — so Python-side decoded-array cache keys
// can track the actual decode behavior instead of just probing symbols.
//   2 = SIMD-fast m-selection (m in {1,2,4} else full res), r3 rule.
int image_pipeline_abi_version(void) { return 2; }

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

// Decode+resize ONE in-memory JPEG into out [resize_dim, resize_dim, 3]
// (RGB uint8, preallocated). Returns 1 on success, 0 on undecodable input.
// The serving counterpart of the file-path entries above — replaces the
// cv2.imdecode+cv2.resize pair in the request hot path with the same
// fixed-point resize the bulk loader uses.
int decode_resize_mem(const uint8_t* data, int64_t len, int resize_dim,
                      int prescale_min, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg_from_mem(data, static_cast<size_t>(len), rgb, w, h,
                            prescale_min))
    return 0;
  resize_bilinear(rgb.data(), w, h, out, resize_dim, resize_dim);
  return 1;
}

// Decode+resize n concatenated in-memory JPEGs. blob holds the images
// back to back; offsets[n+1] frames them (image i spans
// [offsets[i], offsets[i+1])). out is [n, resize_dim, resize_dim, 3]
// uint8 preallocated; ok[i] set 1 on success. Returns the success count.
// OpenMP-parallel over images — one call decodes a whole serving batch.
int bulk_decode_resize_mem(const uint8_t* blob, const int64_t* offsets,
                           int n, int resize_dim, int prescale_min,
                           uint8_t* out, uint8_t* ok, int num_threads) {
  const size_t img_bytes =
      static_cast<size_t>(resize_dim) * resize_dim * 3;
  int n_ok = 0;

#pragma omp parallel for schedule(dynamic) num_threads(num_threads) \
    reduction(+ : n_ok)
  for (int i = 0; i < n; ++i) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    const int64_t lo = offsets[i], hi = offsets[i + 1];
    if (hi > lo &&
        decode_jpeg_from_mem(blob + lo, static_cast<size_t>(hi - lo), rgb,
                             w, h, prescale_min)) {
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
