// Native data-loader core: fused JPEG/PNG decode + background composite +
// crop/resize + HSV distortion, with a std::thread batch API.
//
// The reference repo has no native code at all (SURVEY.md §2.5) — its host
// pipeline is PIL in DataLoader worker *processes* (reference:
// image.py:129-142, train.py:366).  At TPU inference rates (>2000 fps) the
// Python/PIL path becomes the bottleneck, so this library implements the
// exact augmentation semantics of singleshotpose_tpu/data/augment.py in C++
// (libjpeg/libpng decode, center-sample nearest resize, zero-padded crop,
// alpha composite, PIL-scaled HSV shift) and parallelizes a whole batch with
// native threads — no GIL, no per-worker process fork.
//
// Randomness stays in Python: crop/shift/HSV parameters are drawn by the
// caller (numpy RandomState) and passed in, keeping the native path
// deterministic and bit-comparable with the pure-Python fallback.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct ImageU8 {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- decode --

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, ImageU8* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = int(w);
  out->h = int(h);
  out->data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, ImageU8* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ------------------------------------------------------------- transforms --

// Center-sample nearest resize (augment.resize_nearest).
void resize_nearest(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                    int dw) {
  std::vector<int> xi(dw), yi(dh);
  for (int x = 0; x < dw; x++)
    xi[x] = std::min(int((x + 0.5) * sw / dw), sw - 1);
  for (int y = 0; y < dh; y++)
    yi[y] = std::min(int((y + 0.5) * sh / dh), sh - 1);
  for (int y = 0; y < dh; y++) {
    const uint8_t* srow = src + size_t(yi[y]) * sw * 3;
    uint8_t* drow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; x++)
      memcpy(drow + x * 3, srow + xi[x] * 3, 3);
  }
}

// img = img*alpha + bg*(1-alpha), alpha = mask/255 (augment.change_background);
// bg is resized to img dims on the fly.
void composite_bg(ImageU8* img, const ImageU8& mask, const ImageU8& bg) {
  ImageU8 bgr;
  bgr.h = img->h;
  bgr.w = img->w;
  bgr.data.resize(size_t(img->h) * img->w * 3);
  resize_nearest(bg.data.data(), bg.h, bg.w, bgr.data.data(), img->h, img->w);
  size_t npx = size_t(img->h) * img->w * 3;  // caller checked mask dims
  for (size_t i = 0; i < npx; i++) {
    float a = mask.data[i] / 255.0f;
    img->data[i] = uint8_t(img->data[i] * a + bgr.data[i] * (1.0f - a));
  }
}

// Zero-padded crop (pleft,ptop,cw,ch) + nearest resize (augment.crop_resize).
void crop_resize(const ImageU8& src, int pleft, int ptop, int cw, int ch,
                 uint8_t* dst, int dw, int dh) {
  ImageU8 crop;
  crop.h = ch;
  crop.w = cw;
  crop.data.assign(size_t(ch) * cw * 3, 0);
  int y0 = std::max(ptop, 0), y1 = std::min(ptop + ch, src.h);
  int x0 = std::max(pleft, 0), x1 = std::min(pleft + cw, src.w);
  for (int y = y0; y < y1; y++) {
    memcpy(crop.data.data() + (size_t(y - ptop) * cw + (x0 - pleft)) * 3,
           src.data.data() + (size_t(y) * src.w + x0) * 3,
           size_t(x1 - x0) * 3);
  }
  resize_nearest(crop.data.data(), ch, cw, dst, dh, dw);
}

// HSV distortion matching augment.distort_hsv (PIL 0..255 hue scale,
// single wraparound, sat/val clip).
void distort_hsv(uint8_t* img, int h, int w, float dhue, float dsat,
                 float dexp) {
  size_t n = size_t(h) * w;
  for (size_t i = 0; i < n; i++) {
    float r = img[i * 3 + 0] / 255.0f;
    float g = img[i * 3 + 1] / 255.0f;
    float b = img[i * 3 + 2] / 255.0f;
    float mx = std::max({r, g, b}), mn = std::min({r, g, b});
    float d = mx - mn;
    float hue;
    if (d == 0) {
      hue = 0;
    } else if (mx == r) {
      hue = (g - b) / d;
      hue -= 6.0f * std::floor(hue / 6.0f);  // fmod into [0,6)
    } else if (mx == g) {
      hue = (b - r) / d + 2.0f;
    } else {
      hue = (r - g) / d + 4.0f;
    }
    hue /= 6.0f;
    float s = mx == 0 ? 0 : d / mx;
    float v = mx;
    // quantize to u8 like the numpy path (astype(uint8) truncation)
    uint8_t hq = uint8_t(hue * 255.0f);
    uint8_t sq = uint8_t(s * 255.0f);
    uint8_t vq = uint8_t(v * 255.0f);
    float sf = std::min(std::max(sq * dsat, 0.0f), 255.0f);
    float vf = std::min(std::max(vq * dexp, 0.0f), 255.0f);
    float hf = hq + dhue * 255.0f;
    if (hf > 255.0f) hf -= 255.0f;
    if (hf < 0.0f) hf += 255.0f;
    // back to RGB (matches augment.hsv_to_rgb_u8)
    float hh = uint8_t(hf) * 6.0f / 255.0f;
    float ss = uint8_t(sf) / 255.0f;
    float vv = uint8_t(vf) / 255.0f;
    int ii = int(std::floor(hh)) % 6;
    float ff = hh - std::floor(hh);
    float p = vv * (1 - ss), q = vv * (1 - ss * ff),
          t = vv * (1 - ss * (1 - ff));
    float rr, gg, bb;
    switch (ii) {
      case 0: rr = vv; gg = t; bb = p; break;
      case 1: rr = q; gg = vv; bb = p; break;
      case 2: rr = p; gg = vv; bb = t; break;
      case 3: rr = p; gg = q; bb = vv; break;
      case 4: rr = t; gg = p; bb = vv; break;
      default: rr = vv; gg = p; bb = q; break;
    }
    img[i * 3 + 0] = uint8_t(std::min(std::max(rr * 255.0f, 0.0f), 255.0f));
    img[i * 3 + 1] = uint8_t(std::min(std::max(gg * 255.0f, 0.0f), 255.0f));
    img[i * 3 + 2] = uint8_t(std::min(std::max(bb * 255.0f, 0.0f), 255.0f));
  }
}

}  // namespace

extern "C" {

// Decode to caller buffer (cap bytes). Returns 0 ok, sets *w/*h; -1 I/O or
// decode error, -2 buffer too small (then *w/*h carry the needed dims).
int ssp_decode_rgb(const char* path, uint8_t* out, long cap, int* w, int* h) {
  ImageU8 img;
  if (!decode_file(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  long need = long(img.w) * img.h * 3;
  if (need > cap) return -2;
  memcpy(out, img.data.data(), size_t(need));
  return 0;
}

// Fused single-object train sample (PoseDataset.get_train semantics):
// decode img+mask+bg, composite, zero-padded crop (pleft,ptop,cw,ch),
// nearest resize to (out_w,out_h), HSV distort; writes float32 HWC in [0,1].
// bgpath may be NULL (skip composite). Returns 0 ok.
int ssp_train_sample(const char* imgpath, const char* maskpath,
                     const char* bgpath, int pleft, int ptop, int cw, int ch,
                     int out_w, int out_h, float dhue, float dsat, float dexp,
                     float* out) {
  ImageU8 img;
  if (!decode_file(imgpath, &img)) return -1;
  if (bgpath && maskpath) {
    ImageU8 mask, bg;
    if (!decode_file(maskpath, &mask)) return -2;
    if (!decode_file(bgpath, &bg)) return -3;
    if (mask.w != img.w || mask.h != img.h) return -4;
    composite_bg(&img, mask, bg);
  }
  std::vector<uint8_t> sized(size_t(out_w) * out_h * 3);
  crop_resize(img, pleft, ptop, cw, ch, sized.data(), out_w, out_h);
  distort_hsv(sized.data(), out_h, out_w, dhue, dsat, dexp);
  size_t n = size_t(out_w) * out_h * 3;
  for (size_t i = 0; i < n; i++) out[i] = sized[i] / 255.0f;
  return 0;
}

// Decode + nearest-resize one image to float32 HWC/255 (test path).
int ssp_test_sample(const char* imgpath, int out_w, int out_h, float* out) {
  ImageU8 img;
  if (!decode_file(imgpath, &img)) return -1;
  std::vector<uint8_t> sized(size_t(out_w) * out_h * 3);
  resize_nearest(img.data.data(), img.h, img.w, sized.data(), out_h, out_w);
  size_t n = size_t(out_w) * out_h * 3;
  for (size_t i = 0; i < n; i++) out[i] = sized[i] / 255.0f;
  return 0;
}

// u8 variant: decode + resize only — normalization happens on-device, so
// host→device transfers carry 4x less data than the float path.
int ssp_test_sample_u8(const char* imgpath, int out_w, int out_h,
                       uint8_t* out) {
  ImageU8 img;
  if (!decode_file(imgpath, &img)) return -1;
  resize_nearest(img.data.data(), img.h, img.w, out, out_h, out_w);
  return 0;
}

// Batched fused train samples across native threads.
// crops: int[4*n] (pleft,ptop,cw,ch per sample); hsv: float[3*n];
// out: float[n*out_h*out_w*3]; status: int[n]. nthreads<=0 → hw concurrency.
void ssp_train_batch(int n, const char** imgpaths, const char** maskpaths,
                     const char** bgpaths, const int* crops, const float* hsv,
                     int out_w, int out_h, float* out, int* status,
                     int nthreads) {
  if (nthreads <= 0) nthreads = int(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = ssp_train_sample(
          imgpaths[i], maskpaths ? maskpaths[i] : nullptr,
          bgpaths ? bgpaths[i] : nullptr, crops[4 * i], crops[4 * i + 1],
          crops[4 * i + 2], crops[4 * i + 3], out_w, out_h, hsv[3 * i],
          hsv[3 * i + 1], hsv[3 * i + 2],
          out + size_t(i) * out_w * out_h * 3);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

void ssp_test_batch_u8(int n, const char** imgpaths, int out_w, int out_h,
                       uint8_t* out, int* status, int nthreads) {
  if (nthreads <= 0) nthreads = int(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = ssp_test_sample_u8(imgpaths[i], out_w, out_h,
                                     out + size_t(i) * out_w * out_h * 3);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

void ssp_test_batch(int n, const char** imgpaths, int out_w, int out_h,
                    float* out, int* status, int nthreads) {
  if (nthreads <= 0) nthreads = int(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = ssp_test_sample(imgpaths[i], out_w, out_h,
                                  out + size_t(i) * out_w * out_h * 3);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
