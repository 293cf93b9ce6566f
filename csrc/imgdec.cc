// Native image decode + resize for the captionax data pipeline.
//
// Replaces the reference's per-worker skimage.io.imread + skimage Rescale
// (/root/reference/data_loader.py:196-218, cc_dataloader.py:92-100) with a
// C++ batch decoder: libjpeg/libpng decode, the reference's
// grayscale->viridis LUT quirk (cc_dataloader.py:92-100), and a
// Pillow-compatible fixed-point triangle (bilinear) resample fused into
// the same pass, fanned out over a thread pool.  Exposed through ctypes
// (captionax/data/native_image.py); any per-image failure returns a
// status code and the Python side falls back to PIL for that image.
//
// Resample parity: the two-pass uint8 fixed-point scheme mirrors
// Pillow's ImagingResample (triangle filter, PRECISION_BITS = 32-8-2,
// horizontal-then-vertical with uint8 intermediate), so outputs are
// bit-identical to PIL.Image.resize(..., BILINEAR) on RGB inputs.

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;

// matplotlib viridis, scaled to uint8 exactly as the reference's
// (np.asarray(cm.viridis.colors) * 255).astype(np.uint8)
const uint8_t kViridis[256][3] = {
    {68,1,84},{68,2,85},{68,3,87},{69,5,88},{69,6,90},{69,8,91},{70,9,92},{70,11,94},
    {70,12,95},{70,14,97},{71,15,98},{71,17,99},{71,18,101},{71,20,102},{71,21,103},{71,22,105},
    {71,24,106},{72,25,107},{72,26,108},{72,28,110},{72,29,111},{72,30,112},{72,32,113},{72,33,114},
    {72,34,115},{72,35,116},{71,37,117},{71,38,118},{71,39,119},{71,40,120},{71,42,121},{71,43,122},
    {71,44,123},{70,45,124},{70,47,124},{70,48,125},{70,49,126},{69,50,127},{69,52,127},{69,53,128},
    {69,54,129},{68,55,129},{68,57,130},{67,58,131},{67,59,131},{67,60,132},{66,61,132},{66,62,133},
    {66,64,133},{65,65,134},{65,66,134},{64,67,135},{64,68,135},{63,69,135},{63,71,136},{62,72,136},
    {62,73,137},{61,74,137},{61,75,137},{61,76,137},{60,77,138},{60,78,138},{59,80,138},{59,81,138},
    {58,82,139},{58,83,139},{57,84,139},{57,85,139},{56,86,139},{56,87,140},{55,88,140},{55,89,140},
    {54,90,140},{54,91,140},{53,92,140},{53,93,140},{52,94,141},{52,95,141},{51,96,141},{51,97,141},
    {50,98,141},{50,99,141},{49,100,141},{49,101,141},{49,102,141},{48,103,141},{48,104,141},{47,105,141},
    {47,106,141},{46,107,142},{46,108,142},{46,109,142},{45,110,142},{45,111,142},{44,112,142},{44,113,142},
    {44,114,142},{43,115,142},{43,116,142},{42,117,142},{42,118,142},{42,119,142},{41,120,142},{41,121,142},
    {40,122,142},{40,122,142},{40,123,142},{39,124,142},{39,125,142},{39,126,142},{38,127,142},{38,128,142},
    {38,129,142},{37,130,142},{37,131,141},{36,132,141},{36,133,141},{36,134,141},{35,135,141},{35,136,141},
    {35,137,141},{34,137,141},{34,138,141},{34,139,141},{33,140,141},{33,141,140},{33,142,140},{32,143,140},
    {32,144,140},{32,145,140},{31,146,140},{31,147,139},{31,148,139},{31,149,139},{31,150,139},{30,151,138},
    {30,152,138},{30,153,138},{30,153,138},{30,154,137},{30,155,137},{30,156,137},{30,157,136},{30,158,136},
    {30,159,136},{30,160,135},{31,161,135},{31,162,134},{31,163,134},{32,164,133},{32,165,133},{33,166,133},
    {33,167,132},{34,167,132},{35,168,131},{35,169,130},{36,170,130},{37,171,129},{38,172,129},{39,173,128},
    {40,174,127},{41,175,127},{42,176,126},{43,177,125},{44,177,125},{46,178,124},{47,179,123},{48,180,122},
    {50,181,122},{51,182,121},{53,183,120},{54,184,119},{56,185,118},{57,185,118},{59,186,117},{61,187,116},
    {62,188,115},{64,189,114},{66,190,113},{68,190,112},{69,191,111},{71,192,110},{73,193,109},{75,194,108},
    {77,194,107},{79,195,105},{81,196,104},{83,197,103},{85,198,102},{87,198,101},{89,199,100},{91,200,98},
    {94,201,97},{96,201,96},{98,202,95},{100,203,93},{103,204,92},{105,204,91},{107,205,89},{109,206,88},
    {112,206,86},{114,207,85},{116,208,84},{119,208,82},{121,209,81},{124,210,79},{126,210,78},{129,211,76},
    {131,211,75},{134,212,73},{136,213,71},{139,213,70},{141,214,68},{144,214,67},{146,215,65},{149,215,63},
    {151,216,62},{154,216,60},{157,217,58},{159,217,56},{162,218,55},{165,218,53},{167,219,51},{170,219,50},
    {173,220,48},{175,220,46},{178,221,44},{181,221,43},{183,221,41},{186,222,39},{189,222,38},{191,223,36},
    {194,223,34},{197,223,33},{199,224,31},{202,224,30},{205,224,29},{207,225,28},{210,225,27},{212,225,26},
    {215,226,25},{218,226,24},{220,226,24},{223,227,24},{225,227,24},{228,227,24},{231,228,25},{233,228,25},
    {236,228,26},{238,229,27},{241,229,28},{243,229,30},{246,230,31},{248,230,33},{250,230,34},{253,231,36}};

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

// Pillow precompute_coeffs for the triangle filter (support 1.0): per
// output position, the source window [bound0, bound0+n) and normalized
// fixed-point weights.
void triangle_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                     std::vector<int>* kk, int* ksize_out) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->assign(out_size * 2, 0);
  std::vector<double> prekk(out_size * ksize, 0.0);
  for (int x = 0; x < out_size; x++) {
    double center = (x + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &prekk[x * ksize];
    for (int xx = 0; xx < xmax; xx++) {
      double arg = (xx + xmin - center + 0.5) * ss;
      double w = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (w < 0) w = 0;
      k[xx] = w;
      ww += w;
    }
    for (int xx = 0; xx < xmax; xx++) {
      if (ww != 0.0) k[xx] /= ww;
    }
    (*bounds)[x * 2] = xmin;
    (*bounds)[x * 2 + 1] = xmax;
  }
  kk->assign(out_size * ksize, 0);
  for (size_t i = 0; i < prekk.size(); i++) {
    double v = prekk[i] * (1 << kPrecisionBits);
    (*kk)[i] = static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
  }
  *ksize_out = ksize;
}

// Two-pass Pillow-style RGB8 resample: src [in_h, in_w, 3] -> dst
// [out_h, out_w, 3].  Horizontal first, uint8 intermediate.
void resample_rgb(const uint8_t* src, int in_h, int in_w, uint8_t* dst,
                  int out_h, int out_w) {
  if (in_h == out_h && in_w == out_w) {
    std::memcpy(dst, src, static_cast<size_t>(in_h) * in_w * 3);
    return;
  }
  std::vector<int> bounds, kk;
  int ksize;
  const uint8_t* hsrc = src;
  std::vector<uint8_t> tmp;
  int cur_w = in_w;
  if (in_w != out_w) {  // horizontal pass: [in_h, in_w] -> [in_h, out_w]
    triangle_coeffs(in_w, out_w, &bounds, &kk, &ksize);
    tmp.resize(static_cast<size_t>(in_h) * out_w * 3);
    for (int y = 0; y < in_h; y++) {
      const uint8_t* row = src + static_cast<size_t>(y) * in_w * 3;
      uint8_t* orow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
      for (int x = 0; x < out_w; x++) {
        int xmin = bounds[x * 2], xmax = bounds[x * 2 + 1];
        const int* k = &kk[x * ksize];
        int64_t s0 = 1 << (kPrecisionBits - 1);
        int64_t s1 = s0, s2 = s0;
        for (int xx = 0; xx < xmax; xx++) {
          const uint8_t* p = row + static_cast<size_t>(xmin + xx) * 3;
          s0 += static_cast<int64_t>(p[0]) * k[xx];
          s1 += static_cast<int64_t>(p[1]) * k[xx];
          s2 += static_cast<int64_t>(p[2]) * k[xx];
        }
        orow[x * 3] = clip8(s0);
        orow[x * 3 + 1] = clip8(s1);
        orow[x * 3 + 2] = clip8(s2);
      }
    }
    hsrc = tmp.data();
    cur_w = out_w;
  }
  if (in_h == out_h) {
    std::memcpy(dst, hsrc, static_cast<size_t>(out_h) * out_w * 3);
    return;
  }
  // vertical pass: [in_h, cur_w] -> [out_h, cur_w]
  triangle_coeffs(in_h, out_h, &bounds, &kk, &ksize);
  for (int y = 0; y < out_h; y++) {
    int ymin = bounds[y * 2], ymax = bounds[y * 2 + 1];
    const int* k = &kk[y * ksize];
    uint8_t* orow = dst + static_cast<size_t>(y) * cur_w * 3;
    for (int x = 0; x < cur_w * 3; x++) {
      int64_t ss = 1 << (kPrecisionBits - 1);
      for (int yy = 0; yy < ymax; yy++) {
        ss += static_cast<int64_t>(
                  hsrc[static_cast<size_t>(ymin + yy) * cur_w * 3 + x]) *
              k[yy];
      }
      orow[x] = clip8(ss);
    }
  }
}

// gray [h*w] -> rgb [h*w*3] per gray_mode (0 replicate, 1 viridis LUT —
// the reference applies the LUT BEFORE resizing, and so do we).
void gray_to_rgb(const uint8_t* gray, size_t n, int gray_mode, uint8_t* rgb) {
  if (gray_mode == 1) {
    for (size_t i = 0; i < n; i++) {
      const uint8_t* c = kViridis[gray[i]];
      rgb[i * 3] = c[0];
      rgb[i * 3 + 1] = c[1];
      rgb[i * 3 + 2] = c[2];
    }
  } else {
    for (size_t i = 0; i < n; i++) {
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = gray[i];
    }
  }
}

// ------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// decode JPEG bytes to RGB8; returns 0 ok, <0 error.  *out is malloc'd.
int decode_jpeg(const uint8_t* data, int64_t len, int gray_mode, int* h,
                int* w, std::vector<uint8_t>* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  bool gray = cinfo.num_components == 1;
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int H = cinfo.output_height, W = cinfo.output_width;
  int ch = cinfo.output_components;
  if ((gray && ch != 1) || (!gray && ch != 3) || H <= 0 || W <= 0) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  std::vector<uint8_t> raw(static_cast<size_t>(H) * W * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = raw.data() + static_cast<size_t>(cinfo.output_scanline) * W * ch;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *h = H;
  *w = W;
  if (gray) {
    out->resize(static_cast<size_t>(H) * W * 3);
    gray_to_rgb(raw.data(), static_cast<size_t>(H) * W, gray_mode,
                out->data());
  } else {
    *out = std::move(raw);
  }
  return 0;
}

// -------------------------------------------------------------- PNG ----
int decode_png(const uint8_t* data, int64_t len, int gray_mode, int* h,
               int* w, std::vector<uint8_t>* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data,
                                        static_cast<size_t>(len))) {
    return -2;
  }
  bool gray = (img.format & PNG_FORMAT_FLAG_COLOR) == 0;
  bool alpha = (img.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  // 16-bit files: the simplified API's 8-bit formats apply a
  // linear->sRGB transfer; read the LINEAR (16-bit) format instead and
  // scale arithmetically like skimage's img_as_ubyte
  bool lin16 = (img.format & PNG_FORMAT_FLAG_LINEAR) != 0;
  *h = img.height;
  *w = img.width;
  size_t n = static_cast<size_t>(img.height) * img.width;
  auto scale16 = [](uint16_t v) -> uint8_t {
    return static_cast<uint8_t>((static_cast<uint32_t>(v) * 255 + 32767) /
                                65535);
  };
  if (lin16 && alpha) {
    png_image_free(&img);
    return -3;  // 16-bit + alpha: rare; PIL fallback
  }
  if (gray && !alpha) {
    std::vector<uint8_t> raw(n);
    if (lin16) {
      img.format = PNG_FORMAT_LINEAR_Y;
      std::vector<uint16_t> raw16(n);
      if (!png_image_finish_read(&img, nullptr, raw16.data(), 0, nullptr)) {
        png_image_free(&img);
        return -2;
      }
      for (size_t i = 0; i < n; i++) raw[i] = scale16(raw16[i]);
    } else {
      img.format = PNG_FORMAT_GRAY;
      if (!png_image_finish_read(&img, nullptr, raw.data(), 0, nullptr)) {
        png_image_free(&img);
        return -2;
      }
    }
    out->resize(n * 3);
    gray_to_rgb(raw.data(), n, gray_mode, out->data());
  } else if (lin16) {
    img.format = PNG_FORMAT_LINEAR_RGB;
    std::vector<uint16_t> raw16(n * 3);
    if (!png_image_finish_read(&img, nullptr, raw16.data(), 0, nullptr)) {
      png_image_free(&img);
      return -2;
    }
    out->resize(n * 3);
    for (size_t i = 0; i < n * 3; i++) (*out)[i] = scale16(raw16[i]);
  } else if (alpha) {
    // libpng's RGB conversion COMPOSITES alpha onto a background;
    // PIL's convert("RGB") just drops it — read RGBA and strip A
    img.format = PNG_FORMAT_RGBA;
    std::vector<uint8_t> raw(n * 4);
    if (!png_image_finish_read(&img, nullptr, raw.data(), 0, nullptr)) {
      png_image_free(&img);
      return -2;
    }
    out->resize(n * 3);
    for (size_t i = 0; i < n; i++) {
      (*out)[i * 3] = raw[i * 4];
      (*out)[i * 3 + 1] = raw[i * 4 + 1];
      (*out)[i * 3 + 2] = raw[i * 4 + 2];
    }
  } else {
    img.format = PNG_FORMAT_RGB;
    out->resize(n * 3);
    if (!png_image_finish_read(&img, nullptr, out->data(), 0, nullptr)) {
      png_image_free(&img);
      return -2;
    }
  }
  return 0;
}

int sniff_and_decode(const uint8_t* data, int64_t len, int gray_mode, int* h,
                     int* w, std::vector<uint8_t>* rgb) {
  if (len < 8 || data == nullptr) return -1;
  if (data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg(data, len, gray_mode, h, w, rgb);
  }
  if (data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' && data[3] == 'G') {
    return decode_png(data, len, gray_mode, h, w, rgb);
  }
  return -4;  // unknown format -> Python falls back to PIL
}

}  // namespace

extern "C" {

// Decode one image and resample to [out_h, out_w, 3] uint8 RGB.
// gray_mode: 0 = replicate gray channel, 1 = viridis LUT (reference CC
// quirk, applied before resize).  Returns 0 ok, <0 error.
int cx_img_decode_resize(const uint8_t* data, int64_t len, int out_h,
                         int out_w, int gray_mode, uint8_t* out) {
  if (out_h <= 0 || out_w <= 0 || out == nullptr) return -1;
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  int rc = sniff_and_decode(data, len, gray_mode, &h, &w, &rgb);
  if (rc != 0) return rc;
  resample_rgb(rgb.data(), h, w, out, out_h, out_w);
  return 0;
}

// Probe dimensions without a full decode (full header parse only).
int cx_img_probe(const uint8_t* data, int64_t len, int* h, int* w) {
  if (len < 8 || data == nullptr) return -1;
  if (data[0] == 0xFF && data[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      return -2;
    }
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (data[0] == 0x89 && data[1] == 'P') {
    png_image img;
    std::memset(&img, 0, sizeof(img));
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, data,
                                          static_cast<size_t>(len))) {
      return -2;
    }
    *h = img.height;
    *w = img.width;
    png_image_free(&img);
    return 0;
  }
  return -4;
}

// Decode one image at native size into out [h*w*3] (call cx_img_probe
// first to size the buffer).
int cx_img_decode(const uint8_t* data, int64_t len, int gray_mode,
                  uint8_t* out) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  int rc = sniff_and_decode(data, len, gray_mode, &h, &w, &rgb);
  if (rc != 0) return rc;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

// Batch decode+resize across a thread pool.  statuses[i] <0 marks images
// the caller must fall back on; their output slots are zeroed.
int cx_img_decode_resize_batch(const uint8_t** datas, const int64_t* lens,
                               int count, int out_h, int out_w,
                               int gray_mode, uint8_t* out, int* statuses,
                               int nthreads) {
  if (count <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > count) nthreads = count;
  std::atomic<int> next(0);
  size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  auto work = [&]() {
    for (int i = next.fetch_add(1); i < count; i = next.fetch_add(1)) {
      int rc = cx_img_decode_resize(datas[i], lens[i], out_h, out_w,
                                    gray_mode, out + stride * i);
      statuses[i] = rc;
      if (rc != 0) std::memset(out + stride * i, 0, stride);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads - 1; t++) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
