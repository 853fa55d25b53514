// vlg_loader: native data-loading core for video_layout_generation_tpu.
//
// The reference leaned on OpenCV's C++ for PNG decode + resize in its
// DataLoader workers (reference src/folder.py:122-135); this is the
// framework-owned native equivalent: a minimal zlib-backed PNG decoder
// (8-bit gray / RGB / RGBA / palette, non-interlaced — the Cityscapes
// artifact formats), nearest and bilinear resize, and a persistent thread
// pool for batch decode. Exposed as a C ABI consumed via ctypes
// (video_layout_generation_tpu/io/native_loader.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC vlg_loader.cpp -lz)

#include <libdeflate.h>
#include <zlib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- PNG ----

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> pixels;  // row-major, interleaved
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  // libdeflate's one-shot zlib decompress is 2-3x zlib's streaming
  // inflate and the PNG raw size is known exactly up front. One cached
  // decompressor per pool thread.
  static thread_local libdeflate_decompressor* dec =
      libdeflate_alloc_decompressor();
  if (dec != nullptr) {
    size_t actual = 0;
    libdeflate_result r = libdeflate_zlib_decompress(
        dec, in.data(), in.size(), out.data(), out.size(), &actual);
    // match the zlib-path acceptance: a short stream (STREAM_END early)
    // and an over-long stream (output buffer filled) were both accepted
    return r == LIBDEFLATE_SUCCESS || r == LIBDEFLATE_INSUFFICIENT_SPACE;
  }
  z_stream zs;  // allocation-failure fallback
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

// Decode an 8-bit non-interlaced PNG. Returns false on any parse error.
// expand_palette=false keeps color-type-3 pixels as palette INDICES (what a
// label map stores); true expands to RGB (what an image load wants).
bool decode_png(const char* path, Image& img, bool expand_palette = true) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 57) { std::fclose(f); return false; }
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(buf.data(), sig, 8) != 0) return false;

  size_t pos = 8;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      img.w = static_cast<int>(be32(data));
      img.h = static_cast<int>(be32(data + 4));
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return false;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (img.w <= 0 || img.h <= 0 || idat.empty()) return false;

  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 3: ch = 1; break;  // palette index
    case 4: ch = 2; break;  // gray+alpha
    case 6: ch = 4; break;  // rgba
    default: return false;
  }
  const size_t stride = static_cast<size_t>(img.w) * ch;
  std::vector<uint8_t> raw((stride + 1) * img.h);
  if (!inflate_all(idat, raw)) return false;

  // unfilter into pixels. The filter switch is hoisted out of the byte
  // loop and the first bpp bytes (no left neighbor) are peeled, so each
  // filter runs as a tight branch-free loop the compiler can vectorize
  // (None/Up are pure memcpy/add; Sub/Avg/Paeth carry the serial left
  // dependency but lose the per-byte bounds tests).
  std::vector<uint8_t> out(stride * img.h);
  const size_t bpp = ch;
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &out[stride * y];
    const uint8_t* up = y ? &out[stride * (y - 1)] : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        std::memcpy(dst, src, bpp < stride ? bpp : stride);
        for (size_t x = bpp; x < stride; ++x)
          dst[x] = static_cast<uint8_t>(src[x] + dst[x - bpp]);
        break;
      case 2:  // Up
        if (up) {
          for (size_t x = 0; x < stride; ++x)
            dst[x] = static_cast<uint8_t>(src[x] + up[x]);
        } else {
          std::memcpy(dst, src, stride);
        }
        break;
      case 3:  // Average
        if (up) {
          for (size_t x = 0; x < bpp && x < stride; ++x)
            dst[x] = static_cast<uint8_t>(src[x] + up[x] / 2);
          for (size_t x = bpp; x < stride; ++x)
            dst[x] = static_cast<uint8_t>(src[x] +
                                          (dst[x - bpp] + up[x]) / 2);
        } else {
          std::memcpy(dst, src, bpp < stride ? bpp : stride);
          for (size_t x = bpp; x < stride; ++x)
            dst[x] = static_cast<uint8_t>(src[x] + dst[x - bpp] / 2);
        }
        break;
      case 4:  // Paeth
        if (up) {
          for (size_t x = 0; x < bpp && x < stride; ++x)
            dst[x] = static_cast<uint8_t>(src[x] + up[x]);  // paeth(0,b,0)=b
          for (size_t x = bpp; x < stride; ++x)
            dst[x] = static_cast<uint8_t>(
                src[x] + paeth(dst[x - bpp], up[x], up[x - bpp]));
        } else {
          std::memcpy(dst, src, bpp < stride ? bpp : stride);
          for (size_t x = bpp; x < stride; ++x)  // paeth(a,0,0)=a
            dst[x] = static_cast<uint8_t>(src[x] + dst[x - bpp]);
        }
        break;
      default:
        return false;
    }
  }

  if (color_type == 3 && expand_palette) {  // palette -> RGB
    if (palette.empty()) return false;
    std::vector<uint8_t> rgb(static_cast<size_t>(img.w) * img.h * 3);
    for (size_t i = 0; i < out.size(); ++i) {
      const uint8_t* p = &palette[3 * out[i]];
      rgb[3 * i] = p[0];
      rgb[3 * i + 1] = p[1];
      rgb[3 * i + 2] = p[2];
    }
    img.channels = 3;
    img.pixels = std::move(rgb);
  } else {
    img.channels = ch;
    img.pixels = std::move(out);
  }
  return true;
}

// ------------------------------------------------------------- resize ----

// Floor-nearest (cv2 INTER_NEAREST semantics) on the first channel only,
// emitting int32 class ids. Column source indices are precomputed once.
void resize_nearest_ids(const Image& img, int32_t* out, int oh, int ow) {
  const int ch = img.channels;
  if (oh == img.h && ow == img.w && ch == 1) {  // identity: pure widen
    const size_t n = static_cast<size_t>(oh) * ow;
    for (size_t i = 0; i < n; ++i) out[i] = img.pixels[i];
    return;
  }
  const double sy = static_cast<double>(img.h) / oh;
  const double sx = static_cast<double>(img.w) / ow;
  std::vector<int> xoff(ow);
  for (int x = 0; x < ow; ++x)
    xoff[x] = std::min(static_cast<int>(x * sx), img.w - 1) * ch;
  for (int y = 0; y < oh; ++y) {
    int src_y = std::min(static_cast<int>(y * sy), img.h - 1);
    const uint8_t* row =
        &img.pixels[static_cast<size_t>(src_y) * img.w * ch];
    int32_t* o = &out[static_cast<size_t>(y) * ow];
    for (int x = 0; x < ow; ++x) o[x] = row[xoff[x]];
  }
}

// Half-pixel bilinear (cv2 INTER_LINEAR semantics) to float [0,1] RGB HWC.
// The x-axis sample positions/weights are precomputed once per call (they
// were previously recomputed in double for every pixel of every row), and
// the identity size gets a pure uint8->float conversion fast path — the
// production Cityscapes artifacts are pre-sized on disk, so that path is
// the common one (SURVEY.md §3.4).
void resize_bilinear_rgb(const Image& img, float* out, int oh, int ow) {
  const int ch = img.channels;
  const float inv255 = 1.0f / 255.0f;
  if (oh == img.h && ow == img.w) {  // identity: convert only
    const size_t n = static_cast<size_t>(oh) * ow;
    if (ch == 3) {
      const uint8_t* p = img.pixels.data();
      for (size_t i = 0; i < n * 3; ++i) out[i] = p[i] * inv255;
    } else {
      for (size_t i = 0; i < n; ++i) {
        // <3 channels means gray(+alpha): replicate the gray channel,
        // never the alpha; 4 channels drops alpha
        const uint8_t* p = &img.pixels[i * ch];
        float r = p[0] * inv255;
        float g = (ch >= 3 ? p[1] : p[0]) * inv255;
        float b = (ch >= 3 ? p[2] : p[0]) * inv255;
        out[i * 3] = r;
        out[i * 3 + 1] = g;
        out[i * 3 + 2] = b;
      }
    }
    return;
  }
  const double sy = static_cast<double>(img.h) / oh;
  const double sx = static_cast<double>(img.w) / ow;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> wxs(ow);
  for (int x = 0; x < ow; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    if (fx < 0) fx = 0;
    if (fx > img.w - 1) fx = img.w - 1;
    int x0 = static_cast<int>(fx);
    x0s[x] = x0 * ch;
    x1s[x] = std::min(x0 + 1, img.w - 1) * ch;
    wxs[x] = static_cast<float>(fx - x0);
  }
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    if (fy > img.h - 1) fy = img.h - 1;
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, img.h - 1);
    float wy = static_cast<float>(fy - y0);
    const uint8_t* r0 = &img.pixels[static_cast<size_t>(y0) * img.w * ch];
    const uint8_t* r1 = &img.pixels[static_cast<size_t>(y1) * img.w * ch];
    float* orow = &out[static_cast<size_t>(y) * ow * 3];
    for (int x = 0; x < ow; ++x) {
      const int x0 = x0s[x], x1 = x1s[x];
      const float wx = wxs[x];
      float* o = &orow[x * 3];
      for (int c = 0; c < 3; ++c) {
        int cc = (ch >= 3) ? c : 0;
        float v00 = r0[x0 + cc], v01 = r0[x1 + cc];
        float v10 = r1[x0 + cc], v11 = r1[x1 + cc];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        o[c] = (top + (bot - top) * wy) * inv255;
      }
    }
  }
}

// ------------------------------------------------------------- encode ----

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(uint8_t(x >> 24));
  v.push_back(uint8_t(x >> 16));
  v.push_back(uint8_t(x >> 8));
  v.push_back(uint8_t(x));
}

void put_chunk(std::vector<uint8_t>& v, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(v, static_cast<uint32_t>(len));
  size_t start = v.size();
  v.insert(v.end(), type, type + 4);
  if (len) v.insert(v.end(), data, data + len);
  uint32_t crc = static_cast<uint32_t>(
      crc32(0L, v.data() + start, static_cast<uInt>(4 + len)));
  put_be32(v, crc);
}

// Encode 8-bit RGB (or gray, channels=1) rows to a PNG file. Filter 0
// rows + libdeflate zlib compress — the writer for the colorized eval
// export (reference src/val.py:172-187 saved per-image PNGs via cv2).
bool encode_png(const char* path, const uint8_t* pix, int h, int w,
                int channels, int level) {
  const size_t stride = static_cast<size_t>(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = &raw[(stride + 1) * y];
    dst[0] = 0;  // filter: None
    std::memcpy(dst + 1, pix + stride * y, stride);
  }
  static thread_local libdeflate_compressor* comp = nullptr;
  static thread_local int comp_level = -1;
  if (comp == nullptr || comp_level != level) {
    if (comp) libdeflate_free_compressor(comp);
    comp = libdeflate_alloc_compressor(level);
    comp_level = level;
  }
  if (comp == nullptr) return false;
  std::vector<uint8_t> zdata(
      libdeflate_zlib_compress_bound(comp, raw.size()));
  size_t zlen = libdeflate_zlib_compress(comp, raw.data(), raw.size(),
                                         zdata.data(), zdata.size());
  if (zlen == 0) return false;

  std::vector<uint8_t> out;
  out.reserve(zlen + 128);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(uint32_t(w) >> 24);
  ihdr[1] = uint8_t(uint32_t(w) >> 16);
  ihdr[2] = uint8_t(uint32_t(w) >> 8);
  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(uint32_t(h) >> 24);
  ihdr[5] = uint8_t(uint32_t(h) >> 16);
  ihdr[6] = uint8_t(uint32_t(h) >> 8);
  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;                                // bit depth
  ihdr[9] = channels == 1 ? 0 : 2;            // gray | truecolor
  ihdr[10] = ihdr[11] = ihdr[12] = 0;         // deflate/adaptive/none
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", zdata.data(), zlen);
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return n == out.size();
}

// -------------------------------------------------------- thread pool ----

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { loop(); });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

}  // namespace

// ----------------------------------------------------------- C ABI ------

extern "C" {

// Single-image loads. Return 0 on success, nonzero on failure.
int vlg_load_rgb(const char* path, float* out, int out_h, int out_w) {
  Image img;
  if (!decode_png(path, img)) return 1;
  resize_bilinear_rgb(img, out, out_h, out_w);
  return 0;
}

int vlg_load_gray_ids(const char* path, int32_t* out, int out_h, int out_w) {
  Image img;
  // class-id maps: palette PNGs store the id as the palette index
  if (!decode_png(path, img, /*expand_palette=*/false)) return 1;
  resize_nearest_ids(img, out, out_h, out_w);
  return 0;
}

// Save 8-bit pixels as PNG; channels 1 (gray) or 3 (RGB). level is the
// deflate level (1 fastest .. 12 best; 6 is a good default). Returns 0 on
// success.
int vlg_save_png(const char* path, const uint8_t* pix, int h, int w,
                 int channels, int level) {
  if ((channels != 1 && channels != 3) || h <= 0 || w <= 0) return 1;
  return encode_png(path, pix, h, w, channels,
                    level > 0 ? level : 6) ? 0 : 1;
}

// Persistent pool ------------------------------------------------------
void* vlg_pool_create(int n_threads) {
  return new ThreadPool(n_threads > 0 ? n_threads : 1);
}

void vlg_pool_destroy(void* pool) { delete static_cast<ThreadPool*>(pool); }

// Batch decode: n images into a contiguous NHWC buffer. paths is an array
// of n C strings; kind 0 = rgb float, 1 = gray int32. Blocks until done;
// returns the number of failures.
int vlg_pool_load_batch(void* pool, const char** paths, int n, int kind,
                        void* out, int out_h, int out_w) {
  ThreadPool* tp = static_cast<ThreadPool*>(pool);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    tp->submit([&, i] {
      int rc;
      if (kind == 0) {
        float* dst = static_cast<float*>(out) +
                     static_cast<size_t>(i) * out_h * out_w * 3;
        rc = vlg_load_rgb(paths[i], dst, out_h, out_w);
      } else {
        int32_t* dst = static_cast<int32_t*>(out) +
                       static_cast<size_t>(i) * out_h * out_w;
        rc = vlg_load_gray_ids(paths[i], dst, out_h, out_w);
      }
      if (rc) failures.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // extern "C"
