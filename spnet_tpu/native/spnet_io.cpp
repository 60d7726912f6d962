// spnet_io: native data-loading pipeline for spnet_tpu.
//
// TPU-native replacement for the reference's Python multiprocessing +
// shared-ctypes image reader (/root/reference/spnet/utils.py:323-421):
// a C++ thread pool decodes PNG frames (zlib inflate + per-row
// unfiltering), box-resizes them to the model input resolution, and
// writes Inception-scaled float32 pixels straight into the caller's
// pinned output buffer — one pass, no Python object churn, no process
// forks.  Exposed to Python via a plain C ABI consumed with ctypes
// (spnet_tpu/native/io.py).
//
// Supported PNG subset (everything the SPNet data contract produces):
// 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced.  Color
// sources keep channel 0, matching the reference's grayscale path
// (utils.py:346).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> pix;  // row-major, interleaved
};

uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Returns false on any parse error.
bool decode_png(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != size_t(sz)) {
    fclose(f);
    return false;
  }
  fclose(f);

  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (sz < 8 || memcmp(buf.data(), kSig, 8) != 0) return false;

  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= size_t(sz)) {
    uint32_t len = read_be32(&buf[pos]);
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > size_t(sz)) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;  // truncated IHDR: fields below read 13 bytes
      w = read_be32(data);
      h = read_be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w <= 0 || h <= 0 || bit_depth != 8 || interlace != 0) return false;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // grey
    case 2: ch = 3; break;  // RGB
    case 4: ch = 2; break;  // grey + alpha
    case 6: ch = 4; break;  // RGBA
    default: return false;   // (palette unsupported)
  }

  const size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  out->w = w;
  out->h = h;
  out->channels = ch;
  out->pix.resize(stride * h);
  const int bpp = ch;  // bytes per pixel (8-bit)
  for (int y = 0; y < h; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &out->pix[stride * y];
    const uint8_t* up = y > 0 ? &out->pix[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }
  return true;
}

// Separable box resample of channel 0 into float32 [-1, 1].
void resize_norm(const Image& img, int size, float* out) {
  const int w = img.w, h = img.h, ch = img.channels;
  const double sx = double(w) / size, sy = double(h) / size;
  std::vector<float> rowbuf(size_t(h) * size);  // horizontal pass

  for (int y = 0; y < h; ++y) {
    const uint8_t* src = &img.pix[size_t(y) * w * ch];
    for (int x = 0; x < size; ++x) {
      double x0 = x * sx, x1 = (x + 1) * sx;
      int ix0 = int(x0), ix1 = int(x1);
      if (ix1 >= w) ix1 = w - 1;
      double acc = 0.0, wsum = 0.0;
      for (int i = ix0; i <= ix1; ++i) {
        double cov = std::min<double>(x1, i + 1) - std::max<double>(x0, i);
        if (cov <= 0) cov = (ix0 == ix1) ? 1.0 : 0.0;
        acc += src[size_t(i) * ch] * cov;
        wsum += cov;
      }
      rowbuf[size_t(y) * size + x] = float(acc / (wsum > 0 ? wsum : 1));
    }
  }
  for (int x = 0; x < size; ++x) {
    for (int y = 0; y < size; ++y) {
      double y0 = y * sy, y1 = (y + 1) * sy;
      int iy0 = int(y0), iy1 = int(y1);
      if (iy1 >= h) iy1 = h - 1;
      double acc = 0.0, wsum = 0.0;
      for (int i = iy0; i <= iy1; ++i) {
        double cov = std::min<double>(y1, i + 1) - std::max<double>(y0, i);
        if (cov <= 0) cov = (iy0 == iy1) ? 1.0 : 0.0;
        acc += rowbuf[size_t(i) * size + x] * cov;
        wsum += cov;
      }
      float v = float(acc / (wsum > 0 ? wsum : 1));
      // Inception scaling (reference utils.py:340-342)
      out[size_t(y) * size + x] = (v / 255.0f - 0.5f) * 2.0f;
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize + normalize n images into out (n * size * size floats).
// size <= 0 keeps native resolution (all images must share it; the first
// image defines it).  Returns the number of successfully loaded images;
// failed slots are zero-filled and, when `status` is non-null, marked 0
// in status[i] (1 = decoded) so the caller can retry them elsewhere.
int spnet_load_images_status(const char** paths, int n, int size, float* out,
                             int n_threads, uint8_t* status) {
  if (n <= 0) return 0;
  if (status) memset(status, 0, n);
  std::atomic<int> next(0), ok(0);
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = 1;
  if (n_threads > n) n_threads = n;

  // resolve native resolution from the first image when size <= 0
  int out_size = size;
  int native_w = 0, native_h = 0;
  if (size <= 0) {
    Image img;
    if (!decode_png(paths[0], &img)) return 0;
    native_w = img.w;
    native_h = img.h;
  }

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img;
      bool good = decode_png(paths[i], &img);
      if (size > 0) {
        float* dst = out + size_t(i) * out_size * out_size;
        if (good) {
          resize_norm(img, out_size, dst);
          ok.fetch_add(1);
          if (status) status[i] = 1;
        } else {
          memset(dst, 0, sizeof(float) * out_size * out_size);
        }
      } else {
        float* dst = out + size_t(i) * native_w * native_h;
        if (good && img.w == native_w && img.h == native_h) {
          for (int p = 0; p < native_w * native_h; ++p) {
            dst[p] = (img.pix[size_t(p) * img.channels] / 255.0f - 0.5f)
                     * 2.0f;
          }
          ok.fetch_add(1);
          if (status) status[i] = 1;
        } else {
          memset(dst, 0, sizeof(float) * native_w * native_h);
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Back-compat ABI without per-file status.
int spnet_load_images(const char** paths, int n, int size, float* out,
                      int n_threads) {
  return spnet_load_images_status(paths, n, size, out, n_threads, nullptr);
}

// Probe the dimensions of one PNG.  Returns 0 on success.
int spnet_png_dims(const char* path, int* w, int* h) {
  Image img;
  if (!decode_png(path, &img)) return 1;
  *w = img.w;
  *h = img.h;
  return 0;
}

}  // extern "C"
