// linemod_tpu native runtime: PNG decoding + prefetching RGB-D frame loader.
//
// The reference's IO layer is C++ (OpenCV imread / VideoCapture,
// detector.cpp:12-25, and the .dpt loader at src/utility.cpp:99-127); this is
// the TPU framework's native equivalent: a small C library (zlib only) that
// decodes the benchmark's PNG formats (8-bit truecolor and 16-bit grayscale)
// and runs a double-buffered background prefetch thread so the host never
// stalls on image decode between device steps. Exposed through a plain C ABI
// for ctypes (no pybind11 in this toolchain).
//
// Build: make -C native   (produces liblinemod_native.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t channels = 0;  // 1 or 3
  uint32_t bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major; 16-bit stored native-endian u16
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  std::vector<uint8_t> buf(1 << 20);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a non-interlaced PNG of color type 0 (gray) or 2 (truecolor),
// bit depth 8 or 16. Returns false on anything else.
bool decode_png(const uint8_t* bytes, size_t size, Image* img) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || std::memcmp(bytes, kSig, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  uint32_t width = 0, height = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
  while (pos + 8 <= size) {
    uint32_t len = be32(bytes + pos);
    const char* type = reinterpret_cast<const char*>(bytes + pos + 4);
    const uint8_t* payload = bytes + pos + 8;
    if (pos + 12 + len > size) return false;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      width = be32(payload);
      height = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || interlace != 0) return false;
  if (color_type != 0 && color_type != 2) return false;
  if (bit_depth != 8 && bit_depth != 16) return false;
  uint32_t channels = (color_type == 2) ? 3 : 1;
  uint32_t bpp = channels * bit_depth / 8;  // bytes per pixel
  size_t stride = size_t(width) * bpp;

  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * height);
  if (!inflate_all(idat, raw)) return false;
  if (raw.size() < (stride + 1) * height) return false;

  img->width = width;
  img->height = height;
  img->channels = channels;
  img->bit_depth = bit_depth;
  img->data.assign(stride * height, 0);

  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img->data.data() + y * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = (x >= bpp) ? dst[x - bpp] : 0;
      int b = prev[x];
      int c = (x >= bpp) ? prev[x - bpp] : 0;
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
    std::memcpy(prev.data(), dst, stride);
  }
  // 16-bit PNGs are big-endian; convert to native u16
  if (bit_depth == 16) {
    for (size_t i = 0; i + 1 < img->data.size(); i += 2) {
      uint16_t v = (uint16_t(img->data[i]) << 8) | img->data[i + 1];
      std::memcpy(&img->data[i], &v, 2);
    }
  }
  return true;
}

bool load_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(size_t(n));
  bool ok = std::fread(out->data(), 1, size_t(n), f) == size_t(n);
  std::fclose(f);
  return ok;
}

std::string format_path(const std::string& tpl, int i) {
  char buf[1024];
  if (tpl.find('%') != std::string::npos) {
    std::snprintf(buf, sizeof(buf), tpl.c_str(), i);
    return buf;
  }
  return tpl;
}

struct Frame {
  Image color;
  Image depth;
  int index = -1;
  bool ok = false;
};

// Double-buffered prefetching sequence loader.
struct Loader {
  std::string img_tpl, depth_tpl;
  int next_index = 0;
  Frame slots[2];
  int ready_slot = -1;
  bool eof = false;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};
  bool want_next = true;

  static bool load_frame(const std::string& img_tpl, const std::string& depth_tpl,
                         int i, Frame* f) {
    std::vector<uint8_t> buf;
    f->index = i;
    f->ok = false;
    if (!load_file(format_path(img_tpl, i), &buf)) return false;
    if (!decode_png(buf.data(), buf.size(), &f->color)) return false;
    buf.clear();
    if (!load_file(format_path(depth_tpl, i), &buf)) return false;
    if (!decode_png(buf.data(), buf.size(), &f->depth)) return false;
    f->ok = true;
    return true;
  }

  void run() {
    int slot = 0;
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] { return want_next || stop.load(); });
      if (stop.load()) break;
      want_next = false;
      int idx = next_index++;
      lk.unlock();
      Frame f;
      bool ok = load_frame(img_tpl, depth_tpl, idx, &f);
      lk.lock();
      slots[slot] = std::move(f);
      ready_slot = ok ? slot : -1;
      eof = !ok;
      slot ^= 1;
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// ---- single-image API ----------------------------------------------------

// Decode a PNG file. Fills metadata; if data != nullptr copies pixel bytes
// (row-major; 16-bit as native u16). Returns byte count or -1.
long linemod_decode_png(const char* path, int* width, int* height, int* channels,
                        int* bit_depth, uint8_t* data) {
  std::vector<uint8_t> buf;
  Image img;
  if (!load_file(path, &buf) || !decode_png(buf.data(), buf.size(), &img)) {
    return -1;
  }
  *width = int(img.width);
  *height = int(img.height);
  *channels = int(img.channels);
  *bit_depth = int(img.bit_depth);
  if (data != nullptr) {
    std::memcpy(data, img.data.data(), img.data.size());
  }
  return long(img.data.size());
}

// ---- prefetching sequence loader ----------------------------------------

void* linemod_loader_open(const char* img_tpl, const char* depth_tpl) {
  auto* l = new Loader();
  l->img_tpl = img_tpl;
  l->depth_tpl = depth_tpl;
  l->want_next = true;
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// Wait for the next prefetched frame. Returns the frame index (>=0), or -1 at
// end of sequence. color: H*W*3 bytes (RGB as stored); depth: H*W u16.
int linemod_loader_next(void* handle, uint8_t* color, uint16_t* depth,
                        int* width, int* height) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv.wait(lk, [&] { return l->ready_slot >= 0 || l->eof; });
  if (l->ready_slot < 0) return -1;
  Frame& f = l->slots[l->ready_slot];
  l->ready_slot = -1;
  int idx = f.index;
  *width = int(f.color.width);
  *height = int(f.color.height);
  std::memcpy(color, f.color.data.data(), f.color.data.size());
  std::memcpy(depth, f.depth.data.data(), f.depth.data.size());
  // kick off the next prefetch before returning
  l->want_next = true;
  l->cv.notify_all();
  return idx;
}

void linemod_loader_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

}  // extern "C"
