// Native 16-bit grayscale PNG decoder for the host input pipeline.
//
// The TPU-native stand-in for the reference's CPU DataLoader workers
// (scripts/phase5_big_run.py:1577-1587): Python threads call decode via
// ctypes with the GIL released, so PNG inflate + unfilter runs truly in
// parallel. Scope: non-interlaced 8/16-bit grayscale (color type 0) — the
// only format the preprocessing stage emits (uint16 = HU + 32768) — with a
// graceful error return so callers can fall back to PIL for anything else.
//
// Build: g++ -O3 -fPIC -shared -o libdinoxpng.so png16.cc -lz

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint8_t kPngMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Error codes
enum {
  PNG16_OK = 0,
  PNG16_BAD_MAGIC = -1,
  PNG16_UNSUPPORTED = -2,   // interlaced / color / bit depth we don't handle
  PNG16_CORRUPT = -3,       // structure or zlib failure
  PNG16_TOO_SMALL = -4,     // output buffer too small
};

// CT slices are <= 1024 px; 1<<16 leaves generous headroom while keeping
// width*height and (stride+1)*height well inside int64/size_t range.
static const uint32_t kMaxDim = 1u << 16;

// Parse header only: fills width/height/bit_depth. Returns PNG16_* code.
int png16_header(const uint8_t* data, int64_t size, uint32_t* width,
                 uint32_t* height, uint32_t* bit_depth) {
  if (size < 33 || std::memcmp(data, kPngMagic, 8) != 0) return PNG16_BAD_MAGIC;
  // First chunk must be IHDR at offset 8.
  if (be32(data + 8) != 13 || std::memcmp(data + 12, "IHDR", 4) != 0)
    return PNG16_CORRUPT;
  const uint8_t* ihdr = data + 16;
  *width = be32(ihdr);
  *height = be32(ihdr + 4);
  *bit_depth = ihdr[8];
  uint8_t color_type = ihdr[9];
  uint8_t interlace = ihdr[12];
  if (color_type != 0 || (*bit_depth != 8 && *bit_depth != 16) || interlace != 0)
    return PNG16_UNSUPPORTED;
  // Reject adversarial dims: keeps all later size arithmetic far from
  // int64/size_t overflow and bounds the decode allocation (<= ~8 GiB raw).
  if (*width == 0 || *height == 0 || *width > kMaxDim || *height > kMaxDim)
    return PNG16_UNSUPPORTED;
  return PNG16_OK;
}

static int png16_decode_impl(const uint8_t* data, int64_t size, uint16_t* out,
                             int64_t out_capacity) {
  uint32_t w, h, depth;
  int rc = png16_header(data, size, &w, &h, &depth);
  if (rc != PNG16_OK) return rc;
  if (int64_t(w) * h > out_capacity) return PNG16_TOO_SMALL;

  // Concatenate IDAT payloads.
  std::vector<uint8_t> idat;
  int64_t pos = 8;
  while (pos + 12 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    if (pos + 12 + int64_t(len) > size) return PNG16_CORRUPT;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data + pos + 8, data + pos + 8 + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (idat.empty()) return PNG16_CORRUPT;

  const int bpp = depth / 8;                    // bytes per pixel
  const size_t stride = size_t(w) * bpp;        // filtered row payload
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return PNG16_CORRUPT;

  // Un-filter in place row by row.
  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    for (size_t i = 0; i < stride; ++i) {
      int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
      int b = prev[i];
      int c = i >= size_t(bpp) ? prev[i - bpp] : 0;
      int x = src[i];
      switch (filter) {
        case 0: cur[i] = uint8_t(x); break;
        case 1: cur[i] = uint8_t(x + a); break;
        case 2: cur[i] = uint8_t(x + b); break;
        case 3: cur[i] = uint8_t(x + ((a + b) >> 1)); break;
        case 4: cur[i] = uint8_t(x + paeth(a, b, c)); break;
        default: return PNG16_CORRUPT;
      }
    }
    uint16_t* dst = out + size_t(y) * w;
    if (depth == 16) {
      for (uint32_t x = 0; x < w; ++x)
        dst[x] = uint16_t((cur[2 * x] << 8) | cur[2 * x + 1]);  // PNG is BE
    } else {
      for (uint32_t x = 0; x < w; ++x) dst[x] = cur[x];
    }
    prev.swap(cur);
  }
  return PNG16_OK;
}

// Decode a grayscale PNG into out (row-major uint16, host endianness).
// out must hold width*height uint16s. 8-bit sources are widened.
// Exceptions (e.g. bad_alloc on a hostile size) must not cross the
// extern "C"/ctypes boundary — map them to PNG16_CORRUPT.
int png16_decode(const uint8_t* data, int64_t size, uint16_t* out,
                 int64_t out_capacity) {
  try {
    return png16_decode_impl(data, size, out, out_capacity);
  } catch (...) {
    return PNG16_CORRUPT;
  }
}

}  // extern "C"
