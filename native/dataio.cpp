// Native data-IO for object_intrinsics_tpu: PNG decode + bilinear resize.
//
// The reference's data layer leans on OpenCV (src/utils/preprocess.py:5-20
// cv2.imread/cvtColor/resize). This standalone C++ library removes that
// dependency: a zlib-based PNG decoder (8-bit RGB/RGBA/gray/gray+alpha,
// non-interlaced — covers the dataset format) and a bilinear resizer with
// OpenCV's pixel-center convention. Exposed through a C ABI and loaded from
// Python via ctypes (object_intrinsics_tpu/data/native_io.py); pure-Python
// fallbacks remain for portability.
//
// Build: make -C native   (g++ -O2 -shared -fPIC dataio.cpp -lz)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>
#include <zlib.h>

namespace {

uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Inflate the concatenated IDAT stream.
bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  const size_t chunk = 1 << 18;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    size_t old = out.size();
    out.resize(old + chunk);
    zs.next_out = out.data() + old;
    zs.avail_out = chunk;
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.resize(old + (chunk - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

}  // namespace

extern "C" {

// Parse header only: returns 0 on success, fills width/height/channels.
int png_info(const uint8_t* data, long len, int* width, int* height, int* channels) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 33 || std::memcmp(data, magic, 8) != 0) return -1;
  const uint8_t* p = data + 8;
  if (read_be32(p + 4) != 0x49484452u /*IHDR*/) return -2;
  *width = static_cast<int>(read_be32(p + 8));
  *height = static_cast<int>(read_be32(p + 12));
  int bit_depth = p[16], color_type = p[17], interlace = p[20];
  if (bit_depth != 8 || interlace != 0) return -3;
  switch (color_type) {
    case 0: *channels = 1; break;  // gray
    case 2: *channels = 3; break;  // rgb
    case 4: *channels = 2; break;  // gray+alpha
    case 6: *channels = 4; break;  // rgba
    default: return -4;            // palette unsupported
  }
  return 0;
}

// Decode into caller-allocated out (height*width*channels bytes). 0 on success.
int png_decode(const uint8_t* data, long len, uint8_t* out) {
  int w, h, c;
  int rc = png_info(data, len, &w, &h, &c);
  if (rc != 0) return rc;

  // gather IDAT
  std::vector<uint8_t> idat;
  const uint8_t* p = data + 8;
  const uint8_t* end = data + len;
  while (p + 12 <= end) {
    uint32_t clen = read_be32(p);
    uint32_t ctype = read_be32(p + 4);
    const uint8_t* payload = p + 8;
    if (payload + clen + 4 > end) return -5;
    if (ctype == 0x49444154u /*IDAT*/) idat.insert(idat.end(), payload, payload + clen);
    if (ctype == 0x49454E44u /*IEND*/) break;
    p = payload + clen + 4;
  }
  if (idat.empty()) return -6;

  std::vector<uint8_t> raw;
  raw.reserve(static_cast<size_t>(h) * (static_cast<size_t>(w) * c + 1));
  if (!inflate_all(idat, raw)) return -7;
  const size_t stride = static_cast<size_t>(w) * c;
  if (raw.size() < static_cast<size_t>(h) * (stride + 1)) return -8;

  // undo per-scanline filters
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + static_cast<size_t>(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* line = src + 1;
    uint8_t* dst = out + static_cast<size_t>(y) * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= static_cast<size_t>(c) ? dst[x - c] : 0;     // left
      int b = prev[x];                                           // up
      int cc = x >= static_cast<size_t>(c) ? prev[x - c] : 0;   // up-left
      int v = line[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, cc); break;
        default: return -9;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
    std::memcpy(prev.data(), dst, stride);
  }
  return 0;
}

// Bilinear resize, OpenCV pixel-center convention (src = (dst+0.5)*scale-0.5).
void resize_bilinear_u8(const uint8_t* in, int ih, int iw, int c,
                        uint8_t* out, int oh, int ow) {
  const double sy = static_cast<double>(ih) / oh;
  const double sx = static_cast<double>(iw) / ow;
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    double wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= ih ? ih - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= ih ? ih - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = static_cast<int>(std::floor(fx));
      double wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= iw ? iw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= iw ? iw - 1 : x0 + 1);
      for (int k = 0; k < c; ++k) {
        double v00 = in[(static_cast<size_t>(y0c) * iw + x0c) * c + k];
        double v01 = in[(static_cast<size_t>(y0c) * iw + x1c) * c + k];
        double v10 = in[(static_cast<size_t>(y1c) * iw + x0c) * c + k];
        double v11 = in[(static_cast<size_t>(y1c) * iw + x1c) * c + k];
        double top = v00 * (1 - wx) + v01 * wx;
        double bot = v10 * (1 - wx) + v11 * wx;
        double v = top * (1 - wy) + bot * wy;
        out[(static_cast<size_t>(y) * ow + x) * c + k] =
            static_cast<uint8_t>(v + 0.5 < 0 ? 0 : (v + 0.5 > 255 ? 255 : v + 0.5));
      }
    }
  }
}

}  // extern "C"
