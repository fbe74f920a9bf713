// C ABI around the qoi_oracle C++ codec, consumed from Python via ctypes
// (see qoi_tpu/oracle.py). Mirrors the reference's public API surface
// (/root/reference/qoi.h:278-289) in a flat-function form.

#include <cstdlib>
#include <cstring>

#include "qoi_oracle.hpp"

extern "C" {

// Encode: returns malloc'd buffer (caller frees via qo_free) or NULL.
uint8_t* qo_encode(const uint8_t* pixels, uint32_t width, uint32_t height,
                   uint8_t channels, uint8_t colorspace, size_t* out_len) {
  qoi_oracle::ImageDesc d{width, height, channels, colorspace};
  std::vector<uint8_t> enc = qoi_oracle::encode(pixels, d);
  if (enc.empty()) return nullptr;
  auto* buf = static_cast<uint8_t*>(std::malloc(enc.size()));
  if (!buf) return nullptr;
  std::memcpy(buf, enc.data(), enc.size());
  *out_len = enc.size();
  return buf;
}

// Decode: returns malloc'd pixel buffer or NULL; fills dims/channels.
uint8_t* qo_decode(const uint8_t* data, size_t size, int want_channels,
                   uint32_t* out_w, uint32_t* out_h, uint8_t* out_channels,
                   uint8_t* out_colorspace, size_t* out_len) {
  qoi_oracle::ImageDesc d;
  std::vector<uint8_t> px =
      qoi_oracle::decode(data, size, d, want_channels);
  if (px.empty()) return nullptr;
  auto* buf = static_cast<uint8_t*>(std::malloc(px.size()));
  if (!buf) return nullptr;
  std::memcpy(buf, px.data(), px.size());
  *out_w = d.width;
  *out_h = d.height;
  *out_channels = d.channels;
  *out_colorspace = d.colorspace;
  *out_len = px.size();
  return buf;
}

void qo_free(uint8_t* p) { std::free(p); }

}  // extern "C"
