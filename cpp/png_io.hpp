// png_io — shared libpng helpers for the native tools.
//
// File load/save used by qoiconv-cpp, plus in-memory encode/decode used by
// qoibench-cpp as its comparison codec (the reference bench does the same
// with custom read/write callbacks, qoibench.c:95-251). Decode normalises
// to 8-bit RGB/RGBA exactly like the reference's loaders
// (qoibench.c:208-232, qoiconv.c:51-56).
#pragma once

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace png_io {

inline void apply_normalisation(png_structp png, png_infop info,
                                int& channels) {
  png_set_strip_16(png);
  png_set_packing(png);
  const int ct = png_get_color_type(png, info);
  if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ct == PNG_COLOR_TYPE_GRAY || ct == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);
  channels = png_get_channels(png, info);
  // Anything that is not exactly 3-channel becomes RGBA (qoiconv.c:51-56).
  if (channels != 3) {
    if (!(ct & PNG_COLOR_MASK_ALPHA) &&
        !png_get_valid(png, info, PNG_INFO_tRNS))
      png_set_filler(png, 0xff, PNG_FILLER_AFTER);
    channels = 4;
  }
}

inline bool load_file(const char* path, std::vector<uint8_t>& pixels,
                      uint32_t& w, uint32_t& h, int& channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  apply_normalisation(png, info, channels);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  pixels.resize(size_t(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y)
    rows[y] = pixels.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

inline bool save_file(const char* path, const uint8_t* pixels, uint32_t w,
                      uint32_t h, int channels) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8,
               channels == 4 ? PNG_COLOR_TYPE_RGBA : PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(pixels + size_t(y) * w * channels);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return true;
}

// ---- in-memory codec (benchmark comparison columns) -----------------------

namespace detail {
struct ReadCursor {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

inline void mem_read(png_structp png, png_bytep out, png_size_t n) {
  auto* c = static_cast<ReadCursor*>(png_get_io_ptr(png));
  if (c->pos + n > c->size) png_error(png, "short read");
  std::memcpy(out, c->data + c->pos, n);
  c->pos += n;
}

inline void mem_write(png_structp png, png_bytep data, png_size_t n) {
  auto* v = static_cast<std::vector<uint8_t>*>(png_get_io_ptr(png));
  v->insert(v->end(), data, data + n);
}

inline void mem_flush(png_structp) {}
}  // namespace detail

inline bool decode_mem(const uint8_t* data, size_t size,
                       std::vector<uint8_t>& pixels, uint32_t& w, uint32_t& h,
                       int& channels) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  detail::ReadCursor cur{data, size, 0};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_set_read_fn(png, &cur, detail::mem_read);
  png_read_info(png, info);
  apply_normalisation(png, info, channels);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  pixels.resize(size_t(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y)
    rows[y] = pixels.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

inline bool encode_mem(const uint8_t* pixels, uint32_t w, uint32_t h,
                       int channels, std::vector<uint8_t>& out) {
  out.clear();
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return false;
  }
  png_set_write_fn(png, &out, detail::mem_write, detail::mem_flush);
  png_set_IHDR(png, info, w, h, 8,
               channels == 4 ? PNG_COLOR_TYPE_RGBA : PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(pixels + size_t(y) * w * channels);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  return true;
}

}  // namespace png_io
