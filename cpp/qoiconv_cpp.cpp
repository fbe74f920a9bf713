// qoiconv-cpp — native PNG <-> QOI converter (reference tool equivalent:
// /root/reference/qoiconv.c). Uses libpng directly instead of stb_image.
//
// Usage: qoiconv-cpp <infile> <outfile>   (.png / .qoi by suffix)

#include <png.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "qoi_oracle.hpp"

namespace {

bool has_suffix(const std::string& s, const char* suf) {
  const size_t n = std::strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

// Load a PNG normalised to 8-bit RGB or RGBA (like the reference bench's
// libpng_decode normalisation, qoibench.c:208-232).
bool load_png(const char* path, std::vector<uint8_t>& pixels, uint32_t& w,
              uint32_t& h, int& channels) {
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

  png_set_strip_16(png);
  png_set_packing(png);
  const int ct = png_get_color_type(png, info);
  if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ct == PNG_COLOR_TYPE_GRAY || ct == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  channels = png_get_channels(png, info);
  // The reference converter forces anything that is not exactly 3-channel
  // to RGBA (qoiconv.c:51-56); match that so outputs agree byte-for-byte.
  if (channels != 3) {
    if (!(ct & PNG_COLOR_MASK_ALPHA) &&
        !png_get_valid(png, info, PNG_INFO_tRNS))
      png_set_filler(png, 0xff, PNG_FILLER_AFTER);
    channels = 4;
  }

  pixels.resize(size_t(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (uint32_t y = 0; y < h; ++y)
    rows[y] = pixels.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

bool save_png(const char* path, const uint8_t* pixels, uint32_t w, uint32_t h,
              int channels) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "Usage: qoiconv-cpp <infile> <outfile>\n"
                         "Formats by suffix: .png, .qoi\n");
    return 1;
  }
  const std::string in = argv[1], out = argv[2];

  std::vector<uint8_t> pixels;
  uint32_t w = 0, h = 0;
  int channels = 0;

  if (has_suffix(in, ".png")) {
    if (!load_png(in.c_str(), pixels, w, h, channels)) {
      std::fprintf(stderr, "Couldn't load %s\n", in.c_str());
      return 1;
    }
  } else if (has_suffix(in, ".qoi")) {
    qoi_oracle::ImageDesc d;
    pixels = qoi_oracle::read_file(in.c_str(), d, 0);
    if (pixels.empty()) {
      std::fprintf(stderr, "Couldn't decode %s\n", in.c_str());
      return 1;
    }
    w = d.width;
    h = d.height;
    channels = d.channels;
  } else {
    std::fprintf(stderr, "Unknown input suffix: %s\n", in.c_str());
    return 1;
  }

  bool ok = false;
  if (has_suffix(out, ".png")) {
    ok = save_png(out.c_str(), pixels.data(), w, h, channels);
  } else if (has_suffix(out, ".qoi")) {
    // QOI output is tagged sRGB, as the reference converter hardcodes
    // (qoiconv.c:75-82).
    qoi_oracle::ImageDesc d{w, h, uint8_t(channels), 0};
    ok = qoi_oracle::write_file(out.c_str(), pixels.data(), d);
  } else {
    std::fprintf(stderr, "Unknown output suffix: %s\n", out.c_str());
    return 1;
  }
  if (!ok) {
    std::fprintf(stderr, "Couldn't write %s\n", out.c_str());
    return 1;
  }
  return 0;
}
