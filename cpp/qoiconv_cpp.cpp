// qoiconv-cpp — native PNG <-> QOI converter (reference tool equivalent:
// /root/reference/qoiconv.c). Uses libpng directly instead of stb_image.
//
// Usage: qoiconv-cpp <infile> <outfile>   (.png / .qoi by suffix)

#include "png_io.hpp"

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
    if (!png_io::load_file(in.c_str(), pixels, w, h, channels)) {
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
    ok = png_io::save_file(out.c_str(), pixels.data(), w, h, channels);
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
