// qoibench-cpp — single-core micro-benchmark of the oracle codec.
// This is the baseline *denominator* for the TPU engine's speedup numbers
// (reference harness: /root/reference/qoibench.c; metrics per
// qoibench.c:340-357: ms, Mpixels/s, size KB, rate %).
//
// Usage: qoibench-cpp [runs] [width] [height] [channels]
// Generates the same synthetic mix used by the Python bench (gradient +
// flat regions + noise) so numbers are comparable without a PNG corpus.

#include <chrono>
#include <cinttypes>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "qoi_oracle.hpp"

namespace {

double now_ms() {
  using clock = std::chrono::steady_clock;
  return std::chrono::duration<double, std::milli>(
             clock::now().time_since_epoch())
      .count();
}

// Deterministic xorshift so C++ and Python benches agree on content class.
uint32_t xorshift(uint32_t& s) {
  s ^= s << 13;
  s ^= s >> 17;
  s ^= s << 5;
  return s;
}

std::vector<uint8_t> synth_image(uint32_t w, uint32_t h, int ch) {
  std::vector<uint8_t> px(size_t(w) * h * ch);
  uint32_t seed = 0x9e3779b9u;
  for (uint32_t y = 0; y < h; ++y) {
    for (uint32_t x = 0; x < w; ++x) {
      uint8_t* p = px.data() + (size_t(y) * w + x) * ch;
      const int region = (x * 4 / w);
      if (region == 0) {  // smooth gradient: DIFF/LUMA territory
        p[0] = uint8_t(x + y);
        p[1] = uint8_t(x);
        p[2] = uint8_t(y);
      } else if (region == 1) {  // flat: RUN territory
        p[0] = 40;
        p[1] = 80;
        p[2] = 120;
      } else if (region == 2) {  // banded: INDEX territory
        const int band = (x / 3) % 8;
        p[0] = uint8_t(10 * band);
        p[1] = uint8_t(20 * band);
        p[2] = uint8_t(30 * band);
      } else {  // noise: RGB/RGBA territory
        const uint32_t r = xorshift(seed);
        p[0] = uint8_t(r);
        p[1] = uint8_t(r >> 8);
        p[2] = uint8_t(r >> 16);
      }
      if (ch == 4) p[3] = uint8_t(x % 64 == 0 ? 200 : 255);
    }
  }
  return px;
}

}  // namespace

int main(int argc, char** argv) {
  const int runs = argc > 1 ? std::atoi(argv[1]) : 10;
  const uint32_t w = argc > 2 ? uint32_t(std::atoi(argv[2])) : 1920;
  const uint32_t h = argc > 3 ? uint32_t(std::atoi(argv[3])) : 1080;
  const int ch = argc > 4 ? std::atoi(argv[4]) : 4;

  const qoi_oracle::ImageDesc desc{w, h, uint8_t(ch), 0};
  std::vector<uint8_t> pixels = synth_image(w, h, ch);
  const double mpx = double(w) * h / 1e6;

  // Roundtrip verification first (the reference's only correctness check,
  // qoibench.c:410-417).
  std::vector<uint8_t> enc = qoi_oracle::encode(pixels.data(), desc);
  qoi_oracle::ImageDesc d2;
  std::vector<uint8_t> dec = qoi_oracle::decode(enc.data(), enc.size(), d2, ch);
  if (dec != pixels) {
    std::fprintf(stderr, "FAIL: roundtrip mismatch\n");
    return 1;
  }

  double enc_ms = 0, dec_ms = 0;
  for (int i = -1; i < runs; ++i) {  // run -1 is the discarded warmup
    double t0 = now_ms();
    std::vector<uint8_t> e = qoi_oracle::encode(pixels.data(), desc);
    double t1 = now_ms();
    qoi_oracle::ImageDesc dd;
    std::vector<uint8_t> p = qoi_oracle::decode(e.data(), e.size(), dd, ch);
    double t2 = now_ms();
    if (i >= 0) {
      enc_ms += (t1 - t0) / runs;
      dec_ms += (t2 - t1) / runs;
    }
  }

  std::printf("## qoibench-cpp %ux%u ch=%d, %d runs\n", w, h, ch, runs);
  std::printf("        decode ms   encode ms   decode mpps   encode mpps   "
              "size kb    rate\n");
  std::printf("oracle  %9.3f   %9.3f   %11.3f   %11.3f   %7zu   %4.1f%%\n",
              dec_ms, enc_ms, mpx / (dec_ms / 1000.0),
              mpx / (enc_ms / 1000.0), enc.size() / 1024,
              100.0 * double(enc.size()) / (double(pixels.size()) + 14));
  std::printf("{\"encode_mpps\": %.3f, \"decode_mpps\": %.3f, "
              "\"bytes\": %zu, \"rate\": %.4f}\n",
              mpx / (enc_ms / 1000.0), mpx / (dec_ms / 1000.0), enc.size(),
              double(enc.size()) / double(pixels.size()));
  return 0;
}
