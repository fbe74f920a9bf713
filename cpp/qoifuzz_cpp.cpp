// qoifuzz-cpp — libFuzzer harness for the oracle decoder (reference harness:
// /root/reference/qoifuzz.c — first 4 input bytes choose the forced channel
// count, the rest is fed to the decoder). Build with `make fuzz` (clang).

#include <cstdint>
#include <cstring>

#include "qoi_oracle.hpp"

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
  if (size < 4) return 0;
  int want = 0;
  std::memcpy(&want, data, 4);  // arbitrary int, validation is the safety net
  qoi_oracle::ImageDesc d;
  (void)qoi_oracle::decode(data + 4, size - 4, d, want);
  return 0;
}

// Standalone driver (`make fuzz-asan`, g++ + ASan/UBSan, no libFuzzer):
// random inputs plus mutated canonical streams for a fixed iteration
// count, or — when the argument is a directory — corpus REPLAY: every
// file under it is fed through the same LLVMFuzzerTestOneInput entry
// (the clang/libFuzzer workflow's crash-corpus replay, runnable here
// without clang).
#ifdef QOIFUZZ_STANDALONE
#include <dirent.h>
#include <sys/stat.h>

#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>
#include <vector>

static int replay_dir(const std::string& dir) {
  int n = 0;
  DIR* d = opendir(dir.c_str());
  if (!d) return -1;
  while (dirent* e = readdir(d)) {
    const std::string name = e->d_name;
    if (name == "." || name == "..") continue;
    const std::string full = dir + "/" + name;
    struct stat st;
    if (stat(full.c_str(), &st) != 0) continue;
    if (S_ISDIR(st.st_mode)) {
      n += replay_dir(full);
      continue;
    }
    FILE* f = std::fopen(full.c_str(), "rb");
    if (!f) continue;
    std::vector<uint8_t> buf(size_t(st.st_size));
    if (std::fread(buf.data(), 1, buf.size(), f) == buf.size()) {
      LLVMFuzzerTestOneInput(buf.data(), buf.size());
      ++n;
    }
    std::fclose(f);
  }
  closedir(d);
  return n;
}

int main(int argc, char** argv) {
  if (argc > 1) {
    struct stat st;
    if (stat(argv[1], &st) == 0 && S_ISDIR(st.st_mode)) {
      const int n = replay_dir(argv[1]);
      std::printf("qoifuzz-asan: replayed %d corpus files clean\n", n);
      return n >= 0 ? 0 : 1;
    }
  }
  const int iters = argc > 1 ? std::atoi(argv[1]) : 20000;
  std::mt19937 rng(42);

  // a canonical stream to mutate (16x8 RGBA gradient)
  std::vector<uint8_t> px(16 * 8 * 4);
  for (size_t i = 0; i < px.size(); ++i) px[i] = static_cast<uint8_t>(i * 7);
  qoi_oracle::ImageDesc desc{16, 8, 4, 0};
  std::vector<uint8_t> canon = qoi_oracle::encode(px.data(), desc);

  std::vector<uint8_t> buf;
  for (int it = 0; it < iters; ++it) {
    if (it % 2 == 0) {
      buf.resize(4 + rng() % 256);
      for (auto& b : buf) b = static_cast<uint8_t>(rng());
    } else {
      buf.assign(4, 0);
      buf[0] = static_cast<uint8_t>(rng());  // channels int (low byte)
      buf.insert(buf.end(), canon.begin(), canon.end());
      const int flips = 1 + rng() % 5;
      for (int f = 0; f < flips; ++f)
        buf[4 + rng() % canon.size()] = static_cast<uint8_t>(rng());
    }
    LLVMFuzzerTestOneInput(buf.data(), buf.size());
  }
  std::printf("qoifuzz-asan: %d iterations clean\n", iters);
  return 0;
}
#endif
