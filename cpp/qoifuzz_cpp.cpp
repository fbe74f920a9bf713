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
