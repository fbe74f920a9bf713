// qoi_oracle — clean-room C++17 QOI codec (see qoi_oracle.hpp for the role).
//
// Bitstream semantics follow the normative spec block of the reference
// (/root/reference/qoi.h:61-207) plus the probed behaviours catalogued in
// SURVEY.md §2.2-§2.3. Structure is deliberately different from the
// reference: a shared StreamState object, emit helpers, and vector output.

#include "qoi_oracle.hpp"

#include <array>
#include <cstdio>
#include <cstring>
#include <memory>

namespace qoi_oracle {
namespace {

// Chunk tags (spec: reference qoi.h:106-207).
constexpr uint8_t kTagIndex = 0x00;  // 00xxxxxx
constexpr uint8_t kTagDiff = 0x40;   // 01xxxxxx
constexpr uint8_t kTagLuma = 0x80;   // 10xxxxxx
constexpr uint8_t kTagRun = 0xc0;    // 11xxxxxx
constexpr uint8_t kTagRgb = 0xfe;    // 11111110
constexpr uint8_t kTagRgba = 0xff;   // 11111111
constexpr uint8_t kMask2 = 0xc0;
constexpr int kRunCap = 62;  // run lengths 63/64 collide with RGB/RGBA tags

struct Pixel {
  uint8_t r = 0, g = 0, b = 0, a = 0;

  uint32_t packed() const {
    return uint32_t(r) | uint32_t(g) << 8 | uint32_t(b) << 16 |
           uint32_t(a) << 24;
  }
  bool operator==(const Pixel& o) const { return packed() == o.packed(); }

  // Index hash (spec: reference qoi.h:92-94): (3r+5g+7b+11a) mod 64.
  unsigned hash() const {
    return (unsigned(r) * 3 + unsigned(g) * 5 + unsigned(b) * 7 +
            unsigned(a) * 11) & 63u;
  }
};

// Shared recurrence state: the 64-entry recently-seen table plus the
// previous/current pixel. The table is all-zero (including alpha) while the
// pixel seed is (0,0,0,255) — two distinct initialisations
// (spec: reference qoi.h:74-76 and qoi.h:87-89).
struct StreamState {
  std::array<Pixel, 64> table{};  // value-initialised: all (0,0,0,0)
  Pixel px{0, 0, 0, 255};         // seed previous pixel
};

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(uint8_t(v >> 24));
  out.push_back(uint8_t(v >> 16));
  out.push_back(uint8_t(v >> 8));
  out.push_back(uint8_t(v));
}

uint32_t get_be32(const uint8_t* p) {
  return uint32_t(p[0]) << 24 | uint32_t(p[1]) << 16 | uint32_t(p[2]) << 8 |
         uint32_t(p[3]);
}

bool desc_ok(const ImageDesc& d) {
  if (d.width == 0 || d.height == 0) return false;
  if (d.channels != 3 && d.channels != 4) return false;
  if (d.colorspace > 1) return false;
  // Pixel-count cap exactly as the reference computes it (qoi.h:369,518):
  // height >= MAX / width with INTEGER division — not the product. The two
  // differ when MAX % width != 0 (e.g. w=3, h=133333333: product is
  // 399,999,999 < MAX yet the reference rejects).
  if (uint64_t(d.height) >= kMaxPixels / d.width) return false;
  return true;
}

}  // namespace

std::vector<uint8_t> encode(const uint8_t* pixels, const ImageDesc& desc) {
  std::vector<uint8_t> out;
  if (pixels == nullptr || !desc_ok(desc)) return out;

  const size_t npx = size_t(desc.width) * desc.height;
  const int ch = desc.channels;
  out.reserve(npx * (ch + 1) + kHeaderSize + kTrailerSize);

  // Header (spec: reference qoi.h:66-72).
  out.push_back('q');
  out.push_back('o');
  out.push_back('i');
  out.push_back('f');
  put_be32(out, desc.width);
  put_be32(out, desc.height);
  out.push_back(desc.channels);
  out.push_back(desc.colorspace);

  StreamState st;
  Pixel prev = st.px;  // (0,0,0,255)
  Pixel cur = prev;
  int run = 0;

  const uint8_t* cursor = pixels;
  for (size_t i = 0; i < npx; ++i, cursor += ch) {
    cur.r = cursor[0];
    cur.g = cursor[1];
    cur.b = cursor[2];
    if (ch == 4) cur.a = cursor[3];

    if (cur == prev) {
      // Run accumulation; flush at the 62-cap or at end of image
      // (reference qoi.h:415-421).
      if (++run == kRunCap || i + 1 == npx) {
        out.push_back(uint8_t(kTagRun | (run - 1)));
        run = 0;
      }
      prev = cur;
      continue;
    }

    if (run > 0) {  // pending-run flush before a literal chunk
      out.push_back(uint8_t(kTagRun | (run - 1)));
      run = 0;
    }

    const unsigned slot = cur.hash();
    if (st.table[slot] == cur) {
      out.push_back(uint8_t(kTagIndex | slot));
    } else {
      // Store-on-miss happens before op selection (reference qoi.h:436).
      st.table[slot] = cur;

      if (cur.a != prev.a) {
        out.push_back(kTagRgba);
        out.push_back(cur.r);
        out.push_back(cur.g);
        out.push_back(cur.b);
        out.push_back(cur.a);
      } else {
        // Channel deltas in mod-256 signed-char arithmetic
        // (spec wraparound rule, reference qoi.h:132-134,159-160).
        const int8_t dr = int8_t(uint8_t(cur.r - prev.r));
        const int8_t dg = int8_t(uint8_t(cur.g - prev.g));
        const int8_t db = int8_t(uint8_t(cur.b - prev.b));
        const int8_t dr_dg = int8_t(uint8_t(dr - dg));
        const int8_t db_dg = int8_t(uint8_t(db - dg));

        if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 &&
            db <= 1) {
          out.push_back(uint8_t(kTagDiff | unsigned(dr + 2) << 4 |
                                unsigned(dg + 2) << 2 | unsigned(db + 2)));
        } else if (dg >= -32 && dg <= 31 && dr_dg >= -8 && dr_dg <= 7 &&
                   db_dg >= -8 && db_dg <= 7) {
          out.push_back(uint8_t(kTagLuma | unsigned(dg + 32)));
          out.push_back(uint8_t(unsigned(dr_dg + 8) << 4 | unsigned(db_dg + 8)));
        } else {
          out.push_back(kTagRgb);
          out.push_back(cur.r);
          out.push_back(cur.g);
          out.push_back(cur.b);
        }
      }
    }
    prev = cur;
  }

  // End marker: seven 0x00 then 0x01 (spec: reference qoi.h:103).
  for (int i = 0; i < 7; ++i) out.push_back(0);
  out.push_back(1);
  return out;
}

std::vector<uint8_t> decode(const uint8_t* data, size_t size,
                            ImageDesc& out_desc, int want_channels) {
  std::vector<uint8_t> out;
  if (data == nullptr) return out;
  if (want_channels != 0 && want_channels != 3 && want_channels != 4)
    return out;
  if (size < kHeaderSize + kTrailerSize) return out;

  if (std::memcmp(data, "qoif", 4) != 0) return out;
  out_desc.width = get_be32(data + 4);
  out_desc.height = get_be32(data + 8);
  out_desc.channels = data[12];
  out_desc.colorspace = data[13];
  if (!desc_ok(out_desc)) return out;

  const int ch = want_channels == 0 ? out_desc.channels : want_channels;
  const size_t npx = size_t(out_desc.width) * out_desc.height;
  out.resize(npx * ch);

  StreamState st;
  size_t pos = kHeaderSize;
  // Chunk reads stop short of the 8-byte trailer; if the stream is
  // truncated the current pixel repeats (reference qoi.h:539-544).
  const size_t chunk_end = size - kTrailerSize;
  int run = 0;
  uint8_t* w = out.data();

  for (size_t i = 0; i < npx; ++i, w += ch) {
    if (run > 0) {
      --run;
    } else if (pos < chunk_end) {
      const uint8_t head = data[pos++];
      if (head == kTagRgb) {
        st.px.r = data[pos++];
        st.px.g = data[pos++];
        st.px.b = data[pos++];
      } else if (head == kTagRgba) {
        st.px.r = data[pos++];
        st.px.g = data[pos++];
        st.px.b = data[pos++];
        st.px.a = data[pos++];
      } else {
        switch (head & kMask2) {
          case kTagIndex:
            st.px = st.table[head & 63u];
            break;
          case kTagDiff:
            st.px.r = uint8_t(st.px.r + ((head >> 4) & 3u) - 2);
            st.px.g = uint8_t(st.px.g + ((head >> 2) & 3u) - 2);
            st.px.b = uint8_t(st.px.b + (head & 3u) - 2);
            break;
          case kTagLuma: {
            const uint8_t tail = data[pos++];
            const int dg = int(head & 0x3fu) - 32;
            st.px.r = uint8_t(st.px.r + dg - 8 + ((tail >> 4) & 0x0fu));
            st.px.g = uint8_t(st.px.g + dg);
            st.px.b = uint8_t(st.px.b + dg - 8 + (tail & 0x0fu));
            break;
          }
          default:  // kTagRun
            run = head & 0x3fu;
            break;
        }
      }
      // The decoder refreshes the table after every chunk
      // (reference qoi.h:577), including INDEX and RUN chunks.
      st.table[st.px.hash()] = st.px;
    }
    w[0] = st.px.r;
    w[1] = st.px.g;
    w[2] = st.px.b;
    if (ch == 4) w[3] = st.px.a;
  }
  return out;
}

bool write_file(const char* path, const uint8_t* pixels,
                const ImageDesc& desc) {
  std::vector<uint8_t> enc = encode(pixels, desc);
  if (enc.empty()) return false;
  std::unique_ptr<FILE, int (*)(FILE*)> f(std::fopen(path, "wb"),
                                          &std::fclose);
  if (!f) return false;
  return std::fwrite(enc.data(), 1, enc.size(), f.get()) == enc.size();
}

std::vector<uint8_t> read_file(const char* path, ImageDesc& out_desc,
                               int want_channels) {
  std::unique_ptr<FILE, int (*)(FILE*)> f(std::fopen(path, "rb"),
                                          &std::fclose);
  if (!f) return {};
  std::fseek(f.get(), 0, SEEK_END);
  const long sz = std::ftell(f.get());
  if (sz <= 0) return {};
  std::fseek(f.get(), 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  if (std::fread(buf.data(), 1, buf.size(), f.get()) != buf.size()) return {};
  return decode(buf.data(), buf.size(), out_desc, want_channels);
}

}  // namespace qoi_oracle
