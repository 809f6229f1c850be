// Adaptive binary range coder for the SMoE parameter bitstream.
//
// The reference stores quantized parameters as a pickle "bitstream stand-in"
// (reference smoe_reconstruction_decoded.py:16-62) and reports rate as a
// raw   #kernels x bit-depth   proxy (reference smoe.py:1012,
// smoe_test.py:302-303).  This module provides a real entropy-coded
// bitstream: an LZMA-style carry-tracking range coder with adaptive bit
// models per (parameter group, bit position), so the actual rate lands
// below the raw proxy whenever the quantized values are biased (they are:
// high-order bits of musX/nu deviations are strongly skewed).
//
// C API (ctypes-friendly, see smoe_tpu/codec/bitstream.py):
//   smoe_rc_encode(vals, nbits, group, n, out, cap) -> bytes written or 0
//   smoe_rc_decode(in, len, nbits, group, n, vals)  -> bytes read or -1
//
// Values are encoded MSB-first; model context = group * 32 + bit_position.
// The Python fallback in bitstream.py implements the identical format
// (golden cross-tests in tests/test_bitstream.py keep them bit-exact).

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t kTopValue = 1u << 24;
constexpr uint32_t kBitModelTotal = 1u << 11;   // 11-bit probabilities
constexpr int kMoveBits = 5;
constexpr int kNumGroups = 8;
constexpr int kMaxBits = 32;

struct Encoder {
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  uint64_t cache_size = 1;
  uint8_t* out;
  size_t pos = 0;
  size_t cap;
  bool overflow = false;

  void emit(uint8_t b) {
    if (pos < cap) out[pos++] = b;
    else overflow = true;
  }

  void shift_low() {
    if (static_cast<uint32_t>(low >> 32) != 0 ||
        static_cast<uint32_t>(low) < 0xFF000000u) {
      uint8_t carry = static_cast<uint8_t>(low >> 32);
      do {
        emit(static_cast<uint8_t>(cache + carry));
        cache = 0xFF;
      } while (--cache_size);
      cache = static_cast<uint8_t>(low >> 24);
    }
    ++cache_size;
    low = (low << 8) & 0xFFFFFFFFu;
  }

  void encode_bit(uint16_t* prob, int bit) {
    uint32_t bound = (range >> 11) * (*prob);
    if (!bit) {
      range = bound;
      *prob = static_cast<uint16_t>(*prob + ((kBitModelTotal - *prob) >> kMoveBits));
    } else {
      low += bound;
      range -= bound;
      *prob = static_cast<uint16_t>(*prob - (*prob >> kMoveBits));
    }
    while (range < kTopValue) {
      range <<= 8;
      shift_low();
    }
  }

  void flush() {
    for (int i = 0; i < 5; ++i) shift_low();
  }
};

struct Decoder {
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  const uint8_t* in;
  size_t pos = 0;
  size_t len;
  bool underflow = false;

  uint8_t next() {
    if (pos < len) return in[pos++];
    underflow = true;
    return 0;
  }

  void init() {
    next();                      // first byte is always 0 (cache_size=1)
    for (int i = 0; i < 4; ++i) code = (code << 8) | next();
  }

  int decode_bit(uint16_t* prob) {
    uint32_t bound = (range >> 11) * (*prob);
    int bit;
    if (code < bound) {
      range = bound;
      *prob = static_cast<uint16_t>(*prob + ((kBitModelTotal - *prob) >> kMoveBits));
      bit = 0;
    } else {
      code -= bound;
      range -= bound;
      *prob = static_cast<uint16_t>(*prob - (*prob >> kMoveBits));
      bit = 1;
    }
    while (range < kTopValue) {
      range <<= 8;
      code = (code << 8) | next();
    }
    return bit;
  }
};

}  // namespace

extern "C" {

// Encode n values; vals[i] uses nbits[i] bits with context group[i] (< 8).
// Returns bytes written into out, or 0 if out (cap bytes) was too small.
size_t smoe_rc_encode(const uint32_t* vals, const uint8_t* nbits,
                      const uint8_t* group, size_t n, uint8_t* out,
                      size_t cap) {
  uint16_t probs[kNumGroups * kMaxBits];
  for (auto& p : probs) p = kBitModelTotal / 2;
  Encoder enc;
  enc.out = out;
  enc.cap = cap;
  for (size_t i = 0; i < n; ++i) {
    int b = nbits[i];
    if (b > kMaxBits) return 0;   // would index past the ctx row
    uint16_t* ctx = probs + (group[i] & (kNumGroups - 1)) * kMaxBits;
    for (int j = b - 1; j >= 0; --j) {
      enc.encode_bit(&ctx[j], (vals[i] >> j) & 1);
      if (enc.overflow) return 0;
    }
  }
  enc.flush();
  return enc.overflow ? 0 : enc.pos;
}

// Decode n values (same nbits/group streams as the encoder).
// Returns bytes consumed, or -1 on truncated input.
long long smoe_rc_decode(const uint8_t* in, size_t len, const uint8_t* nbits,
                         const uint8_t* group, size_t n, uint32_t* vals) {
  uint16_t probs[kNumGroups * kMaxBits];
  for (auto& p : probs) p = kBitModelTotal / 2;
  Decoder dec;
  dec.in = in;
  dec.len = len;
  dec.init();
  for (size_t i = 0; i < n; ++i) {
    int b = nbits[i];
    if (b > kMaxBits) return -1;  // corrupt header: would overrun ctx row
    uint16_t* ctx = probs + (group[i] & (kNumGroups - 1)) * kMaxBits;
    uint32_t v = 0;
    for (int j = b - 1; j >= 0; --j) {
      v |= static_cast<uint32_t>(dec.decode_bit(&ctx[j])) << j;
      if (dec.underflow) return -1;
    }
    vals[i] = v;
  }
  return static_cast<long long>(dec.pos);
}

}  // extern "C"
