// Minimal stand-in for boost::crc_32_type so the reference sources can be
// compiled into a golden-vector generator without Boost installed.
// Implements IEEE CRC-32 (poly 0x04C11DB7 reflected, init/final 0xFFFFFFFF),
// identical to boost::crc_32_type / zlib crc32.
#ifndef FUN_OFDM_TPU_SHIM_BOOST_CRC_HPP
#define FUN_OFDM_TPU_SHIM_BOOST_CRC_HPP

#include <cstddef>
#include <cstdint>

namespace boost {

class crc_32_type {
  std::uint32_t state_ = 0xFFFFFFFFu;

  static const std::uint32_t *table() {
    static std::uint32_t t[256];
    static bool init = false;
    if (!init) {
      for (std::uint32_t b = 0; b < 256; ++b) {
        std::uint32_t c = b;
        for (int k = 0; k < 8; ++k)
          c = (c >> 1) ^ (0xEDB88320u & (0u - (c & 1u)));
        t[b] = c;
      }
      init = true;
    }
    return t;
  }

 public:
  void process_bytes(const void *data, std::size_t n) {
    const unsigned char *p = static_cast<const unsigned char *>(data);
    const std::uint32_t *t = table();
    for (std::size_t i = 0; i < n; ++i)
      state_ = t[(state_ ^ p[i]) & 0xFFu] ^ (state_ >> 8);
  }

  std::uint32_t checksum() const { return state_ ^ 0xFFFFFFFFu; }
};

}  // namespace boost

#endif
