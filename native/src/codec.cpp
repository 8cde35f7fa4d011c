// VTK-XML payload codec: base64 + zlib block streams.
//
// Native counterpart of the decode path in io/vtkxml.py (which replaces the
// reference's VTK readers, e.g. vtkXMLImageDataReader at
// Sources/ReconstructionData.cxx:223-229). The XML *structure* is parsed in
// Python (tiny); the payload decode (base64 + per-block zlib) dominates
// wall time for large depth maps and runs here.

#include "common.h"

#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

// RFC 4648 decode table: 0xFF = invalid, 0xFE = padding/skip.
const unsigned char* b64_table() {
  static unsigned char table[256];
  static bool init = false;
  if (!init) {
    memset(table, 0xFF, sizeof(table));
    const char* alphabet =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; i++) table[(unsigned char)alphabet[i]] = i;
    table[(unsigned char)'='] = 0xFE;
    table[(unsigned char)'\n'] = 0xFE;
    table[(unsigned char)'\r'] = 0xFE;
    table[(unsigned char)' '] = 0xFE;
    table[(unsigned char)'\t'] = 0xFE;
    init = true;
  }
  return table;
}

}  // namespace

// Decode base64 `src[0..src_len)` into dst (capacity dst_cap).
// Returns decoded byte count, or -1 on invalid input / overflow.
CDMI_API int64_t cdmi_base64_decode(const char* src, int64_t src_len,
                                    uint8_t* dst, int64_t dst_cap) {
  const unsigned char* table = b64_table();
  uint32_t acc = 0;
  int bits = 0;
  int64_t out = 0;
  for (int64_t i = 0; i < src_len; i++) {
    unsigned char v = table[(unsigned char)src[i]];
    if (v == 0xFE) continue;  // padding / whitespace
    if (v == 0xFF) return -1;
    acc = (acc << 6) | v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (out >= dst_cap) return -1;
      dst[out++] = (uint8_t)(acc >> bits);
    }
  }
  return out;
}

// Encode to base64; returns encoded char count (no line breaks).
CDMI_API int64_t cdmi_base64_encode(const uint8_t* src, int64_t src_len,
                                    char* dst, int64_t dst_cap) {
  static const char* alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  int64_t out = 0;
  for (int64_t i = 0; i < src_len; i += 3) {
    uint32_t chunk = (uint32_t)src[i] << 16;
    int n = 1;
    if (i + 1 < src_len) { chunk |= (uint32_t)src[i + 1] << 8; n = 2; }
    if (i + 2 < src_len) { chunk |= (uint32_t)src[i + 2]; n = 3; }
    if (out + 4 > dst_cap) return -1;
    dst[out++] = alphabet[(chunk >> 18) & 63];
    dst[out++] = alphabet[(chunk >> 12) & 63];
    dst[out++] = n >= 2 ? alphabet[(chunk >> 6) & 63] : '=';
    dst[out++] = n >= 3 ? alphabet[chunk & 63] : '=';
  }
  return out;
}

// Decompress a VTK zlib block stream (header ints already parsed in Python):
// `blocks` = concatenated zlib streams with per-block compressed sizes
// `csizes[0..nblocks)`; output written contiguously. Returns total
// decompressed bytes or -1 on error.
CDMI_API int64_t cdmi_zlib_decode_blocks(const uint8_t* blocks,
                                         const int64_t* csizes,
                                         int64_t nblocks, uint8_t* dst,
                                         int64_t dst_cap) {
  int64_t in_off = 0;
  int64_t out_off = 0;
  for (int64_t b = 0; b < nblocks; b++) {
    uLongf avail = (uLongf)(dst_cap - out_off);
    uLongf got = avail;
    int rc = uncompress(dst + out_off, &got, blocks + in_off,
                        (uLong)csizes[b]);
    if (rc != Z_OK) return -1;
    in_off += csizes[b];
    out_off += (int64_t)got;
  }
  return out_off;
}

// Compress `src` into VTK-style fixed-size blocks. csizes_out[0..nblocks)
// receives per-block compressed sizes; returns total compressed bytes or -1.
// nblocks must equal ceil(src_len / block_size).
CDMI_API int64_t cdmi_zlib_encode_blocks(const uint8_t* src, int64_t src_len,
                                         int64_t block_size, uint8_t* dst,
                                         int64_t dst_cap,
                                         int64_t* csizes_out,
                                         int64_t nblocks) {
  int64_t out_off = 0;
  for (int64_t b = 0; b < nblocks; b++) {
    int64_t start = b * block_size;
    int64_t len = src_len - start;
    if (len > block_size) len = block_size;
    if (len < 0) return -1;
    uLongf got = (uLongf)(dst_cap - out_off);
    int rc = compress2(dst + out_off, &got, src + start, (uLong)len,
                       Z_DEFAULT_COMPRESSION);
    if (rc != Z_OK) return -1;
    csizes_out[b] = (int64_t)got;
    out_off += (int64_t)got;
  }
  return out_off;
}
