// COCO run-length-encoded mask codec (native replacement for pycocotools'
// C backend, used by the reference at data/datasets.py:73,275).
//
// Supports the compressed LEB128-style `counts` string and raw count
// arrays. Masks are decoded in Fortran (column-major) order per the COCO
// spec, written out as row-major uint8 (h, w).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Decodes a compressed counts string into raw counts.
// Returns the number of counts written (<= max_counts).
int nfi_rle_decode_counts(const char* s, int64_t* counts, int max_counts) {
  int m = 0;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
  while (*p && m < max_counts) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      int c = *p - 48;
      if (*p == 0) return m;
      x |= static_cast<int64_t>(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    // COCO spec (pycocotools rleFrString): counts 0..2 are absolute;
    // from index 3 on, each value is delta-coded against the count TWO
    // positions back (same parity, i.e. the previous run of the same
    // color) — NOT the immediately preceding count.
    if (m > 2) x += counts[m - 2];
    counts[m++] = x;
  }
  return m;
}

// Decodes raw counts into a row-major uint8 mask of shape (h, w).
void nfi_rle_counts_to_mask(const int64_t* counts, int n_counts, int h, int w,
                            uint8_t* out) {
  std::vector<uint8_t> colmajor(static_cast<size_t>(h) * w, 0);
  size_t pos = 0;
  uint8_t val = 0;
  for (int i = 0; i < n_counts; ++i) {
    int64_t run = counts[i];
    for (int64_t j = 0; j < run && pos < colmajor.size(); ++j)
      colmajor[pos++] = val;
    val = 1 - val;
  }
  // Fortran order -> row major.
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      out[static_cast<size_t>(y) * w + x] =
          colmajor[static_cast<size_t>(x) * h + y];
}

// Convenience: decode a compressed string directly to a mask.
// Returns 0 on success.
int nfi_rle_decode_mask(const char* s, int h, int w, uint8_t* out) {
  std::vector<int64_t> counts(static_cast<size_t>(h) * w + 2);
  int m = nfi_rle_decode_counts(s, counts.data(),
                                static_cast<int>(counts.size()));
  if (m <= 0) return 1;
  nfi_rle_counts_to_mask(counts.data(), m, h, w, out);
  return 0;
}

// Encodes a row-major uint8 mask to raw counts; returns count length.
int nfi_rle_encode_mask(const uint8_t* mask, int h, int w, int64_t* counts,
                        int max_counts) {
  int m = 0;
  int64_t run = 0;
  uint8_t cur = 0;
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) {
      uint8_t v = mask[static_cast<size_t>(y) * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (m >= max_counts) return -1;
        counts[m++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (m >= max_counts) return -1;
  counts[m++] = run;
  return m;
}

}  // extern "C"
