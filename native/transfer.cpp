// Tunnel-transfer codecs: bit-packing and delta transforms that cut the
// bytes entering the host<->device link compressor.
//
// Context (reference parity): the reference never moves fp volumes either —
// its multilabel save path stores uint8 (`totalsegmentator/nnunet.py:728-803`)
// and torch keeps tensors GPU-resident. Here the TPU sits behind a network
// tunnel whose transfer cost is payload-dominated (~20-80 MB/s, with a
// zero-run-friendly compressor on the link), so the host side of every
// transfer gets a single-pass C codec:
//
//  * 12-bit CT pack: HU values in [-1024, 3071] fit 12 bits; two int16
//    voxels pack into 3 bytes (25% fewer bytes, lossless). Packed along
//    axis 0 (plane-major) so the device-side unpack is a free major-dim
//    reshape plus elementwise shifts.
//  * XOR-delta along the minor (contiguous) axis: label volumes are
//    piecewise-constant, so v[i] ^ v[i-1] is ~97% zeros — the link
//    compressor moves those nearly free. The host decode is a single
//    prefix-XOR pass; the device side is one fused elementwise op
//    (encode) or a log-depth associative scan (decode).
//
// All kernels are single-threaded on purpose: this host has one core, and
// these run either on the main thread right before/after a transfer or on
// the HostWorker (they release the GIL via ctypes).

#include <cstdint>
#include <cstring>

extern "C" {

// ---- 12-bit pack along axis 0 ------------------------------------------
// a: (2*n_pairs, plane) int16 with values in [-1024, 3071].
// out: (3*n_pairs, plane) uint8. Pair k maps planes (2k, 2k+1) -> byte
// planes (3k, 3k+1, 3k+2):
//   u0 = a[2k]+1024, u1 = a[2k+1]+1024  (12-bit each)
//   b0 = u0 >> 4;  b1 = (u0 & 0xF) << 4 | u1 >> 8;  b2 = u1 & 0xFF
void boa_pack12_axis0(const int16_t* a, int64_t n_pairs, int64_t plane,
                      uint8_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int16_t* v0 = a + 2 * k * plane;
    const int16_t* v1 = v0 + plane;
    uint8_t* b0 = out + 3 * k * plane;
    uint8_t* b1 = b0 + plane;
    uint8_t* b2 = b1 + plane;
    for (int64_t i = 0; i < plane; ++i) {
      const uint16_t u0 = (uint16_t)(v0[i] + 1024);
      const uint16_t u1 = (uint16_t)(v1[i] + 1024);
      b0[i] = (uint8_t)(u0 >> 4);
      b1[i] = (uint8_t)((u0 << 4) | (u1 >> 8));
      b2[i] = (uint8_t)u1;
    }
  }
}

// Range-checked variant: packs AND validates in one pass. Returns 1 on
// success; returns 0 as soon as a plane-pair contains a value outside
// [-1024, 3071] (out contents are then undefined — caller falls back to a
// raw upload). This fuses the gating min/max pass into the pack so upload
// paths that never ran the CT range check (serve/stream.py, python_api
// predict_image) don't pay a separate full-volume host pass.
int32_t boa_pack12_axis0_checked(const int16_t* a, int64_t n_pairs,
                                 int64_t plane, uint8_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int16_t* v0 = a + 2 * k * plane;
    const int16_t* v1 = v0 + plane;
    uint8_t* b0 = out + 3 * k * plane;
    uint8_t* b1 = b0 + plane;
    uint8_t* b2 = b1 + plane;
    uint16_t bad = 0;  // accumulates high nibble bits of any out-of-range u
    for (int64_t i = 0; i < plane; ++i) {
      const uint16_t u0 = (uint16_t)(v0[i] + 1024);
      const uint16_t u1 = (uint16_t)(v1[i] + 1024);
      bad |= (uint16_t)(u0 | u1);
      b0[i] = (uint8_t)(u0 >> 4);
      b1[i] = (uint8_t)((u0 << 4) | (u1 >> 8));
      b2[i] = (uint8_t)u1;
    }
    if (bad & 0xF000) return 0;  // some value needed >12 bits
  }
  return 1;
}

// Inverse of boa_pack12_axis0 (host-side tests / host consumers).
void boa_unpack12_axis0(const uint8_t* p, int64_t n_pairs, int64_t plane,
                        int16_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    const uint8_t* b0 = p + 3 * k * plane;
    const uint8_t* b1 = b0 + plane;
    const uint8_t* b2 = b1 + plane;
    int16_t* v0 = out + 2 * k * plane;
    int16_t* v1 = v0 + plane;
    for (int64_t i = 0; i < plane; ++i) {
      v0[i] = (int16_t)((((uint16_t)b0[i] << 4) | (b1[i] >> 4)) - 1024);
      v1[i] = (int16_t)(((((uint16_t)b1[i] & 0xF) << 8) | b2[i]) - 1024);
    }
  }
}

// ---- XOR-delta codec along the contiguous minor axis --------------------
// a is (rows, n) C-contiguous uint8; each row transforms independently:
//   enc: d[0] = a[0]; d[i] = a[i] ^ a[i-1]
//   dec: a[i] = d[0] ^ d[1] ^ ... ^ d[i]   (prefix XOR)
// In-place safe for enc only if walked backwards; these write to `out`.
void boa_xordelta_enc_u8(const uint8_t* a, int64_t rows, int64_t n,
                         uint8_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* s = a + r * n;
    uint8_t* o = out + r * n;
    uint8_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t cur = s[i];
      o[i] = (uint8_t)(cur ^ prev);
      prev = cur;
    }
  }
}

void boa_xordelta_dec_u8(const uint8_t* d, int64_t rows, int64_t n,
                         uint8_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* s = d + r * n;
    uint8_t* o = out + r * n;
    uint8_t acc = 0;
    for (int64_t i = 0; i < n; ++i) {
      acc = (uint8_t)(acc ^ s[i]);
      o[i] = acc;
    }
  }
}

}  // extern "C"
