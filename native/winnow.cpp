// Native winnowed-minimizer extraction — the host-side DB-build hot path.
//
// Bit-exact with metamaps_tpu.ops.winnow.winnow_oracle (which is itself
// pinned against the reference's addMinimizers deque algorithm,
// src/map/include/commonFunc.hpp:91-175): upper-casing, canonical k-mer =
// min(murmur(fwd), murmur(revcomp)), symmetric k-mers skipped, monotone
// deque with rightmost-equal-wins eviction, one record per run with the
// reference's dummy-wpos-0 dedupe rule.
//
// MurmurHash3_x64_128 implemented from the public-domain algorithm
// specification; we keep the low 32 bits of h1, seed 42 (matches
// metamaps_tpu/ops/murmur3.py, golden-pinned in tests/test_murmur3.py).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

// low 32 bits of h1 of MurmurHash3_x64_128(data, len, seed)
static uint32_t murmur3_low32(const uint8_t* data, int len, uint32_t seed) {
  const int nblocks = len / 16;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;

  for (int i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    std::memcpy(&k1, data + 16 * i, 8);
    std::memcpy(&k2, data + 16 * i + 8, 8);
    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729ULL;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5ULL;
  }

  const uint8_t* tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= (uint64_t)tail[14] << 48; /* fallthrough */
    case 14: k2 ^= (uint64_t)tail[13] << 40; /* fallthrough */
    case 13: k2 ^= (uint64_t)tail[12] << 32; /* fallthrough */
    case 12: k2 ^= (uint64_t)tail[11] << 24; /* fallthrough */
    case 11: k2 ^= (uint64_t)tail[10] << 16; /* fallthrough */
    case 10: k2 ^= (uint64_t)tail[9] << 8;   /* fallthrough */
    case 9:
      k2 ^= (uint64_t)tail[8];
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
      /* fallthrough */
    case 8: k1 ^= (uint64_t)tail[7] << 56; /* fallthrough */
    case 7: k1 ^= (uint64_t)tail[6] << 48; /* fallthrough */
    case 6: k1 ^= (uint64_t)tail[5] << 40; /* fallthrough */
    case 5: k1 ^= (uint64_t)tail[4] << 32; /* fallthrough */
    case 4: k1 ^= (uint64_t)tail[3] << 24; /* fallthrough */
    case 3: k1 ^= (uint64_t)tail[2] << 16; /* fallthrough */
    case 2: k1 ^= (uint64_t)tail[1] << 8;  /* fallthrough */
    case 1:
      k1 ^= (uint64_t)tail[0];
      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
  }

  h1 ^= (uint64_t)len; h2 ^= (uint64_t)len;
  h1 += h2; h2 += h1;
  h1 = fmix64(h1); h2 = fmix64(h2);
  h1 += h2;  // h2 += h1 affects only the upper 64 bits, which we drop
  return (uint32_t)h1;
}

struct QEntry {
  uint32_t hash;
  int32_t wpos;  // dummy 0 until first emitted (reference semantics)
  int8_t strand;
  int64_t kpos;
};

extern "C" int64_t winnow(const uint8_t* seq, int64_t n_bytes, int k, int w,
                          int alphabet_size, uint32_t* out_hash,
                          int32_t* out_pos, int8_t* out_strand) {
  const int64_t n = n_bytes - k + 1;
  if (n <= 0 || n - w + 1 <= 0) return 0;

  // upper-cased copy + reverse complement (A<->T, C<->G, others unchanged)
  std::vector<uint8_t> up(n_bytes), rc;
  for (int64_t i = 0; i < n_bytes; i++) {
    uint8_t c = seq[i];
    up[i] = (c >= 'a' && c <= 'z') ? c - 32 : c;
  }
  const bool do_rc = alphabet_size == 4;
  if (do_rc) {
    rc.resize(n_bytes);
    for (int64_t i = 0; i < n_bytes; i++) {
      uint8_t c = up[n_bytes - 1 - i];
      switch (c) {
        case 'A': c = 'T'; break;
        case 'T': c = 'A'; break;
        case 'C': c = 'G'; break;
        case 'G': c = 'C'; break;
      }
      rc[i] = c;
    }
  }

  std::vector<QEntry> q(w + 1);  // ring buffer, capacity > w
  int qh = 0, qt = 0;            // [qh, qt) occupied
  const int qcap = w + 1;
  int64_t n_out = 0;
  bool have_last = false;
  uint32_t last_h = 0;
  int32_t last_p = 0;
  int8_t last_s = 0;

  for (int64_t i = 0; i < n; i++) {
    uint32_t fwd = murmur3_low32(up.data() + i, k, 42);
    uint32_t bwd = do_rc
        ? murmur3_low32(rc.data() + (n_bytes - k - i), k, 42)
        : 0xFFFFFFFFu;
    if (fwd == bwd) continue;  // symmetric k-mer: skipped entirely
    uint32_t canon = fwd < bwd ? fwd : bwd;
    int8_t strand = fwd < bwd ? 1 : -1;
    int64_t wid = i - w + 1;

    while (qh != qt && q[qh].kpos <= i - w) qh = (qh + 1) % qcap;
    while (qh != qt && q[(qt + qcap - 1) % qcap].hash >= canon)
      qt = (qt + qcap - 1) % qcap;
    q[qt] = {canon, 0, strand, i};
    qt = (qt + 1) % qcap;

    if (wid >= 0) {
      QEntry& front = q[qh];
      if (!have_last || front.hash != last_h || front.wpos != last_p ||
          front.strand != last_s) {
        front.wpos = (int32_t)wid;
        out_hash[n_out] = front.hash;
        out_pos[n_out] = front.wpos;
        out_strand[n_out] = front.strand;
        last_h = front.hash;
        last_p = front.wpos;
        last_s = front.strand;
        have_last = true;
        n_out++;
      }
    }
  }
  return n_out;
}
