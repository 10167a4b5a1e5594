// LSM index kernels: the C++ runtime under the fingerprint index.
//
// Role parity: the reference delegates posting storage to LMDB's C B-tree
// (via olaf_c; reference: audio-ident-service/app/audio/fingerprint.py:5-8).
// Our index is an LSM over flat arrays, and its host-side compaction
// (lexsort by (hash, track, time) + tombstone drop + CSR offsets build) is
// the runtime hot path at production scale — numpy's lexsort is ~10x
// slower than the radix merge here at 10^8 postings.
//
// Exposed via the C ABI for ctypes (no pybind11 in this image):
//   ai_sort_postings   : LSD radix sort by packed (hash, track, time)
//   ai_merge_postings  : merge sorted main + sorted delta, dropping
//                        tombstoned tracks, and build CSR offsets
//   ai_hamming_batch   : popcount similarity of one fingerprint vs N
//                        candidates (content dedup)
//
// Packing: key = hash(24b) << 38 | track(21b) << 17 | time(17b) -> 62 bits.
// Bounds are asserted by the Python caller (spec.py freezes them).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHashBits = 24;
constexpr int kTrackBits = 21;
constexpr int kTimeBits = 17;

inline uint64_t pack(uint32_t h, uint32_t track, uint32_t time) {
  return (static_cast<uint64_t>(h) << (kTrackBits + kTimeBits)) |
         (static_cast<uint64_t>(track) << kTimeBits) |
         static_cast<uint64_t>(time);
}

inline void unpack(uint64_t key, int32_t* h, int32_t* track, int32_t* time) {
  *time = static_cast<int32_t>(key & ((1u << kTimeBits) - 1));
  *track = static_cast<int32_t>((key >> kTimeBits) & ((1u << kTrackBits) - 1));
  *h = static_cast<int32_t>(key >> (kTrackBits + kTimeBits));
}

// 8-bit LSD radix sort over the low 62 bits (8 passes).
void radix_sort(std::vector<uint64_t>& keys) {
  const size_t n = keys.size();
  std::vector<uint64_t> tmp(n);
  uint64_t* src = keys.data();
  uint64_t* dst = tmp.data();
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    size_t count[257] = {0};
    for (size_t i = 0; i < n; ++i) count[((src[i] >> shift) & 0xFF) + 1]++;
    for (int b = 0; b < 256; ++b) count[b + 1] += count[b];
    for (size_t i = 0; i < n; ++i) dst[count[(src[i] >> shift) & 0xFF]++] = src[i];
    std::swap(src, dst);
  }
  // 8 passes = even number of swaps: result is back in keys.data()
  if (src != keys.data()) std::memcpy(keys.data(), src, n * sizeof(uint64_t));
}

}  // namespace

extern "C" {

// Sort postings in place by (hash, track, time).
void ai_sort_postings(int32_t* h, int32_t* track, int32_t* time, int64_t n) {
  std::vector<uint64_t> keys(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = pack(static_cast<uint32_t>(h[i]), static_cast<uint32_t>(track[i]),
                   static_cast<uint32_t>(time[i]));
  }
  radix_sort(keys);
  for (int64_t i = 0; i < n; ++i) unpack(keys[i], &h[i], &track[i], &time[i]);
}

// Merge two (hash,track,time)-sorted posting runs, dropping postings whose
// track is tombstoned, writing merged arrays + CSR offsets
// (int64[hash_space + 1]).  Returns the merged count.
int64_t ai_merge_postings(
    const int32_t* h_a, const int32_t* r_a, const int32_t* t_a, int64_t n_a,
    const int32_t* h_b, const int32_t* r_b, const int32_t* t_b, int64_t n_b,
    const uint8_t* track_valid, int64_t max_tracks,
    int64_t hash_space,
    int32_t* r_out, int32_t* t_out, int64_t* offsets_out) {
  std::memset(offsets_out, 0, sizeof(int64_t) * (hash_space + 1));
  int64_t ia = 0, ib = 0, out = 0;
  auto key_at = [](const int32_t* h, const int32_t* r, const int32_t* t,
                   int64_t i) {
    return pack(static_cast<uint32_t>(h[i]), static_cast<uint32_t>(r[i]),
                static_cast<uint32_t>(t[i]));
  };
  while (ia < n_a || ib < n_b) {
    bool take_a;
    if (ia >= n_a) take_a = false;
    else if (ib >= n_b) take_a = true;
    else take_a = key_at(h_a, r_a, t_a, ia) <= key_at(h_b, r_b, t_b, ib);
    int32_t h, r, t;
    if (take_a) { h = h_a[ia]; r = r_a[ia]; t = t_a[ia]; ++ia; }
    else        { h = h_b[ib]; r = r_b[ib]; t = t_b[ib]; ++ib; }
    if (r < 0 || r >= max_tracks || !track_valid[r]) continue;
    r_out[out] = r;
    t_out[out] = t;
    offsets_out[h + 1]++;
    ++out;
  }
  for (int64_t b = 0; b < hash_space; ++b) offsets_out[b + 1] += offsets_out[b];
  return out;
}

// CSR-walking variant of ai_merge_postings: the main run arrives as
// (offsets, track, time) — its per-posting hash is implied by the bucket
// being walked, so no hash array is ever materialized for it (round 1
// rebuilt one with np.repeat: a multi-GB allocation at 1M-track scale).
// The delta run is (hash, track, time)-sorted as before.
int64_t ai_merge_csr(
    const int64_t* offsets_a, const int32_t* r_a, const int32_t* t_a,
    const int32_t* h_b, const int32_t* r_b, const int32_t* t_b, int64_t n_b,
    const uint8_t* track_valid, int64_t max_tracks,
    int64_t hash_space,
    int32_t* r_out, int32_t* t_out, int64_t* offsets_out) {
  int64_t ib = 0, out = 0;
  auto rt = [](uint32_t r, uint32_t t) {
    return (static_cast<uint64_t>(r) << kTimeBits) | static_cast<uint64_t>(t);
  };
  offsets_out[0] = 0;
  for (int64_t h = 0; h < hash_space; ++h) {
    int64_t ia = offsets_a[h];
    const int64_t ea = offsets_a[h + 1];
    while (ia < ea || (ib < n_b && h_b[ib] == h)) {
      bool take_a;
      if (ia >= ea) take_a = false;
      else if (ib >= n_b || h_b[ib] != h) take_a = true;
      else take_a = rt(static_cast<uint32_t>(r_a[ia]), static_cast<uint32_t>(t_a[ia])) <=
                    rt(static_cast<uint32_t>(r_b[ib]), static_cast<uint32_t>(t_b[ib]));
      int32_t r, t;
      if (take_a) { r = r_a[ia]; t = t_a[ia]; ++ia; }
      else        { r = r_b[ib]; t = t_b[ib]; ++ib; }
      if (r < 0 || r >= max_tracks || !track_valid[r]) continue;
      r_out[out] = r;
      t_out[out] = t;
      ++out;
    }
    offsets_out[h + 1] = out;
  }
  return out;
}

// Hash-range slice of ai_merge_csr: merge buckets [h_lo, h_hi) of the main
// CSR with a (hash,track,time)-sorted delta slice covering exactly that
// range (absolute hash values).  Writes the range's postings from r_out[0]
// and the RELATIVE cumulative counts into offsets_out[h - h_lo] (the caller
// rebases by its running cursor).  Returns the range's output count.
//
// Running the compaction as K such passes bounds its working set: the
// caller gathers + sorts only one range's delta at a time and writes
// straight into the exact-size final arrays, so peak extra memory is the
// output generation plus one range's gather — not the 33.8 GB the r4
// whole-index flush+merge spiked at 864M postings (durability_r4.json).
int64_t ai_merge_csr_range(
    const int64_t* offsets_a, const int32_t* r_a, const int32_t* t_a,
    const int32_t* h_b, const int32_t* r_b, const int32_t* t_b, int64_t n_b,
    const uint8_t* track_valid, int64_t max_tracks,
    int64_t h_lo, int64_t h_hi,
    int32_t* r_out, int32_t* t_out, int64_t* offsets_out) {
  int64_t ib = 0, out = 0;
  auto rt = [](uint32_t r, uint32_t t) {
    return (static_cast<uint64_t>(r) << kTimeBits) | static_cast<uint64_t>(t);
  };
  for (int64_t h = h_lo; h < h_hi; ++h) {
    int64_t ia = offsets_a[h];
    const int64_t ea = offsets_a[h + 1];
    while (ia < ea || (ib < n_b && h_b[ib] == h)) {
      bool take_a;
      if (ia >= ea) take_a = false;
      else if (ib >= n_b || h_b[ib] != h) take_a = true;
      else take_a = rt(static_cast<uint32_t>(r_a[ia]), static_cast<uint32_t>(t_a[ia])) <=
                    rt(static_cast<uint32_t>(r_b[ib]), static_cast<uint32_t>(t_b[ib]));
      int32_t r, t;
      if (take_a) { r = r_a[ia]; t = t_a[ia]; ++ia; }
      else        { r = r_b[ib]; t = t_b[ib]; ++ib; }
      if (r < 0 || r >= max_tracks || !track_valid[r]) continue;
      r_out[out] = r;
      t_out[out] = t;
      ++out;
    }
    offsets_out[h - h_lo] = out;
  }
  return out;
}

// Count postings whose track survives the tombstone filter — lets the
// merge caller allocate EXACT-size outputs instead of main+delta upper
// bound + prefix copy (round 2's extra full-index copy was the biggest
// single slab in the measured 22.5 GB compaction spike at 576M postings).
int64_t ai_count_live(const int32_t* r, int64_t n,
                      const uint8_t* track_valid, int64_t max_tracks) {
  int64_t live = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t t = r[i];
    live += (t >= 0 && t < max_tracks && track_valid[t]) ? 1 : 0;
  }
  return live;
}

// Bitwise similarity of one uint32 fingerprint against n_cand candidates
// (concatenated, each cand_len words; compares the common prefix of each).
void ai_hamming_batch(
    const uint32_t* query, int64_t query_len,
    const uint32_t* cands, const int64_t* cand_lens, int64_t n_cand,
    double* sims_out) {
  int64_t off = 0;
  for (int64_t c = 0; c < n_cand; ++c) {
    const int64_t len = cand_lens[c];
    const int64_t n = query_len < len ? query_len : len;
    if (n == 0) { sims_out[c] = 0.0; off += len; continue; }
    int64_t diff = 0;
    for (int64_t i = 0; i < n; ++i) {
      diff += __builtin_popcount(query[i] ^ cands[off + i]);
    }
    sims_out[c] = 1.0 - static_cast<double>(diff) / (32.0 * n);
    off += len;
  }
}

}  // extern "C"
