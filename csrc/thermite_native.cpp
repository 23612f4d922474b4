// thermite-tpu native host engine.
//
// Covers the host-side hot paths that the reference implements in Rust
// with native-speed crates (FM-index SMEM search, reference
// src/index.rs:228-255; suffix-array construction via libdivsufsort,
// src/index.rs:104): here re-designed as a k-mer anchor table + maximal
// extension + supermaximal-envelope selection, byte-identical in output
// to the Python engine in thermite_tpu/seed/smem.py (same algorithm,
// same canonical ordering).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C csrc  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxAnchorK = 13;  // 5^13 < 2^31

// byte -> base-5 code, 255 invalid (alphabet ACGTN, matching the
// reference FM alphabet "ACGNT" so N-N matches seed exactly)
struct CodeTable {
  uint8_t code[256];
  CodeTable() {
    std::memset(code, 255, sizeof(code));
    code['A'] = 0;
    code['C'] = 1;
    code['G'] = 2;
    code['T'] = 3;
    code['N'] = 4;
  }
};
const CodeTable kCodes;

struct SeedIndex {
  const uint8_t* text;  // borrowed; owner is the Python Index
  int64_t n;
  int k;
  // bucketed posting list sorted by key; positions ascending per bucket
  std::vector<int64_t> uniq_keys;
  std::vector<int64_t> offsets;
  std::vector<int64_t> positions;
};

int64_t pack_key(const uint8_t* s, int k, bool* valid) {
  int64_t key = 0;
  *valid = true;
  for (int t = 0; t < k; ++t) {
    uint8_t c = kCodes.code[s[t]];
    if (c == 255) {
      *valid = false;
      return 0;
    }
    key = key * 5 + c;
  }
  return key;
}

}  // namespace

extern "C" {

void* thermite_seed_index_new(const uint8_t* text, int64_t n, int k) {
  if (k < 1 || k > kMaxAnchorK) return nullptr;
  auto* idx = new SeedIndex();
  idx->text = text;
  idx->n = n;
  idx->k = k;

  std::vector<std::pair<int64_t, int64_t>> kv;
  kv.reserve(n > k ? n - k + 1 : 0);
  if (n >= k) {
    // rolling key with invalid-run tracking
    int64_t key = 0;
    int64_t pow_top = 1;
    for (int t = 0; t < k - 1; ++t) pow_top *= 5;
    int invalid_run = 0;  // number of invalid chars in current window
    // init first window
    for (int t = 0; t < k; ++t) {
      uint8_t c = kCodes.code[idx->text[t]];
      key = key * 5 + (c == 255 ? 0 : c);
      if (c == 255) invalid_run++;
    }
    // track invalidity with a count of invalid chars in window
    // (recompute incrementally)
    std::vector<uint8_t> inv(k, 0);
    for (int t = 0; t < k; ++t) inv[t] = kCodes.code[idx->text[t]] == 255;
    int inv_count = 0;
    for (int t = 0; t < k; ++t) inv_count += inv[t];
    if (inv_count == 0) kv.emplace_back(key, 0);
    for (int64_t i = 1; i + k <= n; ++i) {
      uint8_t c_out = kCodes.code[idx->text[i - 1]];
      uint8_t c_in = kCodes.code[idx->text[i + k - 1]];
      key -= (c_out == 255 ? 0 : c_out) * pow_top;
      key = key * 5 + (c_in == 255 ? 0 : c_in);
      inv_count -= (c_out == 255);
      inv_count += (c_in == 255);
      if (inv_count == 0) kv.emplace_back(key, i);
    }
  }
  std::sort(kv.begin(), kv.end());
  idx->positions.resize(kv.size());
  for (size_t i = 0; i < kv.size(); ++i) idx->positions[i] = kv[i].second;
  // bucket boundaries
  for (size_t i = 0; i < kv.size(); ++i) {
    if (i == 0 || kv[i].first != kv[i - 1].first) {
      idx->uniq_keys.push_back(kv[i].first);
      idx->offsets.push_back((int64_t)i);
    }
  }
  idx->offsets.push_back((int64_t)kv.size());
  return idx;
}

void thermite_seed_index_free(void* h) { delete static_cast<SeedIndex*>(h); }

int64_t thermite_seed_index_size(void* h) {
  return static_cast<SeedIndex*>(h)->positions.size();
}

// SMEM search for one read.  Returns the number of mems written, or
// -(required capacity) if out buffers are too small.
// Output arrays: (qpos, tpos, len) sorted by (-len, qpos, tpos).
int64_t thermite_smems(void* h, const uint8_t* read, int64_t rlen,
                       int64_t min_seed_len, int64_t* out_q, int64_t* out_t,
                       int64_t* out_len, int64_t cap) {
  auto* idx = static_cast<SeedIndex*>(h);
  const int k = idx->k;
  const uint8_t* text = idx->text;
  const int64_t n = idx->n;
  if (rlen < min_seed_len || rlen < k) return 0;

  // occurrence intervals: (diag, s_o, e_o, p_o), deduped per diagonal
  struct Occ {
    int64_t diag, s, e, p;
  };
  std::vector<Occ> occs;

  // pre-pass: total anchor hits, to size the dedupe table safely
  int64_t total_hits = 0;
  for (int64_t q = 0; q + k <= rlen; ++q) {
    bool valid;
    int64_t key = pack_key(read + q, k, &valid);
    if (!valid) continue;
    auto it = std::lower_bound(idx->uniq_keys.begin(), idx->uniq_keys.end(), key);
    if (it == idx->uniq_keys.end() || *it != key) continue;
    size_t b = it - idx->uniq_keys.begin();
    total_hits += idx->offsets[b + 1] - idx->offsets[b];
  }

  // per-diagonal coverage dedupe: remember last covered query end per
  // diagonal via a small hash map (open addressing)
  struct DiagCover {
    int64_t diag;
    int64_t qend;
  };
  size_t hcap = 64;
  while (hcap < (size_t)(total_hits + rlen) * 2) hcap <<= 1;
  std::vector<DiagCover> cover(hcap, {INT64_MIN, -1});
  auto covered_until = [&](int64_t diag) -> int64_t {
    size_t slot = ((uint64_t)diag * 0x9E3779B97F4A7C15ull) & (hcap - 1);
    while (cover[slot].diag != INT64_MIN) {
      if (cover[slot].diag == diag) return cover[slot].qend;
      slot = (slot + 1) & (hcap - 1);
    }
    return -1;
  };
  auto set_covered = [&](int64_t diag, int64_t qend) {
    size_t slot = ((uint64_t)diag * 0x9E3779B97F4A7C15ull) & (hcap - 1);
    while (cover[slot].diag != INT64_MIN && cover[slot].diag != diag)
      slot = (slot + 1) & (hcap - 1);
    cover[slot] = {diag, qend};
  };

  for (int64_t q = 0; q + k <= rlen; ++q) {
    bool valid;
    int64_t key = pack_key(read + q, k, &valid);
    if (!valid) continue;
    auto it = std::lower_bound(idx->uniq_keys.begin(), idx->uniq_keys.end(), key);
    if (it == idx->uniq_keys.end() || *it != key) continue;
    size_t b = it - idx->uniq_keys.begin();
    for (int64_t pi = idx->offsets[b]; pi < idx->offsets[b + 1]; ++pi) {
      int64_t p = idx->positions[pi];
      int64_t diag = p - q;
      if (covered_until(diag) >= q + k) continue;  // inside known run
      // maximal extension around the anchor
      int64_t l = 0;
      while (q - 1 - l >= 0 && p - 1 - l >= 0 &&
             read[q - 1 - l] == text[p - 1 - l])
        ++l;
      int64_t r = 0;
      while (q + k + r < rlen && p + k + r < n &&
             read[q + k + r] == text[p + k + r])
        ++r;
      int64_t s = q - l, e = q + k + r;
      occs.push_back({diag, s, e, p - l});
      set_covered(diag, e);
    }
  }

  // envelope P(s) = max e over intervals with s_o <= s
  std::vector<int64_t> env(rlen + 1, 0);
  for (const auto& o : occs) {
    if (o.e > env[o.s]) env[o.s] = o.e;
  }
  for (int64_t s = 1; s <= rlen; ++s)
    if (env[s - 1] > env[s]) env[s] = env[s - 1];

  // SMEM starts: envelope increases and length >= min_seed_len
  struct MemOut {
    int64_t q, t, len;
  };
  std::vector<MemOut> mems;
  int64_t prev = 0;
  for (int64_t s = 0; s < rlen; ++s) {
    int64_t e = env[s];
    if (e - s >= min_seed_len && e > prev) {
      for (const auto& o : occs) {
        if (o.s <= s && o.e >= e) mems.push_back({s, o.p + (s - o.s), e - s});
      }
    }
    if (env[s] > prev) prev = env[s];
  }

  std::sort(mems.begin(), mems.end(), [](const MemOut& a, const MemOut& b) {
    if (a.len != b.len) return a.len > b.len;
    if (a.q != b.q) return a.q < b.q;
    return a.t < b.t;
  });

  if ((int64_t)mems.size() > cap) return -(int64_t)mems.size();
  for (size_t i = 0; i < mems.size(); ++i) {
    out_q[i] = mems[i].q;
    out_t[i] = mems[i].t;
    out_len[i] = mems[i].len;
  }
  return (int64_t)mems.size();
}

}  // extern "C"
