// Native host-side data-path kernels for the TPU training framework.
//
// The accelerator side of this framework is pure XLA/Pallas; the host side
// (collation, masking, synthetic batch synthesis) is the part where the
// reference leaned on torch's C++ backend (tensor ops inside collators,
// src/data/vilt_data.py; pre-materialized torch datasets,
// src/benchmarking/data.py). These C implementations keep the input
// pipeline off the Python interpreter so collation never becomes the
// bottleneck at large batch sizes. Exposed via a plain C ABI and loaded
// with ctypes (no pybind11 in the image).
//
// Build: python -m multimodal_llm_pretraining_tpu.native.build

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// xorshift128+ -- deterministic, fast PRNG for synthetic batches
struct Rng {
  uint64_t s0, s1;
};

static inline uint64_t rng_next(Rng* r) {
  uint64_t x = r->s0;
  uint64_t const y = r->s1;
  r->s0 = y;
  x ^= x << 23;
  r->s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
  return r->s1 + y;
}

static inline Rng rng_seed(uint64_t seed) {
  Rng r{seed * 0x9E3779B97F4A7C15ULL + 1, seed ^ 0xD1B54A32D192ED03ULL};
  for (int i = 0; i < 8; i++) rng_next(&r);
  return r;
}

// Pad a ragged batch of int32 sequences into [batch, max_len] plus an
// attention mask. `flat` holds all tokens back to back; `offsets` has
// batch+1 entries. Truncates to max_len.
void pad_batch(const int32_t* flat, const int64_t* offsets, int64_t batch,
               int64_t max_len, int32_t pad_value, int32_t* out_ids,
               int32_t* out_mask) {
  for (int64_t b = 0; b < batch; b++) {
    const int64_t start = offsets[b];
    const int64_t len = std::min(offsets[b + 1] - start, max_len);
    int32_t* row = out_ids + b * max_len;
    int32_t* mrow = out_mask + b * max_len;
    std::memcpy(row, flat + start, len * sizeof(int32_t));
    for (int64_t i = len; i < max_len; i++) row[i] = pad_value;
    for (int64_t i = 0; i < len; i++) mrow[i] = 1;
    for (int64_t i = len; i < max_len; i++) mrow[i] = 0;
  }
}

// Whole-word masking (BERT style; mirrors the reference's
// _whole_word_mask, src/data/vilt_data.py:219-260). `word_ids` maps each
// token to its word index (-1 = special token, never masked); tokens of one
// word mask together. Writes 0/1 into out_mask.
void whole_word_mask(const int32_t* word_ids, int64_t num_tokens,
                     double mlm_probability, int64_t max_predictions,
                     uint64_t seed, int32_t* out_mask) {
  // group tokens into candidate words
  std::vector<std::pair<int32_t, int64_t>> starts;  // (word_id, start_tok)
  std::vector<int64_t> word_len;
  int32_t cur = -2;
  for (int64_t i = 0; i < num_tokens; i++) {
    if (word_ids[i] < 0) {
      cur = -2;
      continue;
    }
    if (word_ids[i] != cur) {
      starts.push_back({word_ids[i], i});
      word_len.push_back(1);
      cur = word_ids[i];
    } else {
      word_len.back()++;
    }
  }
  // shuffle candidate order (Fisher-Yates)
  Rng r = rng_seed(seed);
  std::vector<int64_t> order(starts.size());
  for (size_t i = 0; i < order.size(); i++) order[i] = (int64_t)i;
  for (int64_t i = (int64_t)order.size() - 1; i > 0; i--) {
    int64_t j = (int64_t)(rng_next(&r) % (uint64_t)(i + 1));
    std::swap(order[i], order[j]);
  }
  const int64_t target = std::min<int64_t>(
      max_predictions,
      std::max<int64_t>(1, (int64_t)(num_tokens * mlm_probability + 0.5)));
  std::memset(out_mask, 0, num_tokens * sizeof(int32_t));
  int64_t masked = 0;
  for (int64_t oi : order) {
    if (masked >= target) break;
    const int64_t len = word_len[oi];
    if (masked + len > target) continue;
    const int64_t s = starts[oi].second;
    for (int64_t i = 0; i < len; i++) out_mask[s + i] = 1;
    masked += len;
  }
}

// Synthetic causal-LM batch: random token ids in [0, vocab), deterministic
// in (seed). Replaces per-batch numpy Generator calls on the hot path.
void random_lm_batch(uint64_t seed, int32_t vocab, int64_t batch,
                     int64_t seq_len, int32_t* out_ids) {
  Rng r = rng_seed(seed);
  const int64_t n = batch * seq_len;
  for (int64_t i = 0; i < n; i++) {
    out_ids[i] = (int32_t)(rng_next(&r) % (uint64_t)vocab);
  }
}

// MLM corruption: mask ~prob of tokens, writing corrupted ids and labels
// (-100 on unmasked) in one pass.
void mlm_corrupt(const int32_t* ids, int64_t n, double prob,
                 int32_t mask_token, uint64_t seed, int32_t* out_ids,
                 int32_t* out_labels) {
  Rng r = rng_seed(seed);
  const uint64_t threshold = (uint64_t)(prob * 18446744073709551615.0);
  for (int64_t i = 0; i < n; i++) {
    if (rng_next(&r) < threshold) {
      out_ids[i] = mask_token;
      out_labels[i] = ids[i];
    } else {
      out_ids[i] = ids[i];
      out_labels[i] = -100;
    }
  }
}

}  // extern "C"
