// Native host library for vectorian_tpu.
//
// TPU-native equivalent of the reference's C++ host-side hot paths
// (reference: vectorian/core/cpp/vocabulary.h string-interning arena,
// embedding/token/fasttext.py ngram encoding): byte-crunching work the
// CPython interpreter is slow at, exposed through a plain C ABI consumed
// via ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libvectorian_native.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- fastText

// FNV-1a 32-bit over sign-extended bytes (upstream fastText Dictionary::hash
// XORs int8_t values).
static inline uint32_t ft_hash(const char* s, int64_t len) {
  uint32_t h = 2166136261u;
  for (int64_t i = 0; i < len; i++) {
    h ^= static_cast<uint32_t>(static_cast<int8_t>(s[i]));
    h *= 16777619u;
  }
  return h;
}

uint32_t vn_ft_hash(const char* s, int64_t len) { return ft_hash(s, len); }

// Sum fastText subword rows for a batch of words.
//
// words: concatenated utf-8 bytes; offsets[i]..offsets[i+1] delimit word i
// (n_words+1 offsets).  word_row[i]: row of the full word in the input
// matrix, or -1 if OOV.  matrix: [rows, dim] float32 (nwords + bucket).
// out: [n_words, dim] float32 — the *mean* of word row + ngram rows.
void vn_ft_encode_batch(
    const char* words, const int64_t* offsets, const int64_t* word_rows,
    int64_t n_words, const float* matrix, int64_t rows, int64_t dim,
    int64_t nwords, int64_t bucket, int32_t minn, int32_t maxn,
    float* out) {
  std::string buf;
  for (int64_t w = 0; w < n_words; w++) {
    const char* word = words + offsets[w];
    const int64_t wlen = offsets[w + 1] - offsets[w];
    float* dst = out + w * dim;
    std::memset(dst, 0, sizeof(float) * dim);

    int64_t count = 0;
    if (word_rows[w] >= 0) {
      const float* src = matrix + word_rows[w] * dim;
      for (int64_t d = 0; d < dim; d++) dst[d] += src[d];
      count++;
    }
    if (maxn > 0 && !(wlen == 4 && std::memcmp(word, "</s>", 4) == 0)) {
      buf.clear();
      buf.push_back('<');
      buf.append(word, wlen);
      buf.push_back('>');
      const int64_t n = static_cast<int64_t>(buf.size());
      // iterate utf-8 aware: ngrams start at non-continuation bytes
      for (int64_t i = 0; i < n; i++) {
        if ((buf[i] & 0xC0) == 0x80) continue;  // utf-8 continuation
        std::string ngram;
        int64_t j = i;
        int32_t chars = 0;
        while (j < n && chars < maxn) {
          ngram.push_back(buf[j]);
          j++;
          while (j < n && (buf[j] & 0xC0) == 0x80) {
            ngram.push_back(buf[j]);
            j++;
          }
          chars++;
          // fastText computeSubwords: only 1-char EDGE ngrams are excluded
          // (the bare '<'/'>'); the full '<word>' ngram is included
          if (chars >= minn && !(chars == 1 && (i == 0 || j == n))) {
            const int64_t row =
                nwords + (ft_hash(ngram.data(), ngram.size()) % bucket);
            const float* src = matrix + row * dim;
            for (int64_t d = 0; d < dim; d++) dst[d] += src[d];
            count++;
          }
        }
      }
    }
    if (count > 0) {
      const float inv = 1.0f / static_cast<float>(count);
      for (int64_t d = 0; d < dim; d++) dst[d] *= inv;
    }
  }
}

// ---------------------------------------------------------------- interning

// A simple string-interning lexicon (reference vocabulary.h StringStorage +
// LexiconImpl).  Handle-based for ctypes.
struct Lexicon {
  std::unordered_map<std::string, int32_t> to_id;
  std::vector<std::string> strings;
};

void* vn_lexicon_new() {
  auto* lex = new Lexicon();
  lex->to_id.reserve(1 << 16);
  lex->strings.emplace_back("<pad>");
  lex->to_id.emplace("<pad>", 0);
  return lex;
}

void vn_lexicon_free(void* h) { delete static_cast<Lexicon*>(h); }

int64_t vn_lexicon_size(void* h) {
  return static_cast<int64_t>(static_cast<Lexicon*>(h)->strings.size());
}

// Intern a batch of words (concatenated bytes + offsets); writes int32 ids.
void vn_lexicon_add_many(void* h, const char* words, const int64_t* offsets,
                         int64_t n_words, int32_t* out_ids) {
  auto* lex = static_cast<Lexicon*>(h);
  for (int64_t w = 0; w < n_words; w++) {
    std::string s(words + offsets[w], offsets[w + 1] - offsets[w]);
    auto it = lex->to_id.find(s);
    if (it == lex->to_id.end()) {
      const int32_t id = static_cast<int32_t>(lex->strings.size());
      lex->strings.push_back(s);
      it = lex->to_id.emplace(std::move(s), id).first;
    }
    out_ids[w] = it->second;
  }
}

// Lookup without interning; -1 for unknown.
void vn_lexicon_lookup_many(void* h, const char* words, const int64_t* offsets,
                            int64_t n_words, int32_t* out_ids) {
  auto* lex = static_cast<Lexicon*>(h);
  for (int64_t w = 0; w < n_words; w++) {
    std::string s(words + offsets[w], offsets[w + 1] - offsets[w]);
    auto it = lex->to_id.find(s);
    out_ids[w] = (it == lex->to_id.end()) ? -1 : it->second;
  }
}

// ---------------------------------------------------------------- packing

// Fill padded, length-bucketed slice matrices from flat per-corpus arrays
// (the reference's Spans::iterate + unpack_tokens hot loop,
// document.h:147-169 + vocabulary.cpp:8-54, as straight memcpy rows).
//
// flat_*: concatenated per-document token columns; starts[i] is slice i's
// absolute offset into them, lens[i] its token count (<= cap).  out_* are
// zero-initialised [n, cap] row-major buffers.
void vn_pack_fill(const int32_t* flat_tok, const int8_t* flat_pos,
                  const int16_t* flat_tag, const int64_t* starts,
                  const int32_t* lens, int64_t n, int64_t cap,
                  int32_t* out_tok, int8_t* out_pos, int16_t* out_tag) {
  for (int64_t i = 0; i < n; i++) {
    const int64_t s = starts[i];
    const int64_t l = lens[i];
    std::memcpy(out_tok + i * cap, flat_tok + s, sizeof(int32_t) * l);
    std::memcpy(out_pos + i * cap, flat_pos + s, sizeof(int8_t) * l);
    std::memcpy(out_tag + i * cap, flat_tag + s, sizeof(int16_t) * l);
  }
}

// Copy string i into buf (returns length; buf may be null to query size).
int64_t vn_lexicon_get(void* h, int64_t i, char* buf, int64_t buf_len) {
  auto* lex = static_cast<Lexicon*>(h);
  if (i < 0 || i >= static_cast<int64_t>(lex->strings.size())) return -1;
  const std::string& s = lex->strings[i];
  if (buf != nullptr) {
    const int64_t n =
        std::min<int64_t>(buf_len, static_cast<int64_t>(s.size()));
    std::memcpy(buf, s.data(), n);
  }
  return static_cast<int64_t>(s.size());
}

}  // extern "C"
