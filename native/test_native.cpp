// Sanitizer test driver for libvectorian_native (run under ASAN via
// `make -C native check-asan`).  Exercises every C-ABI entry point with
// randomized and adversarial inputs — multi-byte UTF-8, empty words,
// zero-length slices, boundary lengths — so address errors in the
// byte-crunching paths surface before ctypes ever touches them.
// (The reference treats ASAN as first-class: setup.py:38-52.)

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
uint32_t vn_ft_hash(const char* s, int64_t len);
void vn_ft_encode_batch(const char* words, const int64_t* offsets,
                        const int64_t* word_rows, int64_t n_words,
                        const float* matrix, int64_t rows, int64_t dim,
                        int64_t nwords, int64_t bucket, int32_t minn,
                        int32_t maxn, float* out);
void* vn_lexicon_new();
void vn_lexicon_free(void* h);
int64_t vn_lexicon_size(void* h);
void vn_lexicon_add_many(void* h, const char* words, const int64_t* offsets,
                         int64_t n_words, int32_t* out_ids);
void vn_lexicon_lookup_many(void* h, const char* words,
                            const int64_t* offsets, int64_t n_words,
                            int32_t* out_ids);
int64_t vn_lexicon_get(void* h, int64_t i, char* buf, int64_t buf_len);
void vn_pack_fill(const int32_t* flat_tok, const int8_t* flat_pos,
                  const int16_t* flat_tag, const int64_t* starts,
                  const int32_t* lens, int64_t n, int64_t cap,
                  int32_t* out_tok, int8_t* out_pos, int16_t* out_tag);
void vn_traceback_affine_batch(
    const float* H, const float* S, const int32_t* len_s,
    const int32_t* len_t, int64_t B, int64_t S1, int64_t T1, int64_t Ls,
    int64_t Lt, double open_s, double extend_s, double open_t,
    double extend_t, int locality, const int32_t* end_cells,
    int32_t* mapping);
void vn_traceback_general_batch(
    const float* H, const float* S, const int32_t* len_s,
    const int32_t* len_t, int64_t B, int64_t S1, int64_t T1, int64_t Ls,
    int64_t Lt, const float* w_s, const float* w_t, int locality,
    const int32_t* end_cells, int32_t* mapping);
int vn_emd(const double* a, const double* b, const double* C, int64_t n1,
           int64_t n2, double* flow, double* cost_out);
void vn_emd_batch(const double* a, const double* b, const double* C,
                  const int64_t* n1s, const int64_t* n2s,
                  const int64_t* a_off, const int64_t* b_off,
                  const int64_t* c_off, int64_t B, int64_t n_threads,
                  double* flow, double* costs, int32_t* rcs);
}

namespace {

std::mt19937 g_rng(12345);

// Random UTF-8 word mixing 1..4-byte sequences.
std::string random_word(int max_chars) {
  static const char* pool[] = {
      "a", "z", "Q", "9",  "\xC3\xA9" /* é */, "\xC3\x9F" /* ß */,
      "\xE6\x97\xA5" /* 日 */, "\xE2\x82\xAC" /* € */,
      "\xF0\x9F\x98\x80" /* emoji */, "\xCC\x81" /* combining accent */,
  };
  std::uniform_int_distribution<int> n_chars(0, max_chars);
  std::uniform_int_distribution<int> pick(0, 9);
  std::string w;
  const int n = n_chars(g_rng);
  for (int i = 0; i < n; i++) w += pool[pick(g_rng)];
  return w;
}

void pack(const std::vector<std::string>& words, std::string* blob,
          std::vector<int64_t>* offsets) {
  blob->clear();
  offsets->clear();
  offsets->push_back(0);
  for (const auto& w : words) {
    blob->append(w);
    offsets->push_back(static_cast<int64_t>(blob->size()));
  }
}

void test_hash() {
  // stability across calls + multi-byte input touches every byte
  const std::string s = "caf\xC3\xA9\xF0\x9F\x98\x80";
  assert(vn_ft_hash(s.data(), s.size()) == vn_ft_hash(s.data(), s.size()));
  assert(vn_ft_hash(s.data(), 0) == 2166136261u);
}

void test_encode_batch() {
  const int64_t dim = 16, nwords = 8, bucket = 64;
  const int64_t rows = nwords + bucket;
  std::vector<float> matrix(rows * dim);
  std::uniform_real_distribution<float> u(-1.f, 1.f);
  for (auto& x : matrix) x = u(g_rng);

  for (int round_ = 0; round_ < 50; round_++) {
    std::vector<std::string> words;
    std::vector<int64_t> word_rows;
    words.push_back("");          // empty word
    words.push_back("</s>");      // EOS sentinel: no ngrams
    words.push_back("a");         // single char
    words.push_back(random_word(12));
    words.push_back(random_word(1));
    for (int i = 0; i < 20; i++) words.push_back(random_word(8));
    std::uniform_int_distribution<int64_t> row(-1, nwords - 1);
    for (size_t i = 0; i < words.size(); i++) word_rows.push_back(row(g_rng));

    std::string blob;
    std::vector<int64_t> offsets;
    pack(words, &blob, &offsets);
    std::vector<float> out(words.size() * dim, 1e30f);
    vn_ft_encode_batch(blob.data(), offsets.data(), word_rows.data(),
                       static_cast<int64_t>(words.size()), matrix.data(),
                       rows, dim, nwords, bucket, /*minn=*/1, /*maxn=*/6,
                       out.data());
    for (float x : out) assert(x > -1e6f && x < 1e6f);  // all written
    // minn > word length: only the word row contributes (or zeros)
    vn_ft_encode_batch(blob.data(), offsets.data(), word_rows.data(),
                       static_cast<int64_t>(words.size()), matrix.data(),
                       rows, dim, nwords, bucket, /*minn=*/3, /*maxn=*/3,
                       out.data());
  }
}

void test_lexicon() {
  void* h = vn_lexicon_new();
  std::vector<std::string> words;
  for (int i = 0; i < 500; i++) words.push_back(random_word(10));
  words.push_back(std::string(4096, 'x'));  // long string
  words.push_back("");                      // empty string interned too

  std::string blob;
  std::vector<int64_t> offsets;
  pack(words, &blob, &offsets);
  std::vector<int32_t> ids(words.size());
  vn_lexicon_add_many(h, blob.data(), offsets.data(),
                      static_cast<int64_t>(words.size()), ids.data());
  std::vector<int32_t> ids2(words.size());
  vn_lexicon_lookup_many(h, blob.data(), offsets.data(),
                         static_cast<int64_t>(words.size()), ids2.data());
  for (size_t i = 0; i < words.size(); i++) {
    assert(ids[i] == ids2[i] && ids[i] > 0);
    // round-trip through vn_lexicon_get (query size, then copy)
    const int64_t n = vn_lexicon_get(h, ids[i], nullptr, 0);
    assert(n == static_cast<int64_t>(words[i].size()));
    std::vector<char> buf(n > 0 ? n : 1);
    vn_lexicon_get(h, ids[i], buf.data(), n);
    assert(std::memcmp(buf.data(), words[i].data(), n) == 0);
  }
  // out-of-range ids: -1, no crash
  assert(vn_lexicon_get(h, -1, nullptr, 0) == -1);
  assert(vn_lexicon_get(h, 1 << 20, nullptr, 0) == -1);
  // unknown lookups: -1
  std::vector<std::string> unknown = {"zz-never-interned-zz"};
  pack(unknown, &blob, &offsets);
  std::vector<int32_t> uid(1);
  vn_lexicon_lookup_many(h, blob.data(), offsets.data(), 1, uid.data());
  assert(uid[0] == -1);
  vn_lexicon_free(h);
}

void test_pack_fill() {
  std::uniform_int_distribution<int> cap_d(1, 32);
  for (int round_ = 0; round_ < 50; round_++) {
    const int64_t cap = cap_d(g_rng);
    const int64_t n = 64;
    std::vector<int32_t> lens(n);
    std::vector<int64_t> starts(n);
    int64_t total = 0;
    std::uniform_int_distribution<int> len_d(0, static_cast<int>(cap));
    for (int64_t i = 0; i < n; i++) {
      lens[i] = len_d(g_rng);  // includes 0 and cap boundaries
      starts[i] = total;
      total += lens[i];
    }
    std::vector<int32_t> ft(total ? total : 1);
    std::vector<int8_t> fp(total ? total : 1);
    std::vector<int16_t> fg(total ? total : 1);
    for (int64_t i = 0; i < total; i++) {
      ft[i] = static_cast<int32_t>(i);
      fp[i] = static_cast<int8_t>(i & 0x7F);
      fg[i] = static_cast<int16_t>(i & 0x7FFF);
    }
    std::vector<int32_t> ot(n * cap, 0);
    std::vector<int8_t> op(n * cap, 0);
    std::vector<int16_t> og(n * cap, 0);
    vn_pack_fill(ft.data(), fp.data(), fg.data(), starts.data(), lens.data(),
                 n, cap, ot.data(), op.data(), og.data());
    for (int64_t i = 0; i < n; i++)
      for (int64_t j = 0; j < lens[i]; j++)
        assert(ot[i * cap + j] == static_cast<int32_t>(starts[i] + j));
  }
}

void test_traceback() {
  // fuzz every locality over random quantized DP-like matrices: bounds
  // under ASAN + mappings stay in range (bit-parity vs python is covered
  // by tests/test_native_traceback.py)
  std::uniform_int_distribution<int> q(0, 19);
  for (int trial = 0; trial < 8; trial++) {
    const int64_t B = 12, Ls = 9, Lt = 6, S1 = Ls + 1, T1 = Lt + 1;
    std::vector<float> H(B * S1 * T1), S(B * Ls * Lt);
    for (auto& v : S) v = static_cast<float>(q(g_rng)) / 19.0f;
    for (auto& v : H) v = static_cast<float>(q(g_rng)) / 7.0f - 0.5f;
    std::vector<int32_t> ls(B), lt(B), map(B * Lt, 0);
    for (int64_t b = 0; b < B; b++) {
      ls[b] = 1 + static_cast<int32_t>(q(g_rng)) % Ls;
      lt[b] = 1 + static_cast<int32_t>(q(g_rng)) % Lt;
    }
    for (int loc = 0; loc < 3; loc++) {
      vn_traceback_affine_batch(H.data(), S.data(), ls.data(), lt.data(), B,
                                S1, T1, Ls, Lt, 0.3, 0.1, 0.2, 0.05, loc,
                                nullptr, map.data());
      for (int64_t b = 0; b < B; b++)
        for (int64_t j = 0; j < Lt; j++)
          assert(map[b * Lt + j] >= -1 && map[b * Lt + j] < ls[b]);
      std::vector<float> ws(S1), wt(T1);
      for (int64_t k = 0; k < S1; k++) ws[k] = 0.15f * k;
      for (int64_t k = 0; k < T1; k++) wt[k] = 0.2f * k;
      vn_traceback_general_batch(H.data(), S.data(), ls.data(), lt.data(), B,
                                 S1, T1, Ls, Lt, ws.data(), wt.data(), loc,
                                 nullptr, map.data());
      for (int64_t b = 0; b < B; b++)
        for (int64_t j = 0; j < Lt; j++)
          assert(map[b * Lt + j] >= -1 && map[b * Lt + j] < ls[b]);
    }
  }
}

void test_emd() {
  std::mt19937 rng(11);
  std::uniform_real_distribution<double> u(0.0, 1.0);
  for (int trial = 0; trial < 200; trial++) {
    const int n1 = 1 + static_cast<int>(rng() % 13);
    const int n2 = 1 + static_cast<int>(rng() % 13);
    std::vector<double> a(n1), b(n2), C(n1 * n2), flow(n1 * n2);
    double sa = 0, sb = 0;
    for (auto& x : a) sa += (x = u(rng));
    for (auto& x : b) sb += (x = u(rng));
    const bool balanced = trial % 3 != 0;
    if (balanced) {
      for (auto& x : b) x *= sa / sb;
      sb = sa;
    }
    for (auto& x : C)
      x = (trial % 4 == 0) ? std::floor(u(rng) * 10) / 10 : u(rng) * 2;
    double cost = -1;
    const int rc =
        vn_emd(a.data(), b.data(), C.data(), n1, n2, flow.data(), &cost);
    if (!balanced && std::fabs(sa - sb) > 1e-9 * (sa > sb ? sa : sb)) {
      assert(rc != 0);  // unbalanced instances are rejected, not solved
      continue;
    }
    assert(rc == 0);
    assert(cost >= -1e-12);
    // marginal feasibility + non-negativity of the returned flow
    for (int i = 0; i < n1; i++) {
      double r = 0;
      for (int j = 0; j < n2; j++) {
        assert(flow[i * n2 + j] >= -1e-12);
        r += flow[i * n2 + j];
      }
      assert(std::fabs(r - a[i]) <= 1e-9);
    }
  }
}

}  // namespace


// Threaded batch == sequential per-problem solves, bit-for-bit.
void test_emd_batch() {
  std::mt19937 rng(77);
  std::uniform_real_distribution<double> u(0.05, 1.0);
  const int B = 64;
  std::vector<int64_t> n1s(B), n2s(B), a_off(B), b_off(B), c_off(B);
  int64_t ta = 0, tb = 0, tc = 0;
  for (int k = 0; k < B; k++) {
    n1s[k] = 2 + (rng() % 10);
    n2s[k] = 2 + (rng() % 10);
    a_off[k] = ta; b_off[k] = tb; c_off[k] = tc;
    ta += n1s[k]; tb += n2s[k]; tc += n1s[k] * n2s[k];
  }
  std::vector<double> a(ta), b(tb), C(tc), flow(tc), costs(B);
  std::vector<int32_t> rcs(B);
  for (int k = 0; k < B; k++) {
    double sa = 0, sb = 0;
    for (int64_t i = 0; i < n1s[k]; i++) sa += (a[a_off[k] + i] = u(rng));
    for (int64_t j = 0; j < n2s[k]; j++) sb += (b[b_off[k] + j] = u(rng));
    for (int64_t j = 0; j < n2s[k]; j++) b[b_off[k] + j] *= sa / sb;
    for (int64_t m = 0; m < n1s[k] * n2s[k]; m++) C[c_off[k] + m] = u(rng);
  }
  for (int64_t nt : {int64_t(1), int64_t(4), int64_t(0)}) {
    vn_emd_batch(a.data(), b.data(), C.data(), n1s.data(), n2s.data(),
                 a_off.data(), b_off.data(), c_off.data(), B, nt,
                 flow.data(), costs.data(), rcs.data());
    for (int k = 0; k < B; k++) {
      assert(rcs[k] == 0);
      std::vector<double> f1(n1s[k] * n2s[k]);
      double c1 = -1;
      const int rc = vn_emd(a.data() + a_off[k], b.data() + b_off[k],
                            C.data() + c_off[k], n1s[k], n2s[k], f1.data(),
                            &c1);
      assert(rc == 0);
      assert(std::fabs(costs[k] - c1) <= 1e-12);
      for (int64_t m = 0; m < n1s[k] * n2s[k]; m++)
        assert(flow[c_off[k] + m] == f1[m]);
    }
  }
}

int main() {
  test_hash();
  test_encode_batch();
  test_lexicon();
  test_pack_fill();
  test_traceback();
  test_emd();
  test_emd_batch();
  std::printf("native sanitizer tests: OK\n");
  return 0;
}
