// Native host runtime for probly-search-tpu.
//
// The reference's indexing hot path is per-occurrence trie insertion in Rust
// (/root/reference/src/index.rs:119-157).  Here the host-side analogue —
// tokenize -> intern -> sorted term ids — runs as native code feeding the
// vectorized CSR packing (index/bulk.py).  The tokenizer reproduces the
// reference's conventions: split on the single space character, drop empty
// tokens (index.rs:100-110), byte-wise term ordering (Rust String Ord).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

struct TokenizeResult {
  // Occurrence stream (one entry per non-empty token, in document order).
  int32_t* term_ids;     // sorted-term id per occurrence
  int64_t n_tokens;
  int64_t* doc_token_counts;  // tokens per document [n_docs]
  // Sorted unique term table.
  char* terms_blob;      // '\0'-separated, lexicographic (byte-wise)
  int64_t terms_blob_len;
  int32_t* term_byte_lens;  // utf-8 byte length per term
  int64_t n_terms;
};

// Tokenize n_docs texts (concatenated in `blob`, doc d = bytes
// [offs[d], offs[d+1])), intern terms, return the occurrence stream with
// ids into the SORTED unique term table.
TokenizeResult* psearch_tokenize_index(const char* blob, const int64_t* offs,
                                       int64_t n_docs) {
  auto* res = new TokenizeResult();
  std::vector<int32_t> occ_ids;   // provisional (first-seen) ids
  std::vector<std::string_view> terms;  // first-seen order
  std::unordered_map<std::string_view, int32_t> intern;
  res->doc_token_counts = new int64_t[n_docs > 0 ? n_docs : 1];

  occ_ids.reserve((offs[n_docs] - offs[0]) / 5 + 8);
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* p = blob + offs[d];
    const char* end = blob + offs[d + 1];
    int64_t count = 0;
    while (p <= end) {
      const char* sp = static_cast<const char*>(
          memchr(p, ' ', static_cast<size_t>(end - p)));
      const char* tok_end = sp ? sp : end;
      if (tok_end > p) {  // drop empty tokens (index.rs:100-110)
        std::string_view term(p, static_cast<size_t>(tok_end - p));
        auto it = intern.find(term);
        int32_t id;
        if (it == intern.end()) {
          id = static_cast<int32_t>(terms.size());
          intern.emplace(term, id);
          terms.push_back(term);
        } else {
          id = it->second;
        }
        occ_ids.push_back(id);
        ++count;
      }
      if (!sp) break;
      p = sp + 1;
    }
    res->doc_token_counts[d] = count;
  }

  // Sort the term table byte-wise (== Rust String Ord == numpy U order for
  // valid UTF-8) and remap occurrence ids.
  const int64_t T = static_cast<int64_t>(terms.size());
  std::vector<int32_t> order(T);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return terms[a] < terms[b];
  });
  std::vector<int32_t> rank(T);
  for (int64_t i = 0; i < T; ++i) rank[order[i]] = static_cast<int32_t>(i);

  res->n_tokens = static_cast<int64_t>(occ_ids.size());
  res->term_ids = new int32_t[res->n_tokens > 0 ? res->n_tokens : 1];
  for (int64_t i = 0; i < res->n_tokens; ++i)
    res->term_ids[i] = rank[occ_ids[i]];

  int64_t blob_len = 0;
  for (auto& t : terms) blob_len += static_cast<int64_t>(t.size()) + 1;
  res->terms_blob = new char[blob_len > 0 ? blob_len : 1];
  res->term_byte_lens = new int32_t[T > 0 ? T : 1];
  char* w = res->terms_blob;
  for (int64_t i = 0; i < T; ++i) {
    std::string_view t = terms[order[i]];
    memcpy(w, t.data(), t.size());
    w += t.size();
    *w++ = '\0';
    res->term_byte_lens[i] = static_cast<int32_t>(t.size());
  }
  res->terms_blob_len = blob_len;
  res->n_terms = T;
  return res;
}

void psearch_free_result(TokenizeResult* res) {
  delete[] res->term_ids;
  delete[] res->doc_token_counts;
  delete[] res->terms_blob;
  delete[] res->term_byte_lens;
  delete res;
}

}  // extern "C"
