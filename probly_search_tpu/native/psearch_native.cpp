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

// ------------------------------------------------------------------------
// One-shot CSR builder (single field): tokenize + intern + per-(term, doc)
// term frequencies + CSR pack, all in one native pass.  Replaces the
// vectorized-numpy pair counting (8M-element packed sorts measured ~10 s
// per 1M docs on this host's single core) with O(tokens + postings) work:
// per-doc counting against a last-seen-doc array, then a counting-sort
// scatter by term.  Pairs are emitted in document order, so within each
// term the scatter preserves ascending doc ids — the CSR invariant the
// device merge relies on (index/segment.py build_segment).

struct CsrResult {
  // Sorted unique term table (as in TokenizeResult).
  char* terms_blob;
  int64_t terms_blob_len;
  int32_t* term_byte_lens;
  int64_t n_terms;
  // CSR postings over sorted term ids.
  int64_t* offsets;   // [n_terms + 1]
  int32_t* post_doc;  // [n_postings] — doc index within the batch
  int32_t* post_tf;   // [n_postings]
  int64_t n_postings;
  int64_t* doc_token_counts;  // [n_docs]
};

CsrResult* psearch_tokenize_csr(const char* blob, const int64_t* offs,
                                int64_t n_docs) {
  auto* res = new CsrResult();
  std::vector<std::string_view> terms;  // first-seen order
  std::unordered_map<std::string_view, int32_t> intern;
  res->doc_token_counts = new int64_t[n_docs > 0 ? n_docs : 1];

  // Pair stream in doc order: (first-seen term id, doc, tf).
  std::vector<int32_t> pair_term, pair_doc, pair_tf;
  std::vector<int32_t> last_doc;   // per first-seen term id
  std::vector<int32_t> tf_local;   // per first-seen term id
  std::vector<int32_t> touched;
  pair_term.reserve((offs[n_docs] - offs[0]) / 8 + 8);

  for (int64_t d = 0; d < n_docs; ++d) {
    const char* p = blob + offs[d];
    const char* end = blob + offs[d + 1];
    int64_t count = 0;
    touched.clear();
    while (p <= end) {
      const char* sp = static_cast<const char*>(
          memchr(p, ' ', static_cast<size_t>(end - p)));
      const char* tok_end = sp ? sp : end;
      if (tok_end > p) {
        std::string_view term(p, static_cast<size_t>(tok_end - p));
        auto it = intern.find(term);
        int32_t id;
        if (it == intern.end()) {
          id = static_cast<int32_t>(terms.size());
          intern.emplace(term, id);
          terms.push_back(term);
          last_doc.push_back(-1);
          tf_local.push_back(0);
        } else {
          id = it->second;
        }
        if (last_doc[id] != static_cast<int32_t>(d)) {
          last_doc[id] = static_cast<int32_t>(d);
          tf_local[id] = 1;
          touched.push_back(id);
        } else {
          ++tf_local[id];
        }
        ++count;
      }
      if (!sp) break;
      p = sp + 1;
    }
    res->doc_token_counts[d] = count;
    for (int32_t id : touched) {
      pair_term.push_back(id);
      pair_doc.push_back(static_cast<int32_t>(d));
      pair_tf.push_back(tf_local[id]);
    }
  }

  // Sorted term table + first-seen-id -> rank remap.
  const int64_t T = static_cast<int64_t>(terms.size());
  std::vector<int32_t> order(T);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return terms[a] < terms[b];
  });
  std::vector<int32_t> rank(T);
  for (int64_t i = 0; i < T; ++i) rank[order[i]] = static_cast<int32_t>(i);

  // Counting-sort scatter by sorted term id (doc order preserved per term).
  const int64_t P = static_cast<int64_t>(pair_term.size());
  res->offsets = new int64_t[T + 1]();
  for (int64_t i = 0; i < P; ++i) ++res->offsets[rank[pair_term[i]] + 1];
  for (int64_t t = 0; t < T; ++t) res->offsets[t + 1] += res->offsets[t];
  res->post_doc = new int32_t[P > 0 ? P : 1];
  res->post_tf = new int32_t[P > 0 ? P : 1];
  std::vector<int64_t> cursor(res->offsets, res->offsets + T);
  for (int64_t i = 0; i < P; ++i) {
    const int64_t pos = cursor[rank[pair_term[i]]]++;
    res->post_doc[pos] = pair_doc[i];
    res->post_tf[pos] = pair_tf[i];
  }
  res->n_postings = P;

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

void psearch_free_csr(CsrResult* res) {
  delete[] res->terms_blob;
  delete[] res->term_byte_lens;
  delete[] res->offsets;
  delete[] res->post_doc;
  delete[] res->post_tf;
  delete[] res->doc_token_counts;
  delete res;
}

}  // extern "C"
