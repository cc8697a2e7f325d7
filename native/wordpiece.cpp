// Fast WordPiece batch tokenizer (C API, loaded via ctypes).
//
// Native counterpart of the host-side tokenization the reference delegates to
// HF's Rust tokenizers (SURVEY.md §2.2). Implements the same algorithm as the
// Python reference implementation in
// instacart_next_order_recommendation_tpu/tokenizer/wordpiece.py — BERT basic
// tokenization (ASCII lowercase, punctuation split, whitespace split) plus
// greedy longest-match-first WordPiece with "##" continuations — for ASCII
// text; the Python wrapper falls back to the pure-Python path for non-ASCII
// inputs so results are always identical.
//
// Build: g++ -O3 -shared -fPIC -o libwordpiece.so wordpiece.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, std::vector<int32_t>> word_cache;
  int32_t pad_id = 0, unk_id = 1, cls_id = 2, sep_id = 3;
  bool lowercase = true;
  int max_chars_per_word = 100;

  void wordpiece(const std::string& word, std::vector<int32_t>& out) {
    auto cached = word_cache.find(word);
    if (cached != word_cache.end()) {
      out.insert(out.end(), cached->second.begin(), cached->second.end());
      return;
    }
    std::vector<int32_t> ids;
    if ((int)word.size() > max_chars_per_word) {
      ids.push_back(unk_id);
    } else {
      size_t start = 0;
      std::string piece;
      while (start < word.size()) {
        size_t end = word.size();
        int32_t cur = -1;
        while (start < end) {
          piece.clear();
          if (start > 0) piece += "##";
          piece.append(word, start, end - start);
          auto it = vocab.find(piece);
          if (it != vocab.end()) {
            cur = it->second;
            break;
          }
          --end;
        }
        if (cur < 0) {
          ids.clear();
          ids.push_back(unk_id);
          break;
        }
        ids.push_back(cur);
        start = end;
      }
    }
    word_cache.emplace(word, ids);
    out.insert(out.end(), ids.begin(), ids.end());
  }

  // Returns the unpadded token count (capped at max_len).
  int encode(const char* text, int max_len, int32_t* ids_row, int32_t* mask_row) {
    std::vector<int32_t> ids;
    ids.reserve(max_len);
    ids.push_back(cls_id);

    std::string word;
    const unsigned char* p = reinterpret_cast<const unsigned char*>(text);
    bool truncated = false;
    auto flush_word = [&]() {
      if (!word.empty()) {
        wordpiece(word, ids);
        word.clear();
        if ((int)ids.size() >= max_len - 1) {
          ids.resize(max_len - 1);
          truncated = true;
        }
      }
    };
    for (; *p && !truncated; ++p) {
      unsigned char c = *p;
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v') {
        flush_word();
      } else if ((c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
                 (c >= 123 && c <= 126)) {
        flush_word();
        if (!truncated) {
          word.assign(1, (char)c);
          flush_word();
        }
      } else {
        word.push_back(lowercase && c >= 'A' && c <= 'Z' ? (char)(c + 32) : (char)c);
      }
    }
    flush_word();
    ids.push_back(sep_id);
    if ((int)ids.size() > max_len) ids.resize(max_len);

    int n = (int)ids.size();
    for (int i = 0; i < n; ++i) {
      ids_row[i] = ids[i];
      mask_row[i] = 1;
    }
    for (int i = n; i < max_len; ++i) {
      ids_row[i] = pad_id;
      mask_row[i] = 0;
    }
    // Guarantee the row ends with [SEP] even when truncated (parity with the
    // Python implementation, which appends SEP after slicing).
    if (n == max_len) ids_row[max_len - 1] = sep_id;
    return n;
  }
};

}  // namespace

extern "C" {

void* wp_create(const char** tokens, int32_t n, int32_t lowercase, int32_t pad_id,
                int32_t unk_id, int32_t cls_id, int32_t sep_id) {
  auto* t = new Tokenizer();
  t->vocab.reserve(n * 2);
  for (int32_t i = 0; i < n; ++i) t->vocab.emplace(tokens[i], i);
  t->lowercase = lowercase != 0;
  t->pad_id = pad_id;
  t->unk_id = unk_id;
  t->cls_id = cls_id;
  t->sep_id = sep_id;
  return t;
}

void wp_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encodes n_texts into row-major (n_rows, max_len) int32 buffers. Rows beyond
// n_texts are already zeroed by the caller. Returns the longest unpadded
// sequence length across the batch.
int32_t wp_encode_batch(void* handle, const char** texts, int32_t n_texts, int32_t max_len,
                        int32_t* out_ids, int32_t* out_mask) {
  auto* t = static_cast<Tokenizer*>(handle);
  int32_t longest = 2;
  for (int32_t i = 0; i < n_texts; ++i) {
    int n = t->encode(texts[i], max_len, out_ids + (int64_t)i * max_len,
                      out_mask + (int64_t)i * max_len);
    if (n > longest) longest = n;
  }
  return longest;
}

}  // extern "C"
