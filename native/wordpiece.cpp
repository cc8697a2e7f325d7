// Fast WordPiece batch tokenizer (C API, loaded via ctypes).
//
// Native counterpart of the host-side tokenization the reference delegates to
// HF's Rust tokenizers (SURVEY.md §2.2). Implements the same algorithm as the
// Python reference implementation in
// instacart_next_order_recommendation_tpu/tokenizer/wordpiece.py — BERT basic
// tokenization (clean text, CJK per-character split, per-char lowercase +
// NFD accent strip, punctuation split) plus greedy longest-match-first
// WordPiece with "##" continuations.
//
// Unicode handling is table-driven: the Python wrapper generates, from its
// own `unicodedata`, (a) a 64K classification table (space / punct / drop /
// CJK / bail flags), (b) a per-codepoint transform table for the
// NFC -> lowercase -> NFD-strip-accents pipeline (single-codepoint results
// inline, multi-codepoint results in an exceptions list), and (c) run-length
// class ranges for astral codepoints. Codepoints whose behavior is context
// sensitive (nonzero combining class, transforms that change character
// class) are flagged BAIL: encode() returns -1 for rows containing them and
// the wrapper re-encodes those rows in pure Python — outputs are therefore
// identical to the Python path for ALL inputs, by construction.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libwordpiece.so wordpiece.cpp

#include <cstdint>
#include <cstring>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint8_t kSpace = 1;
constexpr uint8_t kPunct = 2;
constexpr uint8_t kDrop = 4;
constexpr uint8_t kCjk = 8;
constexpr uint8_t kBail = 16;

constexpr int32_t kXformInline = -3;  // sentinel base; values >= 0 are codepoints
constexpr int32_t kXformMulti = -1;   // look up exceptions list
constexpr int32_t kXformEmpty = -2;   // transform output is empty

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, std::vector<int32_t>> word_cache;
  // ctypes releases the GIL for the duration of wp_encode_batch, and one
  // handle is shared across serve threads / the precompile pool — the memo
  // is the only mutable state, so guard it (shared lock on the hot hit
  // path, exclusive only for insert/clear).
  mutable std::shared_mutex cache_mu;
  // Bounded memo (mirrors the Python path's cap): serving tokenizes
  // arbitrary free text, and an uncapped cache grows RSS without limit.
  // On overflow the memo resets; the working vocabulary re-fills it fast.
  static constexpr size_t kWordCacheMax = 262144;
  int32_t pad_id = 0, unk_id = 1, cls_id = 2, sep_id = 3;
  int max_chars_per_word = 100;

  // Unicode tables (owned copies of the numpy buffers passed at create).
  std::vector<uint8_t> flags;        // [65536] class flags
  std::vector<int32_t> xform;        // [65536] transform: cp | kXform*
  std::unordered_map<int32_t, std::vector<int32_t>> exceptions;  // cp -> cps
  std::vector<int32_t> astral_starts;  // sorted run starts (>= 0x10000)
  std::vector<uint8_t> astral_class;   // flag byte per run

  uint8_t classify(int32_t cp) const {
    if (cp < 0x10000) return flags[cp];
    // Binary search the astral runs.
    size_t lo = 0, hi = astral_starts.size();
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      if (astral_starts[mid] <= cp) lo = mid + 1; else hi = mid;
    }
    if (lo == 0) return kBail;
    return astral_class[lo - 1];
  }

  void wordpiece(const std::string& word, int n_cps, std::vector<int32_t>& out) {
    {
      std::shared_lock<std::shared_mutex> rl(cache_mu);
      auto cached = word_cache.find(word);
      if (cached != word_cache.end()) {
        out.insert(out.end(), cached->second.begin(), cached->second.end());
        return;
      }
    }
    std::vector<int32_t> ids;
    if (n_cps > max_chars_per_word) {
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
          // Step back to the previous UTF-8 character boundary.
          do { --end; } while (end > start && (word[end] & 0xC0) == 0x80);
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
    {
      std::unique_lock<std::shared_mutex> wl(cache_mu);
      if (word_cache.size() >= kWordCacheMax) word_cache.clear();
      word_cache.emplace(word, ids);
    }
    out.insert(out.end(), ids.begin(), ids.end());
  }

  static void append_utf8(int32_t cp, std::string& out) {
    if (cp < 0x80) {
      out.push_back((char)cp);
    } else if (cp < 0x800) {
      out.push_back((char)(0xC0 | (cp >> 6)));
      out.push_back((char)(0x80 | (cp & 0x3F)));
    } else if (cp < 0x10000) {
      out.push_back((char)(0xE0 | (cp >> 12)));
      out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
      out.push_back((char)(0x80 | (cp & 0x3F)));
    } else {
      out.push_back((char)(0xF0 | (cp >> 18)));
      out.push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
      out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
      out.push_back((char)(0x80 | (cp & 0x3F)));
    }
  }

  // Appends the transformed form of cp to `word`; returns codepoints added.
  int transform(int32_t cp, std::string& word) {
    if (cp >= 0x10000) {  // astral word chars pass through untransformed
      append_utf8(cp, word);
      return 1;
    }
    int32_t t = xform[cp];
    if (t >= 0) {
      append_utf8(t, word);
      return 1;
    }
    if (t == kXformEmpty) return 0;
    const auto& seq = exceptions.at(cp);
    for (int32_t oc : seq) append_utf8(oc, word);
    return (int)seq.size();
  }

  // Returns the unpadded token count (capped at max_len), or -1 when the
  // text needs the Python path (BAIL codepoint or invalid UTF-8).
  int encode(const char* text, int max_len, int32_t* ids_row, int32_t* mask_row) {
    std::vector<int32_t> ids;
    ids.reserve(max_len);
    ids.push_back(cls_id);

    std::string word;
    int word_cps = 0;
    const unsigned char* p = reinterpret_cast<const unsigned char*>(text);
    bool truncated = false;
    auto flush_word = [&]() {
      if (!word.empty()) {
        wordpiece(word, word_cps, ids);
        word.clear();
        if ((int)ids.size() >= max_len - 1) {
          ids.resize(max_len - 1);
          truncated = true;
        }
      }
      word_cps = 0;
    };
    while (*p && !truncated) {
      // Decode one UTF-8 codepoint.
      int32_t cp;
      unsigned char c = *p;
      if (c < 0x80) {
        cp = c;
        p += 1;
      } else if ((c & 0xE0) == 0xC0) {
        if ((p[1] & 0xC0) != 0x80) return -1;
        cp = ((c & 0x1F) << 6) | (p[1] & 0x3F);
        p += 2;
      } else if ((c & 0xF0) == 0xE0) {
        if ((p[1] & 0xC0) != 0x80 || (p[2] & 0xC0) != 0x80) return -1;
        cp = ((c & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
        p += 3;
      } else if ((c & 0xF8) == 0xF0) {
        if ((p[1] & 0xC0) != 0x80 || (p[2] & 0xC0) != 0x80 || (p[3] & 0xC0) != 0x80)
          return -1;
        cp = ((c & 0x07) << 18) | ((p[1] & 0x3F) << 12) | ((p[2] & 0x3F) << 6) |
             (p[3] & 0x3F);
        p += 4;
      } else {
        return -1;
      }

      uint8_t f = classify(cp);
      if (f & kBail) return -1;
      if (f & kDrop) continue;
      if (f & kSpace) {
        flush_word();
      } else if (f & (kPunct | kCjk)) {
        // Standalone token: punctuation and CJK ideographs split to their
        // own word (transformed form).
        flush_word();
        if (!truncated) {
          word_cps = transform(cp, word);
          flush_word();
        }
      } else {
        word_cps += transform(cp, word);
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

void* wp_create(const char** tokens, int32_t n, int32_t pad_id, int32_t unk_id,
                int32_t cls_id, int32_t sep_id, const uint8_t* flags,
                const int32_t* xform, const int32_t* exc_cp, const int32_t* exc_off,
                const int32_t* exc_dat, int32_t n_exc, const int32_t* astral_starts,
                const uint8_t* astral_class, int32_t n_astral) {
  auto* t = new Tokenizer();
  t->vocab.reserve(n * 2);
  for (int32_t i = 0; i < n; ++i) t->vocab.emplace(tokens[i], i);
  t->pad_id = pad_id;
  t->unk_id = unk_id;
  t->cls_id = cls_id;
  t->sep_id = sep_id;
  t->flags.assign(flags, flags + 0x10000);
  t->xform.assign(xform, xform + 0x10000);
  for (int32_t i = 0; i < n_exc; ++i) {
    t->exceptions.emplace(
        exc_cp[i], std::vector<int32_t>(exc_dat + exc_off[i], exc_dat + exc_off[i + 1]));
  }
  t->astral_starts.assign(astral_starts, astral_starts + n_astral);
  t->astral_class.assign(astral_class, astral_class + n_astral);
  return t;
}

void wp_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encodes n_texts into row-major (n_rows, max_len) int32 buffers. Rows the
// native path cannot prove identical to Python (BAIL codepoints, invalid
// UTF-8) get bailed[i] = 1 and are left pad-filled for the wrapper to
// re-encode. Returns the longest unpadded sequence length across the
// natively-encoded rows.
int32_t wp_encode_batch(void* handle, const char** texts, int32_t n_texts, int32_t max_len,
                        int32_t* out_ids, int32_t* out_mask, int8_t* bailed) {
  auto* t = static_cast<Tokenizer*>(handle);
  int32_t longest = 2;
  for (int32_t i = 0; i < n_texts; ++i) {
    int n = t->encode(texts[i], max_len, out_ids + (int64_t)i * max_len,
                      out_mask + (int64_t)i * max_len);
    if (n < 0) {
      bailed[i] = 1;
      for (int j = 0; j < max_len; ++j) {
        out_ids[(int64_t)i * max_len + j] = t->pad_id;
        out_mask[(int64_t)i * max_len + j] = 0;
      }
      continue;
    }
    bailed[i] = 0;
    if (n > longest) longest = n;
  }
  return longest;
}

}  // extern "C"
