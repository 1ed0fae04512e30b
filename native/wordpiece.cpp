// Native BERT WordPiece tokenizer: the loader's remaining Python hot spot.
//
// The reference tokenizes every caption and OD-label string in Python via
// the vendored pytorch_transformers BertTokenizer (ref:alad/train.py:211-212,
// ref:alad/dataset.py:96-131); at production batch sizes that host-side
// work competes with feature decoding for loader throughput. This library
// implements the exact same pipeline — clean / lowercase / punctuation
// split / greedy longest-match WordPiece — for ASCII text (all of COCO),
// and signals the caller to fall back to the pure-Python implementation
// (aladin_tpu/data/tokenizer.py, the source of truth) for any string with
// a non-ASCII byte, so behavior is bit-identical by construction: the C
// path either produces exactly what Python would or declines.
//
// Read-only after create: one handle safely serves the loader thread pool.
//
// Build: make -C native   (part of libaladin_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct WpVocab {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = -1;
  int32_t max_token_chars = 100;  // tokenizer.py WordpieceTokenizer.max_chars
};

// ASCII punctuation per tokenizer.py:_is_punctuation — the four ASCII
// ranges cover every ASCII char with Unicode category P plus $ ^ ` etc.
inline bool is_punct(uint8_t c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

const char* const NEVER_SPLIT[] = {"[UNK]", "[SEP]", "[PAD]", "[CLS]",
                                   "[MASK]"};

inline bool is_never_split(const char* s, size_t n) {
  for (const char* t : NEVER_SPLIT)
    if (n == strlen(t) && memcmp(s, t, n) == 0) return true;
  return false;
}

// Greedy longest-match WordPiece over one basic token (already lowercased
// unless never-split). Appends ids; whole token -> UNK when any position
// fails to match or the token exceeds max_token_chars.
void wordpiece(const WpVocab& wv, const char* tok, size_t n,
               std::vector<int32_t>& out) {
  if ((int32_t)n > wv.max_token_chars) {
    out.push_back(wv.unk_id);
    return;
  }
  size_t emitted_from = out.size();
  size_t start = 0;
  std::string key;
  while (start < n) {
    size_t end = n;
    int32_t cur = -1;
    while (start < end) {
      key.assign(start > 0 ? "##" : "");
      key.append(tok + start, end - start);
      auto it = wv.vocab.find(key);
      if (it != wv.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out.resize(emitted_from);
      out.push_back(wv.unk_id);
      return;
    }
    out.push_back(cur);
    start = end;
  }
}

}  // namespace

extern "C" {

void* aladin_wp_create(const char* vocab_path) {
  FILE* f = fopen(vocab_path, "rb");
  if (!f) return nullptr;
  std::string data;
  char buf[1 << 16];
  size_t got;
  while ((got = fread(buf, 1, sizeof(buf), f)) > 0) data.append(buf, got);
  fclose(f);
  WpVocab* wv = new WpVocab();
  // matches tokenizer.py:load_vocab exactly: the Python side reads in TEXT
  // mode, so universal newlines apply — '\n', '\r\n', and lone '\r' all
  // terminate a line; line index = id; duplicate lines -> LAST id wins
  // (dict assignment semantics)
  int32_t idx = 0;
  size_t start = 0;
  auto emit = [&](size_t end) {
    wv->vocab[data.substr(start, end - start)] = idx++;
  };
  for (size_t i = 0; i < data.size(); ++i) {
    if (data[i] == '\n') {
      emit(i);
      start = i + 1;
    } else if (data[i] == '\r') {
      emit(i);
      if (i + 1 < data.size() && data[i + 1] == '\n') ++i;
      start = i + 1;
    }
  }
  if (start < data.size()) emit(data.size());  // unterminated final line
  auto it = wv->vocab.find("[UNK]");
  if (it == wv->vocab.end()) {  // python path would KeyError; decline instead
    delete wv;
    return nullptr;
  }
  wv->unk_id = it->second;
  return wv;
}

void aladin_wp_destroy(void* h) { delete (WpVocab*)h; }

int64_t aladin_wp_vocab_size(void* h) {
  return h ? (int64_t)((WpVocab*)h)->vocab.size() : -1;
}

// Encode `text[0..n)` to WordPiece ids, writing at most `cap` ids to `out`
// (prefix-stable: equals the full Python id sequence truncated to cap).
// Returns the number of ids written, or -1 when the text contains a
// non-ASCII byte (caller must use the Python tokenizer for this string).
int64_t aladin_wp_encode(void* h, const char* text, int64_t n, int32_t* out,
                         int64_t cap) {
  if (!h) return -1;
  if (cap <= 0) return 0;  // callers may compute a non-positive budget
  const WpVocab& wv = *(const WpVocab*)h;
  std::vector<int32_t> ids;
  ids.reserve(64);
  std::string word;  // current non-punct run, lowercased
  size_t i = 0;
  auto flush_word = [&]() {
    if (!word.empty()) {
      wordpiece(wv, word.data(), word.size(), ids);
      word.clear();
    }
  };
  while (i < (size_t)n && (int64_t)ids.size() < cap) {
    // next whitespace-delimited basic token (clean pass: \t \n \r -> space,
    // other ASCII controls dropped, per tokenizer.py:BasicTokenizer._clean)
    size_t start = i;
    size_t tok_len = 0;
    char tok[4096];
    for (; i < (size_t)n; ++i) {
      uint8_t c = (uint8_t)text[i];
      if (c >= 0x80) return -1;  // non-ASCII: python fallback
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (tok_len) break;  // token complete
        start = i + 1;
        continue;
      }
      if (c < 0x20 || c == 0x7F) continue;  // control: dropped
      if (tok_len >= sizeof(tok)) return -1;  // pathological run: silently
      // truncating would diverge from the Python tokenizer; decline instead
      // ('exact match or decline' contract, ADVICE r2 #1)
      tok[tok_len++] = (char)c;
    }
    (void)start;
    if (!tok_len) continue;
    if (is_never_split(tok, tok_len)) {
      // basic pass keeps it whole; wordpiece then matches it verbatim
      wordpiece(wv, tok, tok_len, ids);
      continue;
    }
    // lowercase (ASCII; NFD accent-strip is the identity on ASCII), then
    // split punctuation into singleton tokens (tokenizer.py:_split_punct)
    for (size_t j = 0; j < tok_len; ++j) {
      uint8_t c = (uint8_t)tok[j];
      if (c >= 'A' && c <= 'Z') c += 32;
      if (is_punct(c)) {
        flush_word();
        char p = (char)c;
        wordpiece(wv, &p, 1, ids);
      } else {
        word.push_back((char)c);
      }
    }
    flush_word();
  }
  int64_t m = (int64_t)ids.size() < cap ? (int64_t)ids.size() : cap;
  if (m) memcpy(out, ids.data(), m * sizeof(int32_t));
  return m;
}

}  // extern "C"
