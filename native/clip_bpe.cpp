// Fast byte-level BPE encoder for the CLIP vocabulary (C API, ctypes).
//
// Native replacement for the host-side tokenizer hot loop (the reference
// tokenizes via pure-Python merge loops, /root/reference/clip/simple_tokenizer.py).
// Handles the ASCII fast path exactly (lowercasing, whitespace folding,
// contraction / letter-run / digit / punctuation pre-tokenization, greedy
// lowest-rank merges with a token cache); non-ASCII inputs are rejected so
// the Python wrapper can fall back to the reference-exact slow path.
//
// Build: g++ -O3 -shared -fPIC -o libclip_bpe.so clip_bpe.cpp

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1315423911u ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int> encoder;
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  std::unordered_map<std::string, std::vector<int>> cache;
  std::mutex cache_mu;
};

Tokenizer* g_tok = nullptr;

bool is_letter(unsigned char c) { return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'); }
bool is_digit(unsigned char c) { return c >= '0' && c <= '9'; }
bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}

// Greedy lowest-rank merge loop over one pre-token (ASCII chars; the last
// symbol carries the </w> marker).
std::vector<int> bpe_encode_token(Tokenizer& tok, const std::string& word) {
  {
    std::lock_guard<std::mutex> lk(tok.cache_mu);
    auto it = tok.cache.find(word);
    if (it != tok.cache.end()) return it->second;
  }

  std::vector<std::string> parts;
  parts.reserve(word.size());
  for (size_t i = 0; i < word.size(); ++i) parts.emplace_back(1, word[i]);
  if (!parts.empty()) parts.back() += "</w>";

  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = tok.ranks.find({parts[i], parts[i + 1]});
      if (it != tok.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // merge ALL occurrences of the best pair in one sweep
    const std::string first = parts[best_i];
    const std::string second = parts[best_i + 1];
    std::vector<std::string> merged;
    merged.reserve(parts.size());
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size() && parts[i] == first && parts[i + 1] == second) {
        merged.push_back(first + second);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        i += 1;
      }
    }
    parts.swap(merged);
  }

  std::vector<int> ids;
  ids.reserve(parts.size());
  for (const auto& p : parts) {
    auto it = tok.encoder.find(p);
    if (it == tok.encoder.end()) return {};  // signal failure -> fallback
    ids.push_back(it->second);
  }
  {
    std::lock_guard<std::mutex> lk(tok.cache_mu);
    tok.cache.emplace(word, ids);
  }
  return ids;
}

}  // namespace

extern "C" {

// merges_blob: '\n'-separated "a b" merge lines (decompressed, UTF-8).
// Builds the 49408-entry vocab exactly like the Python implementation.
int clip_bpe_init(const char* merges_blob, int64_t blob_len) {
  auto* tok = new Tokenizer();
  std::vector<std::string> vocab;
  vocab.reserve(49408);

  // bytes_to_unicode() enumeration order (the Python dict's insertion
  // order determines the vocab id layout): printable ranges first, then
  // the remapped control bytes.
  std::vector<int> bs;
  for (int x = '!'; x <= '~'; ++x) bs.push_back(x);
  for (int x = 0xA1; x <= 0xAC; ++x) bs.push_back(x);
  for (int x = 0xAE; x <= 0xFF; ++x) bs.push_back(x);
  std::vector<int> cs = bs;
  {
    int n = 0;
    for (int x = 0; x < 256; ++x) {
      bool found = false;
      for (int b2 : bs)
        if (b2 == x) { found = true; break; }
      if (!found) {
        bs.push_back(x);
        cs.push_back(256 + n++);
      }
    }
  }
  auto utf8 = [](int cp) -> std::string {
    std::string s;
    if (cp < 0x80) s += static_cast<char>(cp);
    else if (cp < 0x800) {
      s += static_cast<char>(0xC0 | (cp >> 6));
      s += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      s += static_cast<char>(0xE0 | (cp >> 12));
      s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      s += static_cast<char>(0x80 | (cp & 0x3F));
    }
    return s;
  };
  std::vector<std::string> unicode_strings(bs.size());
  for (size_t i = 0; i < bs.size(); ++i) unicode_strings[i] = utf8(cs[i]);

  for (const auto& u : unicode_strings) vocab.push_back(u);
  for (const auto& u : unicode_strings) vocab.push_back(u + "</w>");

  // merges
  const char* p = merges_blob;
  const char* end = merges_blob + blob_len;
  int rank = 0;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (nl == nullptr) nl = end;
    const char* sp = static_cast<const char*>(memchr(p, ' ', nl - p));
    if (sp != nullptr) {
      std::string a(p, sp - p);
      std::string b(sp + 1, nl - sp - 1);
      tok->ranks[{a, b}] = rank++;
      vocab.push_back(a + b);
    }
    p = nl + 1;
  }
  vocab.push_back("<|startoftext|>");
  vocab.push_back("<|endoftext|>");

  for (size_t i = 0; i < vocab.size(); ++i) tok->encoder[vocab[i]] = static_cast<int>(i);

  delete g_tok;
  g_tok = tok;
  return static_cast<int>(vocab.size());
}

// Encode a cleaned ASCII string. Returns the number of ids written, or -1
// when the input needs the Python fallback (non-ASCII / unknown symbol),
// or -2 when out capacity is insufficient.
int clip_bpe_encode(const char* text, int64_t text_len, int32_t* out,
                    int32_t capacity) {
  if (g_tok == nullptr) return -1;
  Tokenizer& tok = *g_tok;

  int n_out = 0;
  size_t i = 0;
  const auto* s = reinterpret_cast<const unsigned char*>(text);
  const size_t n = static_cast<size_t>(text_len);

  auto emit = [&](const std::string& word) -> bool {
    std::vector<int> ids = bpe_encode_token(tok, word);
    if (ids.empty() && !word.empty()) return false;
    for (int id : ids) {
      if (n_out >= capacity) return false;
      out[n_out++] = id;
    }
    return true;
  };

  while (i < n) {
    unsigned char c = s[i];
    if (c >= 0x80) return -1;  // non-ASCII -> python fallback
    if (is_space(c)) { ++i; continue; }

    // contractions 's|'t|'re|'ve|'m|'ll|'d — regex alternation matches these
    // even when followed by more letters (e.g. "'side" -> 's + ide)
    if (c == '\'' && i + 1 < n) {
      unsigned char c1 = s[i + 1];
      unsigned char c2 = (i + 2 < n) ? s[i + 2] : 0;
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
        std::string tokstr = std::string("'") + static_cast<char>(c1);
        if (!emit(tokstr)) return (n_out >= capacity) ? -2 : -1;
        i += 2;
        continue;
      }
      if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
          (c1 == 'l' && c2 == 'l')) {
        std::string tokstr = std::string("'") + static_cast<char>(c1) +
                             static_cast<char>(c2);
        if (!emit(tokstr)) return (n_out >= capacity) ? -2 : -1;
        i += 3;
        continue;
      }
    }

    if (is_letter(c)) {
      size_t j = i;
      while (j < n && s[j] < 0x80 && is_letter(s[j])) ++j;
      if (j < n && s[j] >= 0x80) return -1;
      if (!emit(std::string(text + i, j - i))) return (n_out >= capacity) ? -2 : -1;
      i = j;
    } else if (is_digit(c)) {
      if (!emit(std::string(1, static_cast<char>(c)))) return (n_out >= capacity) ? -2 : -1;
      ++i;
    } else {
      // punctuation run: [^\s\p{L}\p{N}]+
      size_t j = i;
      while (j < n && s[j] < 0x80 && !is_space(s[j]) && !is_letter(s[j]) &&
             !is_digit(s[j]))
        ++j;
      if (j < n && s[j] >= 0x80) return -1;
      if (!emit(std::string(text + i, j - i))) return (n_out >= capacity) ? -2 : -1;
      i = j;
    }
  }
  return n_out;
}

void clip_bpe_free() {
  delete g_tok;
  g_tok = nullptr;
}

}  // extern "C"
