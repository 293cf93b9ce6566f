// Native caption tokenizer + vocab encoder.
//
// The host-side text pipeline (strip periods, lowercase, Treebank word
// tokenization, vocab lookup, pad) runs at ~3k captions/s in Python —
// a 4.6x bottleneck against the TPU's 13.7k images/s training rate on
// this single-core host.  This C++ implementation reproduces the exact
// rewrite-rule pipeline of captionax.core.tokenize._treebank_regex_tokenize
// (itself parity-tested against nltk's TreebankWordTokenizer), with each
// regex hand-rolled as a linear string rewrite.
//
// C ABI (ctypes):
//   textenc_vocab_new(blob, offsets, n)   -> handle (words ordered by id)
//   textenc_encode_batch(handle, blob, offsets, n, max_len, bos, eos, unk,
//                        lowercase, strip_periods, out_int32)
//   textenc_vocab_free(handle)
//
// Build: make -C csrc  (libcaptionax_text.so)

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

using std::string;

inline bool in(char c, const char* set) { return std::strchr(set, c) != nullptr; }

// r: ^" -> ``
string rule_start_quote(const string& s) {
  if (!s.empty() && s[0] == '"') return "``" + s.substr(1);
  return s;
}

// r: (``) -> " `` "
string rule_space_backticks(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    if (i + 1 < s.size() && s[i] == '`' && s[i + 1] == '`') {
      out += " `` ";
      ++i;
    } else {
      out += s[i];
    }
  }
  return out;
}

// r: ([ (\[{<])("|'{2}) -> \1 ``_   (trailing space)
string rule_open_quote(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    out += s[i];
    if (in(s[i], " ([{<")) {
      if (i + 1 < s.size() && s[i + 1] == '"') {
        out += " `` ";
        ++i;
      } else if (i + 2 < s.size() && s[i + 1] == '\'' && s[i + 2] == '\'') {
        out += " `` ";
        i += 2;
      }
    }
  }
  return out;
}

// r: ([:,])([^\d]) -> " \1 \2" ; ([:,])$ -> " \1 "
string rule_comma_colon(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    if (s[i] == ',' || s[i] == ':') {
      if (i + 1 >= s.size()) {
        out += ' ';
        out += s[i];
        out += ' ';
      } else if (!std::isdigit(static_cast<unsigned char>(s[i + 1]))) {
        out += ' ';
        out += s[i];
        out += ' ';
        out += s[i + 1];
        ++i;
      } else {
        out += s[i];
      }
    } else {
      out += s[i];
    }
  }
  return out;
}

// r: chars in set -> " c "
string rule_space_chars(const string& s, const char* set) {
  string out;
  for (char c : s) {
    if (in(c, set)) {
      out += ' ';
      out += c;
      out += ' ';
    } else {
      out += c;
    }
  }
  return out;
}

// r: "..." -> " ... "
string rule_ellipsis(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    if (i + 2 < s.size() && s[i] == '.' && s[i + 1] == '.' && s[i + 2] == '.') {
      out += " ... ";
      i += 2;
    } else {
      out += s[i];
    }
  }
  return out;
}

// r: final period (possibly followed by closers) at end -> spaced
string rule_final_period(const string& s) {
  // ([^\.])(\.)([\]\)}>"']*)\s*$ -> "\1 \2\3 "
  long end = static_cast<long>(s.size()) - 1;
  while (end >= 0 && std::isspace(static_cast<unsigned char>(s[end]))) --end;
  long closers_start = end + 1;
  while (closers_start - 1 >= 0 && in(s[closers_start - 1], "])}>\"'"))
    --closers_start;
  long dot = closers_start - 1;
  if (dot >= 1 && s[dot] == '.' && s[dot - 1] != '.') {
    string out = s.substr(0, dot) + " ." +
                 s.substr(closers_start, end - closers_start + 1) + " ";
    return out;
  }
  return s;
}

// r: ([^'])' ' -> "\1 ' "  (quote before a space, not preceded by ')
string rule_closing_single(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    out += s[i];
    if (s[i] != '\'' && i + 2 < s.size() && s[i + 1] == '\'' &&
        s[i + 2] == ' ') {
      out += " ' ";
      i += 2;
    }
  }
  return out;
}

// r: -- -> " -- "
string rule_dashes(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    if (i + 1 < s.size() && s[i] == '-' && s[i + 1] == '-') {
      out += " -- ";
      ++i;
    } else {
      out += s[i];
    }
  }
  return out;
}

// r: " -> " '' "
string rule_double_quote(const string& s) {
  string out;
  for (char c : s) {
    if (c == '"') out += " '' ";
    else out += c;
  }
  return out;
}

// r: (\S)('') -> "\1 '' "
string rule_space_before_close(const string& s) {
  string out;
  for (size_t i = 0; i < s.size(); ++i) {
    if (i + 2 < s.size() + 1 && i + 1 < s.size() && s[i] != ' ' &&
        !std::isspace(static_cast<unsigned char>(s[i])) && s[i + 1] == '\'' &&
        i + 2 < s.size() && s[i + 2] == '\'') {
      out += s[i];
      out += " '' ";
      i += 2;
    } else {
      out += s[i];
    }
  }
  return out;
}

// contraction suffixes: ([^' ])('s|'m|'d|'ll|'re|'ve|n't|') followed by
// a space (the python pipeline pads the string with spaces beforehand)
string rule_contractions(const string& s) {
  string out;
  size_t n = s.size();
  auto boundary = [&](size_t j) { return j >= n || s[j] == ' '; };
  for (size_t i = 0; i < n; ++i) {
    char c = s[i];
    out += c;
    if (c == ' ' || c == '\'') continue;
    // suffixes beginning with an apostrophe at i+1
    if (i + 1 < n && s[i + 1] == '\'') {
      if (i + 3 < n &&
          ((s[i + 2] == 'l' && s[i + 3] == 'l') ||
           (s[i + 2] == 'r' && s[i + 3] == 'e') ||
           (s[i + 2] == 'v' && s[i + 3] == 'e')) &&
          boundary(i + 4)) {
        out += ' ';
        out += s.substr(i + 1, 3);
        out += ' ';
        i += 3;
        continue;
      }
      if (i + 2 < n && in(s[i + 2], "smd") && boundary(i + 3)) {
        out += ' ';
        out += s.substr(i + 1, 2);
        out += ' ';
        i += 2;
        continue;
      }
      if (boundary(i + 2)) {
        out += " ' ";
        i += 1;
        continue;
      }
    }
    // "n't": char before 'n' must be non-quote non-space (it is: c)
    if (i + 3 < n && s[i + 1] == 'n' && s[i + 2] == '\'' && s[i + 3] == 't' &&
        boundary(i + 4)) {
      out += " n't ";
      i += 3;
      continue;
    }
  }
  return out;
}

// whole-word two-part contractions: cannot gimme gonna gotta lemme wanna d'ye more'n
string rule_word_contractions(const string& s) {
  static const struct { const char* whole; const char* a; const char* b; }
      table[] = {
          {"cannot", "can", "not"}, {"d'ye", "d", "'ye"},
          {"gimme", "gim", "me"},   {"gonna", "gon", "na"},
          {"gotta", "got", "ta"},   {"lemme", "lem", "me"},
          {"more'n", "more", "'n"}, {"wanna", "wan", "na"},
      };
  string out;
  size_t i = 0, n = s.size();
  while (i < n) {
    if (s[i] == ' ') {
      out += ' ';
      ++i;
      continue;
    }
    size_t j = i;
    while (j < n && s[j] != ' ') ++j;
    string word = s.substr(i, j - i);
    bool matched = false;
    for (const auto& e : table) {
      if (word == e.whole) {
        out += e.a;
        out += ' ';
        out += e.b;
        matched = true;
        break;
      }
    }
    if (!matched) out += word;
    i = j;
  }
  return out;
}

std::vector<string> treebank_tokenize(string text) {
  text = rule_start_quote(text);
  text = rule_space_backticks(text);
  text = rule_open_quote(text);
  text = rule_comma_colon(text);
  text = rule_ellipsis(text);
  text = rule_space_chars(text, ";@#$%&");
  text = rule_final_period(text);
  text = rule_space_chars(text, "?!");
  text = rule_closing_single(text);
  text = rule_space_chars(text, "[](){}<>");
  text = rule_dashes(text);
  text = " " + text + " ";
  text = rule_double_quote(text);
  text = rule_space_before_close(text);
  text = rule_contractions(text);
  text = rule_word_contractions(text);
  std::vector<string> out;
  size_t i = 0, n = text.size();
  while (i < n) {
    while (i < n && std::isspace(static_cast<unsigned char>(text[i]))) ++i;
    size_t j = i;
    while (j < n && !std::isspace(static_cast<unsigned char>(text[j]))) ++j;
    if (j > i) out.push_back(text.substr(i, j - i));
    i = j;
  }
  return out;
}

struct Vocab {
  std::unordered_map<string, int32_t> w2i;
};

}  // namespace

extern "C" {

void* textenc_vocab_new(const char* blob, const int64_t* offs, int64_t n) {
  auto* v = new Vocab();
  v->w2i.reserve(static_cast<size_t>(n) * 2);
  for (int64_t i = 0; i < n; ++i) {
    v->w2i.emplace(
        string(blob + offs[i], static_cast<size_t>(offs[i + 1] - offs[i])),
        static_cast<int32_t>(i));
  }
  return v;
}

void textenc_vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

// Encode n captions into out[n, max_len] int32 (pad 0), applying
// lowercase + period-strip preprocessing and <s> ... </s> wrapping.
int textenc_encode_batch(void* handle, const char* blob, const int64_t* offs,
                         int64_t n, int32_t max_len, int32_t bos, int32_t eos,
                         int32_t unk, int32_t* out) {
  const Vocab* v = static_cast<const Vocab*>(handle);
  for (int64_t r = 0; r < n; ++r) {
    string text(blob + offs[r], static_cast<size_t>(offs[r + 1] - offs[r]));
    string pre;
    pre.reserve(text.size());
    for (char c : text) {
      if (c == '.') continue;  // re.sub(r"\.", "", caption)
      pre += static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
    }
    auto toks = treebank_tokenize(pre);
    int32_t* row = out + r * max_len;
    std::memset(row, 0, sizeof(int32_t) * static_cast<size_t>(max_len));
    int32_t k = 0;
    if (k < max_len) row[k++] = bos;
    for (const auto& t : toks) {
      if (k >= max_len) break;
      auto it = v->w2i.find(t);
      row[k++] = it == v->w2i.end() ? unk : it->second;
    }
    if (k < max_len) row[k++] = eos;
  }
  return 0;
}

}  // extern "C"
