// Native CIDEr scorer (corpus-df mode), score-equivalent to
// captionax/eval/cider.py (itself verified to machine epsilon against the
// reference's vendored coco-caption scorer).
//
// The metric is pure host-side computation — n-gram counting, batch
// document frequencies, tf-idf cosine — and dominates eval-loop CPU time
// at corpus scale, so it gets the framework's native treatment.  Words are
// interned to u32 ids; 1..4-grams are packed into 16-byte keys hashed with
// FNV-1a; everything else mirrors the Python implementation.
//
// C ABI (ctypes): captions arrive as one UTF-8 blob of '\n'-separated
// sentences plus an offsets layout, see cider_score() below.
//
// Build: make -C csrc   (produces libcaptionax_cider.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct NGram {
  uint32_t w[4];
  uint8_t n;
  bool operator==(const NGram& o) const {
    return n == o.n && std::memcmp(w, o.w, sizeof(w)) == 0;
  }
};

struct NGramHash {
  size_t operator()(const NGram& g) const {
    uint64_t h = 1469598103934665603ull;  // FNV-1a
    const auto* p = reinterpret_cast<const unsigned char*>(g.w);
    for (size_t i = 0; i < sizeof(g.w); ++i) {
      h ^= p[i];
      h *= 1099511628211ull;
    }
    h ^= g.n;
    h *= 1099511628211ull;
    return static_cast<size_t>(h);
  }
};

using Counts = std::unordered_map<NGram, double, NGramHash>;

class Interner {
 public:
  uint32_t intern(const std::string& s) {
    auto it = map_.find(s);
    if (it != map_.end()) return it->second;
    uint32_t id = static_cast<uint32_t>(map_.size()) + 1;  // 0 reserved
    map_.emplace(s, id);
    return id;
  }

 private:
  std::unordered_map<std::string, uint32_t> map_;
};

Counts ngram_counts(const std::vector<uint32_t>& words, int n_max) {
  Counts counts;
  const int len = static_cast<int>(words.size());
  for (int n = 1; n <= n_max; ++n) {
    for (int i = 0; i + n <= len; ++i) {
      NGram g{};
      g.n = static_cast<uint8_t>(n);
      for (int k = 0; k < n; ++k) g.w[k] = words[i + k];
      counts[g] += 1.0;
    }
  }
  return counts;
}

std::vector<uint32_t> split_intern(const char* s, size_t len, Interner& in) {
  std::vector<uint32_t> out;
  size_t i = 0;
  while (i < len) {
    while (i < len && s[i] == ' ') ++i;
    size_t j = i;
    while (j < len && s[j] != ' ') ++j;
    if (j > i) out.push_back(in.intern(std::string(s + i, j - i)));
    i = j;
  }
  return out;
}

struct TfIdf {
  Counts vec;                 // ngram -> tf*idf weight
  double norm[4] = {0, 0, 0, 0};
};

TfIdf tfidf(const Counts& counts, const Counts& df, double log_num) {
  TfIdf out;
  out.vec.reserve(counts.size());
  for (const auto& [g, tf] : counts) {
    auto it = df.find(g);
    double d = it == df.end() ? 0.0 : it->second;
    double idf = log_num - std::log(std::max(1.0, d));
    double w = tf * idf;
    out.vec.emplace(g, w);
    out.norm[g.n - 1] += w * w;
  }
  for (double& x : out.norm) x = std::sqrt(x);
  return out;
}

}  // namespace

extern "C" {

// hyps: num_images sentences; refs: flattened, ref_offsets[i] gives the
// start index of image i's refs in the sentence list (num_images+1 long).
// All sentences are passed as one blob with byte offsets (num_sents+1).
// Returns 0 on success; per-image scores written to out[num_images].
int cider_score(const char* hyp_blob, const int64_t* hyp_offs,
                int64_t num_images, const char* ref_blob,
                const int64_t* ref_offs, const int64_t* ref_index,
                double* out) {
  const int n_max = 4;
  Interner interner;

  std::vector<Counts> hyp_counts(num_images);
  for (int64_t i = 0; i < num_images; ++i) {
    auto words = split_intern(hyp_blob + hyp_offs[i],
                              static_cast<size_t>(hyp_offs[i + 1] - hyp_offs[i]),
                              interner);
    hyp_counts[i] = ngram_counts(words, n_max);
  }

  std::vector<std::vector<Counts>> ref_counts(num_images);
  Counts df;
  for (int64_t i = 0; i < num_images; ++i) {
    Counts seen;
    for (int64_t r = ref_index[i]; r < ref_index[i + 1]; ++r) {
      auto words = split_intern(
          ref_blob + ref_offs[r],
          static_cast<size_t>(ref_offs[r + 1] - ref_offs[r]), interner);
      ref_counts[i].push_back(ngram_counts(words, n_max));
      for (const auto& [g, _] : ref_counts[i].back()) seen[g] = 1.0;
    }
    for (const auto& [g, _] : seen) df[g] += 1.0;
  }

  const double log_num = std::log(static_cast<double>(num_images));

  for (int64_t i = 0; i < num_images; ++i) {
    TfIdf hv = tfidf(hyp_counts[i], df, log_num);
    double per_n[4] = {0, 0, 0, 0};
    for (const auto& ref : ref_counts[i]) {
      TfIdf rv = tfidf(ref, df, log_num);
      double dot[4] = {0, 0, 0, 0};
      for (const auto& [g, w] : hv.vec) {
        auto it = rv.vec.find(g);
        if (it != rv.vec.end()) dot[g.n - 1] += w * it->second;
      }
      for (int n = 0; n < 4; ++n) {
        if (hv.norm[n] != 0.0 && rv.norm[n] != 0.0)
          per_n[n] += dot[n] / (hv.norm[n] * rv.norm[n]);
      }
    }
    double score = (per_n[0] + per_n[1] + per_n[2] + per_n[3]) / 4.0;
    const double num_refs = static_cast<double>(ref_counts[i].size());
    out[i] = num_refs > 0 ? score / num_refs * 10.0 : 0.0;
  }
  return 0;
}

}  // extern "C"
