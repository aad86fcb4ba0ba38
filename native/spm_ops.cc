// Native sentencepiece-unigram segmentation for aria-tpu.
//
// Plays the role the reference delegates to the sentencepiece C++ library
// (slow Llama tokenizer, SURVEY.md §2.3: processing_aria.py:74 pins
// use_fast=False). The Python side (aria_tpu/data/spm.py) parses the
// ModelProto and handles normalization + added-token splitting; this library
// is the hot inner loop — Viterbi segmentation over code points with byte
// fallback — bit-identical to spm.py::SentencePieceTokenizer._segment
// (double-precision dynamic programming, same strict-> tie-breaking, same
// UNK penalty arithmetic).
//
// C ABI for ctypes. Build: g++ -O3 -shared -fPIC spm_ops.cc -o lib...so

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kNormal = 1;
constexpr int kUnknown = 2;
constexpr int kUserDefined = 4;
constexpr int kByte = 6;
constexpr double kUnkPenalty = -10.0;

struct SpmModel {
  std::unordered_map<std::string, int32_t> piece_ids;  // NORMAL/USER_DEFINED
  std::vector<float> scores;                           // all pieces
  int32_t byte_ids[256];
  int32_t unk_id = 0;
  int32_t max_piece_cp = 1;  // longest piece, in code points
  double min_score = 0.0;
};

// UTF-8 code-point length of the byte starting at p (1..4; invalid -> 1).
inline int cp_len(unsigned char b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xE) return 3;
  if ((b >> 3) == 0x1E) return 4;
  return 1;
}

// Code points in a UTF-8 string.
int count_cps(const char* s, int len) {
  int n = 0;
  for (int i = 0; i < len; i += cp_len((unsigned char)s[i])) n++;
  return n;
}

}  // namespace

extern "C" {

// pieces: concatenated UTF-8 bytes; lens[i] = byte length of piece i.
void* aria_spm_create(const char* pieces, const int32_t* lens,
                      const float* scores, const int32_t* types, int32_t n) {
  SpmModel* m = new SpmModel();
  m->scores.assign(scores, scores + n);
  for (int i = 0; i < 256; i++) m->byte_ids[i] = -1;
  double min_score = n ? std::numeric_limits<double>::infinity() : 0.0;
  const char* p = pieces;
  for (int32_t i = 0; i < n; i++) {
    std::string piece(p, (size_t)lens[i]);
    p += lens[i];
    min_score = std::min(min_score, (double)scores[i]);
    int32_t t = types[i];
    if (t == kNormal || t == kUserDefined) {
      m->piece_ids.emplace(piece, i);
      int cps = count_cps(piece.data(), (int)piece.size());
      if (cps > m->max_piece_cp) m->max_piece_cp = cps;
    } else if (t == kUnknown) {
      m->unk_id = i;
    } else if (t == kByte && piece.size() == 6 && piece.rfind("<0x", 0) == 0 &&
               piece[5] == '>') {
      int hi = piece[3] <= '9' ? piece[3] - '0' : (piece[3] & ~32) - 'A' + 10;
      int lo = piece[4] <= '9' ? piece[4] - '0' : (piece[4] & ~32) - 'A' + 10;
      m->byte_ids[hi * 16 + lo] = i;
    }
  }
  m->min_score = min_score;
  return m;
}

void aria_spm_destroy(void* h) { delete (SpmModel*)h; }

// Segment normalized UTF-8 text (spaces already mapped to U+2581). Returns
// the number of ids written (<= max_out), or -1 if out buffer is too small.
int32_t aria_spm_segment(void* h, const char* text, int32_t text_len,
                         int32_t* out_ids, int32_t max_out) {
  const SpmModel* m = (const SpmModel*)h;
  // code-point boundaries: off[i] = byte offset of code point i; off[n] = len
  std::vector<int32_t> off;
  off.reserve(text_len + 1);
  for (int i = 0; i < text_len;) {
    off.push_back(i);
    i += cp_len((unsigned char)text[i]);
  }
  const int n = (int)off.size();
  off.push_back(text_len);
  if (n == 0) return 0;

  const double NEG = -std::numeric_limits<double>::infinity();
  std::vector<double> best(n + 1, NEG);
  std::vector<int32_t> back_i(n + 1, 0), back_id(n + 1, -2);
  best[0] = 0.0;
  std::string key;
  for (int i = 0; i < n; i++) {
    if (best[i] == NEG) continue;
    const int jmax = std::min(i + m->max_piece_cp, n);
    for (int j = i + 1; j <= jmax; j++) {
      key.assign(text + off[i], (size_t)(off[j] - off[i]));
      auto it = m->piece_ids.find(key);
      if (it != m->piece_ids.end()) {
        double sc = best[i] + (double)m->scores[it->second];
        if (sc > best[j]) {
          best[j] = sc;
          back_i[j] = i;
          back_id[j] = it->second;
        }
      }
    }
    // unknown single-code-point fallback (same arithmetic as spm.py)
    double sc = best[i] + m->min_score + kUnkPenalty;
    if (sc > best[i + 1]) {
      best[i + 1] = sc;
      back_i[i + 1] = i;
      back_id[i + 1] = -1;
    }
  }

  // backtrack (collect reversed, then emit forward)
  std::vector<int32_t> rev;
  rev.reserve(n);
  int pos = n;
  while (pos > 0) {
    int i = back_i[pos], pid = back_id[pos];
    if (pid == -1) {
      // byte fallback over the raw UTF-8 bytes of this code point
      int b0 = off[i], b1 = off[pos];
      bool all_bytes = true;
      for (int b = b0; b < b1; b++) {
        if (m->byte_ids[(unsigned char)text[b]] < 0) { all_bytes = false; break; }
      }
      if (all_bytes) {
        for (int b = b1 - 1; b >= b0; b--)
          rev.push_back(m->byte_ids[(unsigned char)text[b]]);
      } else {
        rev.push_back(m->unk_id);
      }
    } else {
      rev.push_back(pid);
    }
    pos = i;
  }
  if ((int32_t)rev.size() > max_out) return -1;
  int32_t cnt = (int32_t)rev.size();
  for (int32_t i = 0; i < cnt; i++) out_ids[i] = rev[cnt - 1 - i];
  return cnt;
}

}  // extern "C"
