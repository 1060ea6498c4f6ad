// fastxpack — native FASTQ/FASTA(.gz) streaming parser + 2-bit batch packer.
//
// The TPU-native counterpart of the reference's FASTXreader + SequenceUtils
// host path (reference src/fastxutils/FastXReader.h:118-478 chunked zlib
// reader; src/utils/SequenceUtils.h:86-160 2-bit encoder): instead of
// materializing per-kmer strings, it emits fixed-shape device batches —
// uint32 words of 16 packed bases (LSB-first, A=00 C=01 G=10 T=11) plus a
// per-window validity bitmask — exactly the layout the Pallas/XLA window
// extractor consumes (see tsxcount_tpu/io/packer.py, the python reference
// implementation this must stay bit-identical to).
//
// Batch semantics (must match ReadPacker):
//   * every read starts on a 16-base word boundary;
//   * reads shorter than k are skipped (reference testExecution.h:18-19);
//   * reads longer than remaining capacity split with k-1 base overlap;
//   * bit p%32 of vmask[p/32] marks window start position p as valid
//     (dense 1 bit/position): fully inside one read segment and (drop
//     policy) N-free;
//   * n_policy: 0 = drop (windows containing N masked),
//               1 = random (N replaced by a seeded random base — the
//               reference's nondeterministic behavior, SequenceUtils.h:126-137,
//               made deterministic with an explicit seed).
//
// Build: g++ -O3 -march=native -shared -fPIC fastxpack.cpp -o libfastxpack.so -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kBasesPerWord = 16;

// ASCII -> 2-bit code; 255 = invalid (N etc.)
struct CodeLut {
  uint8_t lut[256];
  CodeLut() {
    memset(lut, 255, sizeof(lut));
    lut['A'] = lut['a'] = 0;
    lut['C'] = lut['c'] = 1;
    lut['G'] = lut['g'] = 2;
    lut['T'] = lut['t'] = 3;
  }
};
const CodeLut g_lut;

// splitmix64 — small deterministic rng for n_policy=random
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
};

struct Handle {
  gzFile file = nullptr;
  int k = 0;
  int n_policy = 0;
  Rng rng{0};
  bool is_fasta = false;
  bool eof = false;
  std::string error;

  // line buffer
  std::vector<char> buf;
  size_t buf_pos = 0, buf_len = 0;

  // current read being packed: 2-bit codes + validity run lengths
  std::vector<uint8_t> codes;
  std::vector<int32_t> run;  // run[i] = consecutive non-N bases from i
  size_t start = 0;          // next unpacked offset within codes
  bool have_read = false;
  std::string fasta_carry;   // next FASTA header already consumed

  // stats (mirrors PackStats)
  int64_t reads = 0, reads_skipped = 0, bases = 0, n_bases = 0, windows = 0;

  bool fill() {
    if (buf.empty()) buf.resize(1 << 20);
    int n = gzread(file, buf.data(), (unsigned)buf.size());
    if (n < 0) {
      int errnum = 0;
      error = gzerror(file, &errnum);
      return false;
    }
    buf_pos = 0;
    buf_len = (size_t)n;
    return n > 0;
  }

  // read one line (without newline) into out; false on EOF
  bool getline(std::string &out) {
    out.clear();
    for (;;) {
      if (buf_pos >= buf_len) {
        if (!fill()) return !out.empty();
      }
      char *base = buf.data() + buf_pos;
      size_t avail = buf_len - buf_pos;
      char *nl = (char *)memchr(base, '\n', avail);
      if (nl) {
        size_t n = (size_t)(nl - base);
        out.append(base, n);
        buf_pos += n + 1;
        if (!out.empty() && out.back() == '\r') out.pop_back();
        return true;
      }
      out.append(base, avail);
      buf_pos = buf_len;
    }
  }

  void encode_read(const std::string &seq) {
    size_t n = seq.size();
    reads++;
    bases += (int64_t)n;
    codes.resize(n);
    run.resize(n + 1);
    int64_t local_n = 0;
    for (size_t i = 0; i < n; ++i) {
      uint8_t c = g_lut.lut[(uint8_t)seq[i]];
      if (c == 255) {
        local_n++;
        codes[i] = (n_policy == 1) ? (uint8_t)(rng.next() & 3) : 0;
      } else {
        codes[i] = c;
      }
    }
    n_bases += local_n;
    // validity runs (only needed for drop policy; random treats all valid)
    run[n] = 0;
    if (n_policy == 1 || local_n == 0) {
      for (size_t i = n; i-- > 0;) run[i] = run[i + 1] + 1;
    } else {
      for (size_t i = n; i-- > 0;) {
        uint8_t c = g_lut.lut[(uint8_t)seq[i]];
        run[i] = (c == 255) ? 0 : run[i + 1] + 1;
      }
    }
    start = 0;
    if (n < (size_t)k) {
      reads_skipped++;
      have_read = false;
    } else {
      have_read = true;
    }
  }

  // parse the next record into codes/run; false on EOF or error
  bool next_record() {
    std::string line, seq;
    if (is_fasta) {
      if (!fasta_carry.empty() || getline(line)) {
        // line may hold the header if no carry
        if (!fasta_carry.empty()) line = std::move(fasta_carry);
        fasta_carry.clear();
        if (line.empty() || line[0] != '>') {
          error = "malformed FASTA header";
          return false;
        }
        for (;;) {
          std::string l2;
          if (!getline(l2)) break;
          if (!l2.empty() && l2[0] == '>') {
            fasta_carry = std::move(l2);
            break;
          }
          seq += l2;
        }
        encode_read(seq);
        return true;
      }
      return false;
    }
    // FASTQ: 4-line records
    if (!getline(line)) return false;
    if (line.empty()) return false;
    if (line[0] != '@') {
      error = "malformed FASTQ record (missing @)";
      return false;
    }
    if (!getline(seq)) {
      error = "truncated FASTQ record";
      return false;
    }
    std::string plus, qual;
    if (!getline(plus) || plus.empty() || plus[0] != '+' || !getline(qual)) {
      error = "truncated FASTQ record";
      return false;
    }
    encode_read(seq);
    return true;
  }
};

// pack codes[start, start+len) at word w0 of words; mark valid windows
void place_segment(Handle *h, uint32_t *words, uint32_t *vmask, int64_t w0,
                   size_t seg_len) {
  const uint8_t *codes = h->codes.data() + h->start;
  const int32_t *run = h->run.data() + h->start;
  int64_t w = w0;
  size_t i = 0;
  for (; i + kBasesPerWord <= seg_len; i += kBasesPerWord, ++w) {
    uint32_t v = 0;
    for (int j = kBasesPerWord - 1; j >= 0; --j)
      v = (v << 2) | codes[i + (size_t)j];
    words[w] = v;
  }
  if (i < seg_len) {
    uint32_t v = 0;
    for (size_t j = seg_len; j-- > i;) v = (v << 2) | codes[j];
    words[w] = v;
  }
  // windows fully inside the segment with k consecutive valid bases
  int64_t n_win = (int64_t)seg_len - h->k + 1;
  int64_t base = w0 * kBasesPerWord;
  for (int64_t p = 0; p < n_win; ++p) {
    if (run[p] >= h->k) {
      int64_t g = base + p;
      vmask[g >> 5] |= 1u << (g & 31);
      h->windows++;
    }
  }
}

}  // namespace

extern "C" {

void *fxp_open(const char *path, int k, int n_policy, uint64_t seed) {
  Handle *h = new Handle();
  h->k = k;
  h->n_policy = n_policy;
  h->rng = Rng(seed);
  h->file = gzopen(path, "rb");
  if (!h->file) {
    delete h;
    return nullptr;
  }
  gzbuffer(h->file, 1 << 20);
  int first = gzgetc(h->file);
  if (first < 0) {
    h->eof = true;
  } else {
    gzungetc(first, h->file);
    h->is_fasta = (first == '>');
  }
  return h;
}

// Fills one batch. words must hold total_words uint32 (capacity + pad),
// vmask capacity_words uint32; both are zeroed here.
// Returns 1 if more data may follow, 0 on EOF (batch may still hold data),
// -1 on parse error.
// vmask holds vmask_words = capacity_words/2 uint32 (1 bit per window pos)
int fxp_next_batch(void *hv, uint32_t *words, int64_t total_words,
                   uint32_t *vmask, int64_t capacity_words, int64_t *n_valid,
                   int64_t *n_bases_out) {
  Handle *h = (Handle *)hv;
  memset(words, 0, (size_t)total_words * sizeof(uint32_t));
  memset(vmask, 0, (size_t)(capacity_words / 2) * sizeof(uint32_t));
  int64_t cur_word = 0;
  int64_t batch_bases = 0;
  int64_t windows_before = h->windows;
  const int k = h->k;

  for (;;) {
    if (!h->have_read) {
      if (h->eof) break;
      if (!h->next_record()) {
        if (!h->error.empty()) return -1;
        h->eof = true;
        break;
      }
      continue;  // may have been skipped (len < k)
    }
    size_t remaining = h->codes.size() - h->start;
    if (remaining < (size_t)k) {
      h->have_read = false;
      continue;
    }
    int64_t avail_bases = (capacity_words - cur_word) * kBasesPerWord;
    if (avail_bases < k) break;  // batch full
    size_t seg_len =
        remaining < (size_t)avail_bases ? remaining : (size_t)avail_bases;
    place_segment(h, words, vmask, cur_word, seg_len);
    batch_bases += (int64_t)seg_len;
    cur_word += (int64_t)((seg_len + kBasesPerWord - 1) / kBasesPerWord);
    if (h->start + seg_len >= h->codes.size()) {
      h->have_read = false;
    } else {
      h->start += seg_len - (size_t)(k - 1);
    }
  }
  *n_valid = h->windows - windows_before;
  *n_bases_out = batch_bases;
  return h->eof && !h->have_read ? 0 : 1;
}

void fxp_stats(void *hv, int64_t *reads, int64_t *skipped, int64_t *bases,
               int64_t *n_bases, int64_t *windows) {
  Handle *h = (Handle *)hv;
  *reads = h->reads;
  *skipped = h->reads_skipped;
  *bases = h->bases;
  *n_bases = h->n_bases;
  *windows = h->windows;
}

const char *fxp_error(void *hv) {
  Handle *h = (Handle *)hv;
  return h->error.c_str();
}

void fxp_close(void *hv) {
  Handle *h = (Handle *)hv;
  if (h->file) gzclose(h->file);
  delete h;
}

}  // extern "C"
