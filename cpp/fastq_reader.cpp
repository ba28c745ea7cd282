// Native chunked FASTQ/FASTA reader: the host-side ingestion runtime.
//
// TPU-native equivalent of the reference's multithreaded reader stack
// (seqFile_batch/fastq_read_parts/getFileReader, cqf/CQF_mt.h:334-412,
// 735-816, 933-957): N producer threads stream files (plain or gzip via
// zlib), split records, 2-bit encode, apply the N-segmentation rule of
// reads_to_kmers (split at an N at offset >= k of the current segment;
// earlier Ns stay embedded with code 4), tile long segments with k-1
// overlap, and hand fixed-shape (B, L) code batches to Python through a
// C ABI (ctypes, no pybind11 needed).
//
// Build: make -C cpp   ->  libshasm.so
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dlfcn.h>
#include <zlib.h>

namespace {

constexpr uint8_t CODE_N = 4;
constexpr uint8_t CODE_PAD = 5;
constexpr size_t CHUNK = 1u << 23;  // 8 MB parts, like the reference

// ---------------------------------------------------------------------------
// bzip2 via dlopen: this image ships libbz2.so.1 but no bzlib.h, so the
// stable public ABI (bz_stream + the three decompress entry points) is
// declared here and bound at runtime.  The reference opens .bz2 natively
// through boost::iostreams' bzip2 filter (getFileReader,
// /root/reference/cqf/CQF_mt.h:933-957); this is the equivalent on the
// low-level API.  Multi-stream files (pbzip2 output) are handled by
// re-initing on BZ_STREAM_END.

struct bz_stream {
  char* next_in;
  unsigned avail_in;
  unsigned total_in_lo32, total_in_hi32;
  char* next_out;
  unsigned avail_out;
  unsigned total_out_lo32, total_out_hi32;
  void* state;
  void* (*bzalloc)(void*, int, int);
  void (*bzfree)(void*, void*);
  void* opaque;
};
constexpr int BZ_OK = 0, BZ_STREAM_END = 4;

struct Bz2Api {
  int (*init)(bz_stream*, int, int) = nullptr;
  int (*decompress)(bz_stream*) = nullptr;
  int (*end)(bz_stream*) = nullptr;
  bool ok() const { return init && decompress && end; }
};

const Bz2Api& bz2_api() {
  static Bz2Api api = [] {
    Bz2Api a;
    for (const char* name : {"libbz2.so.1", "libbz2.so", "libbz2.so.1.0"}) {
      if (void* h = dlopen(name, RTLD_NOW | RTLD_GLOBAL)) {
        a.init = (int (*)(bz_stream*, int, int))dlsym(
            h, "BZ2_bzDecompressInit");
        a.decompress = (int (*)(bz_stream*))dlsym(h, "BZ2_bzDecompress");
        a.end = (int (*)(bz_stream*))dlsym(h, "BZ2_bzDecompressEnd");
        if (a.ok()) break;
        a = Bz2Api();
      }
    }
    return a;
  }();
  return api;
}

// Streaming bz2 decompressor over a FILE*.
class Bz2File {
 public:
  explicit Bz2File(const std::string& path) {
    f_ = fopen(path.c_str(), "rb");
    if (!f_ || !bz2_api().ok()) return;
    memset(&strm_, 0, sizeof(strm_));
    if (bz2_api().init(&strm_, 0, 0) != BZ_OK) {
      fclose(f_);
      f_ = nullptr;
      return;
    }
    live_ = true;
    in_.resize(1u << 20);
  }
  ~Bz2File() {
    if (live_) bz2_api().end(&strm_);
    if (f_) fclose(f_);
  }
  bool ok() const { return f_ != nullptr && live_; }

  int read(char* buf, unsigned len) {
    if (!ok() || eof_) return eof_ ? 0 : -1;
    strm_.next_out = buf;
    strm_.avail_out = len;
    while (strm_.avail_out > 0) {
      if (strm_.avail_in == 0 && !in_eof_) {
        size_t got = fread(in_.data(), 1, in_.size(), f_);
        if (got == 0) {
          if (ferror(f_)) return -1;
          in_eof_ = true;
        }
        strm_.next_in = in_.data();
        strm_.avail_in = (unsigned)got;
      }
      int rc = bz2_api().decompress(&strm_);
      if (rc == BZ_STREAM_END) {
        // multi-stream (pbzip2) support: restart on remaining input
        bz2_api().end(&strm_);
        live_ = false;
        if (strm_.avail_in == 0 && in_eof_) {
          eof_ = true;
          break;
        }
        char* ni = strm_.next_in;
        unsigned ai = strm_.avail_in;
        char* no = strm_.next_out;
        unsigned ao = strm_.avail_out;
        memset(&strm_, 0, sizeof(strm_));
        if (bz2_api().init(&strm_, 0, 0) != BZ_OK) return -1;
        live_ = true;
        strm_.next_in = ni;
        strm_.avail_in = ai;
        strm_.next_out = no;
        strm_.avail_out = ao;
      } else if (rc != BZ_OK) {
        return -1;
      } else if (strm_.avail_in == 0 && in_eof_) {
        // truncated stream: surface what we have, then EOF
        eof_ = true;
        break;
      }
    }
    return (int)(len - strm_.avail_out);
  }

 private:
  FILE* f_ = nullptr;
  bz_stream strm_;
  std::vector<char> in_;
  bool live_ = false, eof_ = false, in_eof_ = false;
};

bool is_bz2_path(const std::string& path) {
  if (path.size() >= 4 && path.compare(path.size() - 4, 4, ".bz2") == 0)
    return true;
  // magic sniff: "BZh" header
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  char m[3] = {0, 0, 0};
  size_t got = fread(m, 1, 3, f);
  fclose(f);
  return got == 3 && m[0] == 'B' && m[1] == 'Z' && m[2] == 'h';
}

struct Segment {
  std::vector<uint8_t> codes;
  // offset of the source READ's middle k-mer within this segment, or -1
  // (the reference seeds unitig traversal from read middles only,
  // contig_assembly.cpp:2068-2080)
  int64_t seed_pos = -1;
};

uint8_t g_ascii2code[256];

void init_tables() {
  static bool done = false;
  if (done) return;
  memset(g_ascii2code, CODE_N, sizeof(g_ascii2code));
  g_ascii2code['A'] = g_ascii2code['a'] = 0;
  g_ascii2code['C'] = g_ascii2code['c'] = 1;
  g_ascii2code['G'] = g_ascii2code['g'] = 2;
  g_ascii2code['T'] = g_ascii2code['t'] = 3;
  done = true;
}

class SeqFile {
 public:
  explicit SeqFile(const std::string& path) {
    if (is_bz2_path(path)) {
      bz_ = new Bz2File(path);
      if (!bz_->ok()) {
        delete bz_;
        bz_ = nullptr;
      }
      return;
    }
    gz_ = gzopen(path.c_str(), "rb");
    if (gz_) gzbuffer(gz_, 1u << 24);
  }
  ~SeqFile() {
    if (gz_) gzclose(gz_);
    delete bz_;
  }
  bool ok() const { return gz_ != nullptr || bz_ != nullptr; }
  int read(char* buf, unsigned len) {
    if (bz_) return bz_->read(buf, len);
    return gzread(gz_, buf, len);
  }

 private:
  gzFile gz_ = nullptr;  // zlib transparently handles plain files too
  Bz2File* bz_ = nullptr;
};

class Reader {
 public:
  Reader(std::vector<std::string> paths, int k, int n_threads)
      : paths_(std::move(paths)), k_(k) {
    init_tables();
    n_threads = std::max(1, n_threads);
    next_file_.store(0);
    active_ = 0;
    for (int i = 0; i < n_threads; i++) {
      active_++;
      threads_.emplace_back([this] { worker(); });
    }
  }

  ~Reader() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    for (auto& t : threads_) t.join();
  }

  // Fill up to B rows of (B, L) codes + lengths.  Long segments tile into
  // rows with k-1 overlap (identical to io/fastq.Batcher); a segment that
  // doesn't fit in the current batch resumes in the next call.  Returns
  // rows written; 0 means end of stream.
  int next_batch(uint8_t* codes, int32_t* lengths, int B, int L,
                 int32_t* seed_cols = nullptr) {
    int row = 0;
    const size_t step = (size_t)L - k_ + 1;
    if (seed_cols)
      for (int r = 0; r < B; r++) seed_cols[r] = -1;
    while (row < B) {
      if (!has_pending_) {
        std::unique_lock<std::mutex> lk(mu_);
        if (segments_.empty()) {
          if (active_ == 0) break;
          cv_data_.wait(lk,
                        [this] { return !segments_.empty() || active_ == 0; });
          continue;
        }
        pending_ = std::move(segments_.front());
        segments_.pop_front();
        queued_bytes_ -= pending_.codes.size();
        pending_off_ = 0;
        has_pending_ = true;
        cv_space_.notify_all();
      }
      const size_t n = pending_.codes.size();
      while (row < B) {
        const size_t off = pending_off_;
        if (off + k_ > n) {
          has_pending_ = false;
          break;
        }
        const size_t len = std::min((size_t)L, n - off);
        uint8_t* dst = codes + (size_t)row * L;
        memcpy(dst, pending_.codes.data() + off, len);
        if ((int)len < L) memset(dst + len, CODE_PAD, L - len);
        lengths[row] = (int32_t)len;
        if (seed_cols && pending_.seed_pos >= 0 &&
            (size_t)pending_.seed_pos >= off &&
            (size_t)pending_.seed_pos < off + step)
          seed_cols[row] = (int32_t)(pending_.seed_pos - off);
        row++;
        if (off + len >= n) {
          has_pending_ = false;
          break;
        }
        pending_off_ = off + step;
      }
    }
    return row;
  }

  bool failed() const { return failed_.load(); }

  // Packed variant: fills packed u8[B, L/4] (2-bit codes, little-endian
  // within the byte) + nmask u8[B, L/8] (bit j%8 set iff code >= 4),
  // exactly the ops/packio.pack_np layout, so batches cross the host ->
  // device link at 2.25 bits/base without a Python packing pass.
  // L must be a multiple of 8.
  int next_batch_packed(uint8_t* packed, uint8_t* nmask, int32_t* lengths,
                        int B, int L, int32_t* seed_cols = nullptr) {
    scratch_.assign((size_t)B * L, CODE_PAD);
    int rows = next_batch(scratch_.data(), lengths, B, L, seed_cols);
    const int Lq = L / 4, Lo = L / 8;
    memset(packed, 0, (size_t)B * Lq);
    memset(nmask, 0, (size_t)B * Lo);
    for (int r = 0; r < rows; r++) {
      const uint8_t* src = scratch_.data() + (size_t)r * L;
      uint8_t* pd = packed + (size_t)r * Lq;
      uint8_t* nm = nmask + (size_t)r * Lo;
      for (int i = 0; i < Lq; i++) {
        const uint8_t c0 = src[4 * i], c1 = src[4 * i + 1];
        const uint8_t c2 = src[4 * i + 2], c3 = src[4 * i + 3];
        pd[i] = (uint8_t)((c0 & 3) | ((c1 & 3) << 2) | ((c2 & 3) << 4) |
                          ((c3 & 3) << 6));
      }
      for (int j = 0; j < L; j++) {
        if (src[j] >= 4) nm[j >> 3] |= (uint8_t)(1u << (j & 7));
      }
    }
    // pad rows: all-N mask (device unpack turns them into PAD codes)
    for (int r = rows; r < B; r++) {
      memset(nmask + (size_t)r * Lo, 0xFF, Lo);
      lengths[r] = 0;
    }
    return rows;
  }

 private:
  void worker() {
    std::vector<char> buf(CHUNK + (1u << 16));
    std::string carry;
    for (;;) {
      int fi = next_file_.fetch_add(1);
      if (fi >= (int)paths_.size()) break;
      SeqFile f(paths_[fi]);
      if (!f.ok()) {
        failed_.store(true);
        break;
      }
      carry.clear();
      bool fasta = false, first = true;
      std::string fasta_seq;
      for (;;) {
        int got = f.read(buf.data(), CHUNK);
        if (got < 0) {
          failed_.store(true);
          break;
        }
        if (got == 0) {
          if (!carry.empty()) parse_block(carry, fasta, first, fasta_seq, true);
          else if (fasta && !fasta_seq.empty()) emit_read(fasta_seq), fasta_seq.clear();
          break;
        }
        carry.append(buf.data(), got);
        parse_block(carry, fasta, first, fasta_seq, false);
        {
          std::unique_lock<std::mutex> lk(mu_);
          cv_space_.wait(lk, [this] {
            return queued_bytes_ < (64u << 20) || stop_;
          });
          if (stop_) break;
        }
      }
      if (stop_) break;
    }
    std::lock_guard<std::mutex> g(mu_);
    active_--;
    cv_data_.notify_all();
  }

  // Parse complete lines out of `carry` (keeping any trailing partial line),
  // dispatching FASTQ 4-line records or FASTA multi-line records.
  void parse_block(std::string& carry, bool& fasta, bool& first,
                   std::string& fasta_seq, bool eof) {
    size_t pos = 0;
    int fq_phase = -1;  // within a 4-line fastq record: 0 hdr,1 seq,2 plus,3 qual
    if (first && !carry.empty()) {
      fasta = carry[0] == '>';
      first = false;
    }
    std::vector<std::pair<size_t, size_t>> lines;
    for (;;) {
      size_t nl = carry.find('\n', pos);
      if (nl == std::string::npos) break;
      lines.emplace_back(pos, nl - pos);
      pos = nl + 1;
    }
    if (eof && pos < carry.size()) {
      lines.emplace_back(pos, carry.size() - pos);
      pos = carry.size();
    }
    if (fasta) {
      for (auto [s, l] : lines) {
        while (l && (carry[s + l - 1] == '\r')) l--;
        if (l == 0) continue;
        if (carry[s] == '>') {
          if (!fasta_seq.empty()) {
            emit_read(fasta_seq);
            fasta_seq.clear();
          }
        } else {
          fasta_seq.append(carry, s, l);
        }
      }
      if (eof && !fasta_seq.empty()) {
        emit_read(fasta_seq);
        fasta_seq.clear();
      }
    } else {
      // fastq: consume only complete 4-line groups; leave the rest
      size_t complete = lines.size() / 4 * 4;
      for (size_t i = 0; i < complete; i += 4) {
        auto [s, l] = lines[i + 1];
        while (l && (carry[s + l - 1] == '\r')) l--;
        if (l) {
          std::string seq(carry, s, l);
          emit_read(seq);
        }
      }
      if (complete < lines.size()) pos = lines[complete].first;
      else if (!lines.empty()) pos = lines[complete - 1].first + lines[complete - 1].second + 1;
      else pos = 0;
      (void)fq_phase;
    }
    carry.erase(0, pos);
  }

  // Encode + N-segment one read and queue its segments.
  void emit_read(const std::string& seq) {
    const int k = k_;
    const size_t n = seq.size();
    std::vector<uint8_t> codes(n);
    for (size_t i = 0; i < n; i++) codes[i] = g_ascii2code[(uint8_t)seq[i]];
    // read-middle seed k-mer (reference find_unitigs_mt_master seeding,
    // contig_assembly.cpp:2068-2080): skipped when it contains an N; an
    // N-free window lies entirely inside one segment
    const size_t middle = n / 2;
    bool seed_ok = middle + k <= n;
    if (seed_ok)
      for (size_t i = middle; i < middle + k; i++)
        if (codes[i] == CODE_N) { seed_ok = false; break; }
    size_t start = 0;
    std::vector<Segment> segs;
    auto push_seg = [&](size_t s, size_t e) {
      Segment sg;
      sg.codes.assign(codes.begin() + s, codes.begin() + e);
      if (seed_ok && s <= middle && middle + k <= e)
        sg.seed_pos = (int64_t)(middle - s);
      segs.push_back(std::move(sg));
    };
    for (size_t i = 0; i < n; i++) {
      if (codes[i] == CODE_N && i >= start + k) {
        push_seg(start, i);
        start = i + 1;
      }
    }
    if (n >= start + k) push_seg(start, n);
    if (segs.empty()) return;
    std::lock_guard<std::mutex> g(mu_);
    for (auto& s : segs) {
      if ((int)s.codes.size() < k) continue;
      queued_bytes_ += s.codes.size();
      segments_.push_back(std::move(s));
    }
    cv_data_.notify_all();
  }

  std::vector<std::string> paths_;
  int k_;
  std::vector<std::thread> threads_;
  std::atomic<int> next_file_;
  std::atomic<bool> failed_{false};
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::deque<Segment> segments_;
  Segment pending_;
  size_t pending_off_ = 0;
  bool has_pending_ = false;
  size_t queued_bytes_ = 0;
  int active_ = 0;
  bool stop_ = false;
  std::vector<uint8_t> scratch_;
};

}  // namespace

extern "C" {

// ABI version: bump when exported signatures change so the Python loader
// can detect a stale libshasm.so and rebuild (io/native.py).
int shr_abi_version() { return 3; }

// 1 iff libbz2 bound at runtime (io/native.py falls back to the Python
// reader for .bz2 inputs when 0).
int shr_has_bz2() { return bz2_api().ok() ? 1 : 0; }

void* shr_open(const char** paths, int n_paths, int k, int n_threads) {
  std::vector<std::string> v;
  for (int i = 0; i < n_paths; i++) v.emplace_back(paths[i]);
  return new Reader(std::move(v), k, n_threads);
}

int shr_next_batch(void* h, uint8_t* codes, int32_t* lengths, int B, int L,
                   int32_t* seed_cols) {
  return static_cast<Reader*>(h)->next_batch(codes, lengths, B, L, seed_cols);
}

int shr_next_batch_packed(void* h, uint8_t* packed, uint8_t* nmask,
                          int32_t* lengths, int B, int L,
                          int32_t* seed_cols) {
  return static_cast<Reader*>(h)->next_batch_packed(packed, nmask, lengths,
                                                    B, L, seed_cols);
}

int shr_failed(void* h) { return static_cast<Reader*>(h)->failed() ? 1 : 0; }

void shr_close(void* h) { delete static_cast<Reader*>(h); }

}  // extern "C"
