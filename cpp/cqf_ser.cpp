// Streaming reference-format CQF .ser transcoder (C ABI, ctypes).
//
// The Python transcoder (sh_assembly_tpu/formats/cqf_ser.py) materializes
// the whole slot array plus three bool bitplanes in host RAM (~30 B/slot)
// and decodes runs in a Python loop — fine at test scale, prohibitive for
// human-scale filters (tens of GB, hours).  This native version streams
// block-by-block with O(1) memory beyond the caller's (key, count,
// traveled) arrays and reproduces the reference RSQF layout exactly
// (qf_serialize/qf_deserialize, /root/reference/cqf/gqf.c:2379-2420):
//
//   * metadata header (128 B), then nblocks packed blocks of
//     (offset u8 | occupieds u64 | runends u64 | traveled u64 |
//      slots[64 * bits_per_slot / 8])
//   * bucket b = key >> bits_per_slot, remainder = low bits
//   * runs packed left at start >= bucket; remainders ascending
//   * variable-length counter encoding of encode_counter
//     (/root/reference/cqf/gqf.c:1218-1255)
//   * block offset = run_end(64i-1) - (64i-1), saturated at 255
//
// Byte-identity with the Python writer is pinned by
// tests/test_cqf_ser.py::test_native_transcoder_matches_python.
//
// Build: make -C cpp  ->  libshasm.so
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int SLOTS_PER_BLOCK = 64;
constexpr int META_BYTES = 128;

struct Meta {
  uint64_t size = 0;
  uint32_t seed = 0;
  uint64_t nslots = 0, xnslots = 0, key_bits = 0, value_bits = 0;
  uint64_t key_remainder_bits = 0, bits_per_slot = 0;
  uint64_t range_lo = 0, range_hi = 0;
  uint64_t nblocks = 0, nelts = 0, ndistinct = 0, nocc = 0, num_locks = 0;
};

uint64_t isqrt_floor(uint64_t x) {
  // integer sqrt via double (exact for the power-of-two nslots used here;
  // mirrors the Python int(10 * math.sqrt(nslots)) arithmetic)
  double r = __builtin_sqrt((double)x);
  return (uint64_t)r;
}

void fill_meta(Meta& m, uint64_t qb, uint64_t key_bits, uint32_t seed,
               uint64_t nelts, uint64_t ndistinct) {
  m.seed = seed;
  m.nslots = 1ull << qb;
  // xnslots = nslots + 10*sqrt(nslots) with python float truncation
  double xs = (double)m.nslots + 10.0 * __builtin_sqrt((double)m.nslots);
  m.xnslots = (uint64_t)xs;
  m.key_bits = key_bits;
  m.value_bits = 0;
  m.key_remainder_bits = key_bits - qb;
  m.bits_per_slot = m.key_remainder_bits;
  unsigned __int128 range =
      ((unsigned __int128)m.nslots) << m.bits_per_slot;
  m.range_lo = (uint64_t)range;
  m.range_hi = (uint64_t)(range >> 64);
  m.nblocks = (m.xnslots + SLOTS_PER_BLOCK - 1) / SLOTS_PER_BLOCK;
  m.nelts = nelts;
  m.ndistinct = ndistinct;
  m.nocc = 0;
  m.num_locks = m.xnslots / (1ull << 16) + 2;
  m.size = m.nblocks * (25 + SLOTS_PER_BLOCK * m.bits_per_slot / 8);
  (void)isqrt_floor;
}

void pack_meta(const Meta& m, uint8_t* buf) {
  memset(buf, 0, META_BYTES);
  uint8_t* p = buf;
  auto w64 = [&](uint64_t v) { memcpy(p, &v, 8); p += 8; };
  memcpy(p, &m.size, 8); p += 8;
  memcpy(p, &m.seed, 4); p += 8;  // u32 + 4 pad
  w64(m.nslots); w64(m.xnslots); w64(m.key_bits); w64(m.value_bits);
  w64(m.key_remainder_bits); w64(m.bits_per_slot);
  w64(m.range_lo); w64(m.range_hi);
  w64(m.nblocks); w64(m.nelts); w64(m.ndistinct); w64(m.nocc);
  w64(m.num_locks);
}

bool unpack_meta(const uint8_t* buf, Meta& m) {
  const uint8_t* p = buf;
  auto r64 = [&]() { uint64_t v; memcpy(&v, p, 8); p += 8; return v; };
  m.size = r64();
  memcpy(&m.seed, p, 4); p += 8;
  m.nslots = r64(); m.xnslots = r64(); m.key_bits = r64();
  m.value_bits = r64(); m.key_remainder_bits = r64();
  m.bits_per_slot = r64(); m.range_lo = r64(); m.range_hi = r64();
  m.nblocks = r64(); m.nelts = r64(); m.ndistinct = r64(); m.nocc = r64();
  m.num_locks = r64();
  uint64_t bb = 25 + SLOTS_PER_BLOCK * m.bits_per_slot / 8;
  return m.size == m.nblocks * bb && m.bits_per_slot >= 2 &&
         m.bits_per_slot <= 56;
}

// ---------------------------------------------------------------------------
// Writer: sequential run layout with a sliding block window.

class SerWriter {
 public:
  SerWriter(const char* path, uint64_t qb, uint64_t key_bits, uint32_t seed,
            uint64_t nelts, uint64_t ndistinct) {
    fill_meta(m_, qb, key_bits, seed, nelts, ndistinct);
    bb_ = 25 + SLOTS_PER_BLOCK * m_.bits_per_slot / 8;
    f_ = fopen(path, "wb");
    if (!f_) { failed_ = true; return; }
    uint8_t hdr[META_BYTES];
    pack_meta(m_, hdr);
    if (fwrite(hdr, 1, META_BYTES, f_) != META_BYTES) failed_ = true;
    win_.assign(WIN, Block{});
  }

  ~SerWriter() {
    if (f_) fclose(f_);
  }

  bool failed() const { return failed_; }

  // Entries must arrive with strictly increasing keys across all calls.
  bool add(const uint64_t* keys, const int64_t* counts, const uint8_t* trav,
           int64_t n) {
    if (failed_) return false;
    const uint64_t bps = m_.bits_per_slot;
    const uint64_t rmask = (bps >= 64) ? ~0ull : ((1ull << bps) - 1);
    for (int64_t i = 0; i < n; i++) {
      const uint64_t key = keys[i];
      if (has_prev_ && key <= prev_key_) { failed_ = true; return false; }
      prev_key_ = key; has_prev_ = true;
      const int64_t bucket = (int64_t)(key >> bps);
      const uint64_t rem = key & rmask;
      if (bucket != cur_bucket_) {
        end_run();
        // block boundaries x = 64j-1 < bucket are now final: their
        // covering run (last occupied bucket <= x) is the one that just
        // ended (block_offset_strict rule, gqf.c:598-651)
        resolve_below(bucket);
        cur_bucket_ = bucket;
        run_start_ = pos_ > bucket ? pos_ : bucket;
        pos_ = run_start_;
        set_bit(OCC, bucket);
      }
      // encode (rem, count)
      const int64_t cnt = counts[i];
      int64_t entry_pos = pos_;
      if (cnt == 1) {
        put_slot(pos_++, rem);
      } else {
        const uint64_t msb = 1ull << (bps - 1);
        uint64_t digits[72];
        int nd = 0;
        uint64_t c = (uint64_t)(cnt - 1);
        digits[nd++] = c % msb;
        c /= msb;
        while (c) { digits[nd++] = (c % msb) | msb; c /= msb; }
        put_slot(pos_++, rem);
        if (digits[nd - 1] > rem) put_slot(pos_++, 0);
        for (int d = nd - 1; d >= 0; d--) put_slot(pos_++, digits[d]);
      }
      if (trav && trav[i]) set_bit(TRV, entry_pos);
    }
    return !failed_;
  }

  bool close() {
    if (failed_) return false;
    end_run();
    if (pos_ > (int64_t)m_.xnslots) { failed_ = true; return false; }
    resolve_below(INT64_MAX);  // trailing boundaries: covered by last run
    flush_until((int64_t)m_.nblocks);
    return !failed_;
  }

 private:
  enum Plane { OCC = 0, RUN = 1, TRV = 2 };
  struct Block {
    uint64_t bits[3] = {0, 0, 0};
    std::vector<uint8_t> slots;  // bb-25 bytes
  };
  // Sliding window of blocks.  A run can shift right of its bucket by at
  // most the total slack xnslots - nslots = 10*sqrt(nslots) (gqf.c:2197),
  // = 2.6M slots (~41K blocks) at qb=36; 64K blocks (~7 MB) covers every
  // practical geometry, and blk() fails hard if ever exceeded.
  static constexpr int64_t WIN = 65536;

  void end_run() {
    if (cur_bucket_ < 0) return;
    set_bit(RUN, pos_ - 1);
    last_end_ = pos_ - 1;
    last_bucket_ = cur_bucket_;
  }

  // Finalize offsets for every boundary x = 64j - 1 with x < next_bucket:
  // the covering run is the last finished one (its bucket <= x because
  // boundaries below the previous bucket were already resolved).
  void resolve_below(int64_t next_bucket) {
    int64_t nb = (int64_t)m_.nblocks;
    while (next_j_ < nb) {
      int64_t x = next_j_ * SLOTS_PER_BLOCK - 1;
      if (next_bucket != INT64_MAX && x >= next_bucket) break;
      uint8_t off = 0;
      if (last_end_ > x) {
        int64_t d = last_end_ - x;
        off = d > 255 ? 255 : (uint8_t)d;
      }
      if (next_j_ < flushed_) { failed_ = true; return; }
      // a large occupied-bucket gap can resolve more than WIN boundaries
      // in one call: flush the trailing edge first so the ring entry
      // being written never wraps over an unflushed offset (the flushed
      // blocks' slot data is final — writes only ever land at or past
      // the current run start, which is beyond them)
      if (next_j_ >= flushed_ + WIN) flush_until(next_j_ - WIN + 1);
      if (failed_) return;
      roff_[next_j_ % WIN] = off;
      next_j_++;
    }
  }

  Block& blk(int64_t b) {
    // blocks are touched within WIN of the write head; flush those that
    // fell behind, and fail hard on a backward touch into flushed space
    // (cannot happen within the documented slack bound)
    if (b >= flushed_ + WIN) flush_until(b - WIN + 1);
    if (b < flushed_) { failed_ = true; b = flushed_; }
    Block& e = win_[b % WIN];
    if (owner_[b % WIN] != b) {
      owner_[b % WIN] = b;
      e.bits[0] = e.bits[1] = e.bits[2] = 0;
      e.slots.assign(bb_ - 25, 0);
    }
    return e;
  }

  void set_bit(Plane p, int64_t slot) {
    blk(slot / SLOTS_PER_BLOCK).bits[p] |= 1ull << (slot % SLOTS_PER_BLOCK);
  }

  void put_slot(int64_t slot, uint64_t v) {
    Block& e = blk(slot / SLOTS_PER_BLOCK);
    const uint64_t bps = m_.bits_per_slot;
    uint64_t bitoff = (uint64_t)(slot % SLOTS_PER_BLOCK) * bps;
    uint8_t* base = e.slots.data();
    for (uint64_t b = 0; b < bps; b++) {
      uint64_t bit = bitoff + b;
      if ((v >> b) & 1) base[bit >> 3] |= (uint8_t)(1u << (bit & 7));
    }
  }

  void flush_until(int64_t nb) {
    for (; flushed_ < nb && flushed_ < (int64_t)m_.nblocks; flushed_++) {
      int64_t b = flushed_;
      uint8_t off = 0;
      if (b > 0) {
        if (b >= next_j_) { failed_ = true; return; }  // unresolved flush
        off = roff_[b % WIN];
      }
      std::vector<uint8_t> out(bb_, 0);
      Block& e = win_[b % WIN];
      if (owner_[b % WIN] == b) {
        out[0] = off;
        memcpy(&out[1], &e.bits[0], 8);
        memcpy(&out[9], &e.bits[1], 8);
        memcpy(&out[17], &e.bits[2], 8);
        memcpy(&out[25], e.slots.data(), bb_ - 25);
      } else {
        out[0] = off;
      }
      if (fwrite(out.data(), 1, bb_, f_) != bb_) { failed_ = true; return; }
    }
  }

  Meta m_;
  size_t bb_ = 0;
  FILE* f_ = nullptr;
  bool failed_ = false;
  std::vector<Block> win_;
  int64_t owner_[WIN] = {};
  uint8_t roff_[WIN] = {};
  int64_t next_j_ = 1;  // next boundary (block index) to resolve
  int64_t flushed_ = 0;
  int64_t pos_ = 0;
  int64_t cur_bucket_ = -1, run_start_ = 0;
  int64_t last_end_ = -1, last_bucket_ = -1;
  uint64_t prev_key_ = 0;
  bool has_prev_ = false;

 public:
  SerWriter(const SerWriter&) = delete;
  void init_owner() { for (int64_t i = 0; i < WIN; i++) owner_[i] = -1; }
};

// ---------------------------------------------------------------------------
// Reader: sequential block scan with the reference decode state machine.

class SerReader {
 public:
  explicit SerReader(const char* path) {
    f_ = fopen(path, "rb");
    if (!f_) { failed_ = true; return; }
    uint8_t hdr[META_BYTES];
    if (fread(hdr, 1, META_BYTES, f_) != META_BYTES ||
        !unpack_meta(hdr, m_)) {
      failed_ = true;
      return;
    }
    bb_ = 25 + SLOTS_PER_BLOCK * m_.bits_per_slot / 8;
    buf_.resize(bb_);
  }
  ~SerReader() { if (f_) fclose(f_); }

  bool failed() const { return failed_; }
  const Meta& meta() const { return m_; }

  // Fill up to cap entries; returns count (0 = EOF, -1 = error).
  int64_t next(uint64_t* keys, int64_t* counts, uint8_t* trav, int64_t cap) {
    if (failed_) return -1;
    int64_t out = 0;
    const uint64_t bps = m_.bits_per_slot;
    const uint64_t msb = 1ull << (bps - 1);
    const uint64_t lowmask = msb - 1;
    while (out < cap) {
      if (!ensure(cursor_)) break;  // EOF
      // find the next occupied bucket >= bucket_cursor_
      if (!advance_bucket()) break;
      // decode one full run
      int64_t start = cursor_ > bucket_ ? cursor_ : bucket_;
      int64_t p = start;
      for (;;) {
        if (out >= cap && !pending_) {
          // run longer than remaining cap: decode rest next call — but a
          // run is decoded atomically here for simplicity; grow via
          // pending buffer
        }
        if (!ensure(p)) { failed_ = true; return -1; }
        uint64_t rem = get_slot(p);
        uint8_t tv = get_bit(TRV, p) ? 1 : 0;
        bool end_here = get_bit(RUN, p);
        int64_t cnt = 1;
        int64_t q = p;
        if (!end_here) {
          if (!ensure(p + 1)) { failed_ = true; return -1; }
          uint64_t nxt = get_slot(p + 1);
          if (nxt <= rem) {  // counter follows
            q = p + 1;
            if (nxt == 0 && !get_bit(RUN, q)) {
              if (!ensure(q + 1)) { failed_ = true; return -1; }
              q++;
              nxt = get_slot(q);
            }
            uint64_t c = 0;
            while (nxt & msb) {
              c = c * msb + (nxt & lowmask);
              if (!ensure(q + 1)) { failed_ = true; return -1; }
              q++;
              nxt = get_slot(q);
            }
            c = c * msb + nxt;
            cnt = (int64_t)c + 1;
            end_here = get_bit(RUN, q);
          }
        }
        emit(keys, counts, trav, out, cap,
             ((uint64_t)bucket_ << bps) | rem, cnt, tv);
        p = q + 1;
        if (end_here) break;
      }
      cursor_ = p;
      bucket_++;
      // drain pending into out if emit spilled
      if (pending_) return out;  // caller comes back; state saved
    }
    // drain leftover pending (entries emitted past cap)
    return out;
  }

 private:
  enum Plane { OCC = 0, RUN = 1, TRV = 2 };

  bool ensure(int64_t slot) {
    int64_t b = slot / SLOTS_PER_BLOCK;
    if (b >= (int64_t)m_.nblocks) return false;
    if (b == cur_block_) return true;
    if (b != cur_block_ + 1) {
      if (fseek(f_, (long)(META_BYTES + b * (int64_t)bb_), SEEK_SET)) {
        failed_ = true;
        return false;
      }
    }
    if (fread(buf_.data(), 1, bb_, f_) != bb_) { failed_ = true; return false; }
    cur_block_ = b;
    memcpy(&bits_[0], &buf_[1], 8);
    memcpy(&bits_[1], &buf_[9], 8);
    memcpy(&bits_[2], &buf_[17], 8);
    return true;
  }

  bool get_bit(Plane pl, int64_t slot) {
    ensure(slot);
    return (bits_[pl] >> (slot % SLOTS_PER_BLOCK)) & 1;
  }

  uint64_t get_slot(int64_t slot) {
    ensure(slot);
    const uint64_t bps = m_.bits_per_slot;
    uint64_t bitoff = (uint64_t)(slot % SLOTS_PER_BLOCK) * bps;
    const uint8_t* base = buf_.data() + 25;
    uint64_t v = 0;
    for (uint64_t b = 0; b < bps; b++) {
      uint64_t bit = bitoff + b;
      if (base[bit >> 3] & (1u << (bit & 7))) v |= 1ull << b;
    }
    return v;
  }

  bool advance_bucket() {
    // scan occupieds bitplane from bucket_ forward
    while (bucket_ < (int64_t)(m_.nblocks * SLOTS_PER_BLOCK)) {
      if (!ensure(bucket_)) return false;
      int64_t word_block = bucket_ / SLOTS_PER_BLOCK;
      uint64_t w = 0;
      {
        // bits_ holds cur_block_'s planes; ensure() above set it
        w = bits_[OCC] >> (bucket_ % SLOTS_PER_BLOCK);
      }
      if (w) {
        bucket_ += __builtin_ctzll(w);
        return true;
      }
      bucket_ = (word_block + 1) * SLOTS_PER_BLOCK;
    }
    return false;
  }

  void emit(uint64_t* keys, int64_t* counts, uint8_t* trav, int64_t& out,
            int64_t cap, uint64_t key, int64_t cnt, uint8_t tv) {
    if (out < cap) {
      keys[out] = key;
      counts[out] = cnt;
      if (trav) trav[out] = tv;
      out++;
    } else {
      pend_k_.push_back(key);
      pend_c_.push_back(cnt);
      pend_t_.push_back(tv);
      pending_ = true;
    }
  }

 public:
  int64_t drain(uint64_t* keys, int64_t* counts, uint8_t* trav,
                int64_t cap) {
    int64_t n = (int64_t)pend_k_.size();
    if (n > cap) n = cap;
    for (int64_t i = 0; i < n; i++) {
      keys[i] = pend_k_[i];
      counts[i] = pend_c_[i];
      if (trav) trav[i] = pend_t_[i];
    }
    pend_k_.erase(pend_k_.begin(), pend_k_.begin() + n);
    pend_c_.erase(pend_c_.begin(), pend_c_.begin() + n);
    pend_t_.erase(pend_t_.begin(), pend_t_.begin() + n);
    pending_ = !pend_k_.empty();
    return n;
  }
  bool has_pending() const { return pending_; }

 private:
  Meta m_;
  size_t bb_ = 0;
  FILE* f_ = nullptr;
  bool failed_ = false;
  std::vector<uint8_t> buf_;
  uint64_t bits_[3] = {0, 0, 0};
  int64_t cur_block_ = -1;
  int64_t cursor_ = 0;   // next undecoded slot
  int64_t bucket_ = 0;   // next bucket to consider
  std::vector<uint64_t> pend_k_;
  std::vector<int64_t> pend_c_;
  std::vector<uint8_t> pend_t_;
  bool pending_ = false;
};

}  // namespace

extern "C" {

void* serw_open(const char* path, uint64_t qb, uint64_t key_bits,
                uint32_t seed, uint64_t nelts, uint64_t ndistinct) {
  auto* w = new SerWriter(path, qb, key_bits, seed, nelts, ndistinct);
  w->init_owner();
  if (w->failed()) { delete w; return nullptr; }
  return w;
}

int serw_add(void* h, const uint64_t* keys, const int64_t* counts,
             const uint8_t* trav, int64_t n) {
  return static_cast<SerWriter*>(h)->add(keys, counts, trav, n) ? 0 : -1;
}

int serw_close(void* h) {
  auto* w = static_cast<SerWriter*>(h);
  int rc = w->close() ? 0 : -1;
  delete w;
  return rc;
}

void* serr_open(const char* path) {
  auto* r = new SerReader(path);
  if (r->failed()) { delete r; return nullptr; }
  return r;
}

void serr_meta(void* h, uint64_t* out8) {
  const Meta& m = static_cast<SerReader*>(h)->meta();
  out8[0] = m.seed;
  out8[1] = m.nslots;
  out8[2] = m.key_bits;
  out8[3] = m.value_bits;
  out8[4] = m.nelts;
  out8[5] = m.ndistinct;
  out8[6] = m.nocc;
  out8[7] = m.nblocks;
}

int64_t serr_next(void* h, uint64_t* keys, int64_t* counts, uint8_t* trav,
                  int64_t cap) {
  auto* r = static_cast<SerReader*>(h);
  if (r->has_pending()) return r->drain(keys, counts, trav, cap);
  return r->next(keys, counts, trav, cap);
}

void serr_close(void* h) { delete static_cast<SerReader*>(h); }

}  // extern "C"
