// Test-only oracle harness: drives the REFERENCE's counting hot loop —
// its own nthash.hpp rolling hash + gqf.c insert1_advance — on a FASTQ
// stream with the exact reads_to_kmers semantics (t=1), then optionally
// runs the reference's end-of-stream deNoise sweep and qf_serialize's the
// filter.  This is the strongest possible hot-loop parity check: our
// cli.cqf_denoise must produce a byte-identical .ser file.
//
// Replicated verbatim from /root/reference/cqf/CQF_mt.h:610-731
// (reads_to_kmers): NTPC64 base hash on the first window, O(1) rolling
// for the rest, canonical = min(fh, rh) % range, count=1 inserts; on an
// 'N' at offset >= k the read restarts just past the N (Ns inside the
// first window hash with seed 0).  End sweep per CQF_mt.h:858-931 with
// qf_clean_singleton_discrete over the populated range.  Metadata
// nelts/ndistinct bookkeeping per CQF_mt.h:981-994 and 1037-1038.
//
// Usage: ref_count <qb> <hb> <k> <out.ser> [--endDeNoise] < reads.fastq
//
// Not part of the engine; boost-free (the reference's multithreaded
// runtime needs boost, which this image lacks — the hot loop itself does
// not).
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>

struct CQF_runtime_mt;
#include "gqf.h"
#include "nthash.hpp"

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr,
            "usage: ref_count <qb> <hb> <k> <out.ser> [--endDeNoise]\n");
    return 2;
  }
  uint64_t qb = strtoull(argv[1], 0, 10);
  uint64_t hb = strtoull(argv[2], 0, 10);
  unsigned k = (unsigned)strtoul(argv[3], 0, 10);
  const char* out = argv[4];
  bool end_denoise = argc > 5 && !strcmp(argv[5], "--endDeNoise");

  QF qf;
  qf_init(&qf, 1ULL << qb, hb, 0, true, "", 2038074761u);
  uint64_t range = qf.metadata->range;
  uint64_t nelts = 0, ndistinct = 0;
  bool isNew;

  char* line = 0;
  size_t cap_line = 0;
  ssize_t len;
  int lineno = 0;
  std::string read;
  while ((len = getline(&line, &cap_line, stdin)) != -1) {
    int which = lineno++ % 4;
    if (which != 1) continue;  // sequence line of the 4-line record
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) len--;
    read.assign(line, (size_t)len);

    uint64_t hash, hash_RC;
  start_read:
    if (read.length() < k) continue;
    NTPC64(read.c_str(), k, hash, hash_RC);
    {
      uint64_t key = (hash < hash_RC ? hash : hash_RC) % range;
      qf_insert_advance(&qf, key, 0, 1, false, false, isNew);
      nelts++;
      if (isNew) ndistinct++;
    }
    for (uint32_t i = k; i < read.length(); i++) {
      if (read[i] == 'N') {
        read = read.substr(i + 1, read.length());
        goto start_read;
      }
      NTPC64(read[i - k], read[i], k, hash, hash_RC);
      uint64_t key = (hash < hash_RC ? hash : hash_RC) % range;
      qf_insert_advance(&qf, key, 0, 1, false, false, isNew);
      nelts++;
      if (isNew) ndistinct++;
    }
  }
  free(line);

  if (end_denoise) {
    uint64_t removed = 0;
    uint64_t start = find_first_nonempty_slot(&qf, 0);
    if (start < qf.metadata->nslots)
      qf_clean_singleton_discrete(&qf, start, qf.metadata->nslots, &removed);
    nelts -= removed;
    ndistinct -= removed;
  }

  qf.metadata->nelts = nelts;
  qf.metadata->ndistinct_elts = ndistinct;
  qf_serialize(&qf, out);
  fprintf(stderr, "ref_count: nelts=%llu ndistinct=%llu\n",
          (unsigned long long)nelts, (unsigned long long)ndistinct);
  return 0;
}
