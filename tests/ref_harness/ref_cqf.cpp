// Test-only oracle harness: links the REFERENCE gqf.c (read-only at
// /root/reference) to validate our .ser transcoder and counting semantics
// bit-for-bit against the original implementation.  Not part of the engine.
//
//   ref_cqf build <qb> <hb> <out.ser>   reads "key count [traveled]" lines
//   ref_cqf dump  <in.ser>              writes "key count traveled" lines
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
struct CQF_runtime_mt;
#include "gqf.h"

int main(int argc, char** argv) {
  if (argc < 2) return 2;
  if (!strcmp(argv[1], "build")) {
    uint64_t qb = strtoull(argv[2], 0, 10);
    uint64_t hb = strtoull(argv[3], 0, 10);
    QF qf;
    qf_init(&qf, 1ULL << qb, hb, 0, true, "", 2038074761u);
    uint64_t key, count; int trav;
    char line[256];
    while (fgets(line, sizeof line, stdin)) {
      trav = 0;
      int n = sscanf(line, "%llu %llu %d", (unsigned long long*)&key,
                     (unsigned long long*)&count, &trav);
      if (n < 2) continue;
      qf_insert(&qf, key, 0, count, false, false);
      if (trav) { uint64_t c; qf_count_key_value_set_traveled(&qf, key, 0, &c); }
    }
    qf_serialize(&qf, argv[4]);
    return 0;
  }
  if (!strcmp(argv[1], "dump")) {
    QF qf;
    qf_deserialize(&qf, argv[2]);
    QFi qfi;
    if (qf_iterator(&qf, &qfi, 0)) {
      do {
        uint64_t key, value, count;
        qfi_get(&qfi, &key, &value, &count);
        int trav = qf_count_key_value_is_traveled(&qf, key, 0, &count) ? 1 : 0;
        printf("%llu %llu %d\n", (unsigned long long)key,
               (unsigned long long)count, trav);
      } while (!qfi_next(&qfi));
    }
    return 0;
  }
  return 2;
}
