// Test-only oracle harness: drives the REFERENCE's unitig traversal — its
// own gqf.c traveled-bit queries + nthash.hpp rolling probes — over a
// .ser filter and a FASTQ stream, with the exact single-thread semantics
// of find_unitigs_mt_master / get_unitig_forward / check_unitig /
// track_kmer_worker / build_graph_worker
// (/root/reference/src/contig_assembly.cpp:191-630, 935-1084, 2034-3218).
// Our cli.contiger must produce the same unitig SET + link multiset (ids
// are traversal-order dependent in the reference, so the pytest driver
// compares canonicalized sets, tests/test_ref_contiger.py).
//
// Boost/TBB-free: boost is CLI/thread glue in the reference and TBB only
// provides the concurrent map — a std::unordered_map is semantically
// identical single-threaded.  DNAString is replaced by std::string (the
// map key equality/content is the base sequence either way).
//
// Usage: ref_contiger <in.ser> <k> <abundance_min> <solid_min> <solid_max>
//                     <out.fa> < reads.fastq
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <cctype>
#include <deque>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

struct CQF_runtime_mt;
#include "gqf.h"
#include "nthash.hpp"

static const char BASES[4] = {'A', 'C', 'G', 'T'};

static char rc_base(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    default: return 'A';
  }
}

static std::string rc_dna(const std::string& s) {
  std::string r(s.rbegin(), s.rend());
  for (auto& c : r) c = rc_base(c);
  return r;
}

// reference median (Utility.cpp:27-40); Contig.median_abundance is an int,
// so the double truncates on store (Utility.h:28-55)
static double median_ref(std::vector<int>& nums) {
  if (nums.empty()) return 0;
  if (nums.size() == 1) return nums[0];
  std::sort(nums.begin(), nums.end());
  size_t tmp = nums.size() / 2;
  if (nums.size() % 2 == 0) return (nums[tmp - 1] + nums[tmp]) / 2.0;
  return nums[tmp];
}

struct Contig {
  std::string seq;
  int median_abundance = 0;
  Contig() {}
  Contig(const std::string& s, uint64_t c)
      : seq(s), median_abundance((int)c) {}
  void clear() { seq.clear(); }
};

typedef std::unordered_map<std::string, long long> KmerMap;

static QF g_qf;
static uint64_t g_range;

// CQF_mt::count_key_value_set_traveled (CQF_mt.h:506-508): returns
// was-traveled, sets the mark, writes the count
static bool set_traveled(uint64_t key, uint64_t& count) {
  return qf_count_key_value_set_traveled(&g_qf, key, 0, &count);
}

// insert_or_replace (contig_assembly.cpp:3018-3025): min-id wins
static bool insert_or_replace(KmerMap& m, const std::string& kmer,
                              long long idx) {
  auto it = m.find(kmer);
  if (it == m.end() || it->second >= idx) {
    m[kmer] = idx;
    return true;
  }
  return false;
}

// get_unitig_forward, live overload (contig_assembly.cpp:3028-3218)
static void get_unitig_forward(const unsigned K, const uint64_t a_min,
                               std::vector<Contig>& contigs, KmerMap& map,
                               std::deque<size_t>& queue, size_t ci) {
  bool candidates_before[4], candidates_after[4];
  uint64_t ab_befores[4], ab_afters[4];

  std::string first_kmer = contigs[ci].seq.substr(0, K);
  std::string current_kmer =
      contigs[ci].seq.substr(contigs[ci].seq.length() - K);
  std::string current_kmer_RC = rc_dna(current_kmer);

  std::vector<int> abundances(contigs[ci].seq.length() - K + 1,
                              contigs[ci].median_abundance);

  uint64_t cur_h, cur_rh, kmer_h, kmer_rh, kmer_count;
  NTPC64(current_kmer.c_str(), K, cur_h, cur_rh);
  int node_after_x = -1;

  while (true) {
    std::string current_kmer_fix = current_kmer.substr(1);
    for (int x = 0; x < 4; x++)
      candidates_before[x] = candidates_after[x] = false;
    int candidates_before_num = 0, candidates_after_num = 0;
    int nodes_before_num = 0, nodes_after_num = 0;

    // successors: current_kmer_fix + X (contig_assembly.cpp:3064-3087)
    for (int x = 0; x < 4; x++) {
      kmer_h = cur_h;
      kmer_rh = cur_rh;
      uint64_t canon = NTPC64(current_kmer[0], BASES[x], K, kmer_h, kmer_rh);
      bool isTraveled = set_traveled(canon % g_range, kmer_count);
      if (kmer_count >= a_min) {
        if (isTraveled && map.count(current_kmer_fix + BASES[x])) {
          nodes_after_num++;
          ab_afters[x] = kmer_count;
          node_after_x = x;
        } else {
          ab_afters[x] = kmer_count;
          candidates_after[x] = true;
          candidates_after_num++;
        }
      }
    }

    // predecessors via the RC orientation (contig_assembly.cpp:3090-3120):
    // shift the current hash to fix+'A' in place, then the 'T'-swap trick
    NTPC64(current_kmer[0], 'A', K, cur_h, cur_rh);
    std::string kmer = current_kmer_RC;
    for (int x = 0; x < 4; x++) {
      if (BASES[x] == current_kmer_RC[K - 1]) continue;
      kmer[K - 1] = BASES[x];
      kmer_h = cur_h;
      kmer_rh = cur_rh;
      uint64_t canon = NTPC64('T', BASES[x], K, kmer_rh, kmer_h);
      bool isTraveled = set_traveled(canon % g_range, kmer_count);
      if (kmer_count >= a_min) {
        if (isTraveled && map.count(kmer)) {
          nodes_before_num++;
        } else {
          ab_befores[x] = kmer_count;
          candidates_before[x] = true;
          candidates_before_num++;
        }
      }
    }

    if ((nodes_before_num + candidates_before_num) ||
        (nodes_after_num + candidates_after_num) > 1) {
      // branch/merge point (contig_assembly.cpp:3129-3167)
      if (!insert_or_replace(map, current_kmer_RC, (long long)ci)) {
        contigs[ci].clear();
        break;
      }
      contigs[ci].median_abundance = (int)median_ref(abundances);
      for (int x = 0; x < 4; x++) {
        if (candidates_after[x]) {
          std::string nk = current_kmer_fix + BASES[x];
          if (!map.count(nk)) {
            contigs.push_back(Contig(nk, ab_afters[x]));
            map[nk] = (long long)(contigs.size() - 1);
            queue.push_back(contigs.size() - 1);
          }
        }
      }
      kmer = current_kmer_RC;
      for (int x = 0; x < 4; x++) {
        if (candidates_before[x]) {
          kmer[K - 1] = BASES[x];
          if (!map.count(kmer)) {
            contigs.push_back(Contig(kmer, ab_befores[x]));
            map[kmer] = (long long)(contigs.size() - 1);
            queue.push_back(contigs.size() - 1);
          }
        }
      }
      break;
    } else if (candidates_after_num == 1) {
      // linear extension (contig_assembly.cpp:3168-3190)
      int x = 0;
      while (x < 4 && !candidates_after[x]) x++;
      current_kmer = current_kmer_fix + BASES[x];
      if (current_kmer == first_kmer) {  // pure circle
        if (!insert_or_replace(map, first_kmer, (long long)ci) ||
            !insert_or_replace(map, current_kmer_RC, (long long)ci)) {
          contigs[ci].clear();
        } else {
          contigs[ci].median_abundance = (int)median_ref(abundances);
        }
        break;
      }
      current_kmer_RC =
          rc_base(BASES[x]) + current_kmer_RC.substr(0, K - 1);
      contigs[ci].seq += BASES[x];
      abundances.push_back((int)ab_afters[x]);
      NTPC64('T', 'A', K, cur_rh, cur_h);
      NTPC64('T', BASES[x], K, cur_h, cur_rh);
    } else if (nodes_after_num == 1) {
      (void)node_after_x;  // merge into an existing node: finalize
      if (!insert_or_replace(map, current_kmer_RC, (long long)ci)) {
        contigs[ci].clear();
      } else {
        contigs[ci].median_abundance = (int)median_ref(abundances);
      }
      break;
    } else {  // dead end
      if (!insert_or_replace(map, current_kmer_RC, (long long)ci)) {
        contigs[ci].clear();
      } else {
        contigs[ci].median_abundance = (int)median_ref(abundances);
      }
      break;
    }
  }
}

int main(int argc, char** argv) {
  if (argc < 7) {
    fprintf(stderr,
            "usage: ref_contiger <in.ser> <k> <abundance_min> <solid_min> "
            "<solid_max> <out.fa> < reads.fastq\n");
    return 2;
  }
  const char* ser = argv[1];
  unsigned K = (unsigned)strtoul(argv[2], 0, 10);
  uint64_t a_min = strtoull(argv[3], 0, 10);
  uint64_t s_min = strtoull(argv[4], 0, 10);
  uint64_t s_max = strtoull(argv[5], 0, 10);
  const char* out = argv[6];

  qf_deserialize(&g_qf, ser);
  g_range = g_qf.metadata->range;

  std::vector<Contig> contigs(1);  // index 0 is a dummy (main:269)
  KmerMap map;
  std::deque<size_t> queue;

  // master seeding loop (find_unitigs_mt_master, contig_assembly.cpp:
  // 2049-2148): middle k-mer of each read, worker jobs drained inline
  char* line = 0;
  size_t cap_line = 0;
  ssize_t len;
  int lineno = 0;
  std::string seq;
  while ((len = getline(&line, &cap_line, stdin)) != -1) {
    int which = lineno++ % 4;
    if (which != 1) continue;
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) len--;
    seq.assign(line, (size_t)len);
    if (seq.length() < K) continue;
    int seq_len = (int)seq.length();
    int middle = seq_len / 2;
    if (middle > seq_len - (int)K) continue;
    std::string kmer = seq.substr(middle, K);
    for (auto& c : kmer) c = (char)toupper(c);
    if (kmer.find_first_not_of("ACGT") != std::string::npos) continue;
    uint64_t kh, krh, kcount;
    uint64_t canon = NTPC64(kmer.c_str(), K, kh, krh);
    if (set_traveled(canon % g_range, kcount)) continue;
    if (kcount < s_min || kcount > s_max) continue;

    contigs.push_back(Contig(kmer, kcount));
    size_t ci = contigs.size() - 1;
    get_unitig_forward(K, a_min, contigs, map, queue, ci);
    if (!contigs[ci].seq.empty()) {
      auto it = map.find(kmer);
      if (it != map.end()) {
        if (it->second > (long long)ci) {
          contigs[ci].seq = rc_dna(contigs[ci].seq);
          get_unitig_forward(K, a_min, contigs, map, queue, ci);
        } else if (it->second < (long long)ci) {
          contigs[ci].clear();
        }
      } else {
        contigs[ci].seq = rc_dna(contigs[ci].seq);
        get_unitig_forward(K, a_min, contigs, map, queue, ci);
      }
    }
    while (!queue.empty()) {
      size_t wi = queue.front();
      queue.pop_front();
      get_unitig_forward(K, a_min, contigs, map, queue, wi);
    }
  }
  free(line);

  // check_unitig (contig_assembly.cpp:935-954)
  for (size_t ci = 1; ci < contigs.size(); ci++) {
    if (contigs[ci].seq.empty()) continue;
    auto it = map.find(contigs[ci].seq.substr(0, K));
    if (it != map.end()) {
      if (it->second != (long long)ci) contigs[ci].clear();
    } else {
      fprintf(stderr, "[Error] kmer not found!\n");
    }
  }

  // track_kmer_worker (contig_assembly.cpp:956-1010): 1-based ranks
  long long counter = 1;
  int palindromes = 0;
  for (size_t ci = 1; ci < contigs.size(); ci++) {
    if (contigs[ci].seq.empty()) continue;
    std::string first = contigs[ci].seq.substr(0, K);
    std::string lastRC =
        rc_dna(contigs[ci].seq.substr(contigs[ci].seq.length() - K));
    if (first == lastRC) {
      palindromes++;
      map[first] = counter;
    } else {
      map[lastRC] = -counter;
      map[first] = counter;
    }
    counter++;
  }
  fprintf(stderr, "ref_contiger: %lld unitigs, %d palindromes\n",
          counter - 1, palindromes);

  // build_graph_worker (contig_assembly.cpp:1012-1084) + dump (600-629)
  std::ofstream fout(out);
  long long nodup = 0;
  for (size_t ci = 1; ci < contigs.size(); ci++) {
    if (contigs[ci].seq.empty()) continue;
    const std::string& s = contigs[ci].seq;
    fout << ">" << nodup << " LN:i:" << s.length()
         << " KC:i:" << (long long)contigs[ci].median_abundance *
                             (long long)(s.length() - K + 1)
         << " km:f:" << contigs[ci].median_abundance;
    std::string fix_a = s.substr(s.length() - K + 1, K - 1);
    for (int x = 0; x < 4; x++) {
      auto it = map.find(fix_a + BASES[x]);
      if (it != map.end()) {
        long long t = it->second;
        if (t > 0)
          fout << " L:+:" << t - 1 << ":+";
        else
          fout << " L:+:" << -t - 1 << ":-";
      }
    }
    std::string fix_b = rc_dna(s.substr(0, K - 1));
    for (int x = 3; x >= 0; x--) {
      auto it = map.find(fix_b + BASES[x]);
      if (it != map.end()) {
        long long t = it->second;
        if (t > 0)
          fout << " L:-:" << t - 1 << ":+";
        else
          fout << " L:-:" << -t - 1 << ":-";
      }
    }
    fout << "\n" << s << "\n";
    nodup++;
  }
  fout.close();
  return 0;
}
