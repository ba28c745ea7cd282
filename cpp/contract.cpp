// Native unitig-chain contraction (C ABI, ctypes).
//
// The chain forest from the Contiger's probe phase (chain_next[a] =
// oriented successor when the edge is contractible, else -1) consists of
// pure paths and pure cycles: chain targets are unique (the indeg-1 rule,
// models/contiger.build_oriented_graph), so no tree can enter a cycle.
// The device pointer-jumping formulation needs ~log2(M) rounds of large
// random gathers (slow on TPU); the output feeds the HOST assembly pass
// anyway, so a sequential O(M) native walk is both simpler and ~10x
// faster: one pass builds prev[], one walks every root's path, one walks
// the remaining cycles from their minimum index (the deterministic cycle
// cut, reference cycle-closure semantics contig_assembly.cpp:3176-3183).
//
// Semantics identical to models/contiger.contract_paths (pinned by
// tests/test_contiger.py through the shared finalize path):
//   head[a]   = first node of a's path (cycles: minimum index)
//   dist[a]   = steps from head
//   is_tail[a]= last node of the path (cycles: the node whose next==head)
//
// Build: make -C cpp  ->  libshasm.so
#include <cstdint>
#include <vector>

extern "C" {

// next: int32[M] (-1 = none); outputs head/dist int32[M], is_tail u8[M].
// Returns 0 on success, -1 on malformed input (out-of-range target).
int shc_contract(const int32_t* next, int64_t M, int32_t* head,
                 int32_t* dist, uint8_t* is_tail) {
  std::vector<int32_t> prev(M, -1);
  for (int64_t a = 0; a < M; a++) {
    int32_t b = next[a];
    if (b >= 0) {
      if (b >= M) return -1;
      prev[b] = (int32_t)a;
    }
    head[a] = (int32_t)a;
    dist[a] = 0;
    is_tail[a] = next[a] < 0;
  }
  std::vector<uint8_t> visited(M, 0);
  // tree paths from every root (no prev)
  for (int64_t r = 0; r < M; r++) {
    if (prev[r] >= 0) continue;
    int32_t d = 0;
    int64_t x = r;
    for (;;) {
      visited[x] = 1;
      head[x] = (int32_t)r;
      dist[x] = d++;
      int32_t nx = next[x];
      if (nx < 0) {
        is_tail[x] = 1;
        break;
      }
      x = nx;
    }
  }
  // cycles: every unvisited node; ascending scan makes the first node of
  // each cycle its minimum index = the deterministic cut point
  for (int64_t c = 0; c < M; c++) {
    if (visited[c]) continue;
    int32_t d = 0;
    int64_t x = c;
    for (;;) {
      visited[x] = 1;
      head[x] = (int32_t)c;
      dist[x] = d++;
      int32_t nx = next[x];
      if (nx == (int32_t)c) {
        is_tail[x] = 1;
        break;
      }
      if (nx < 0) break;  // defensive: not a well-formed cycle
      x = nx;
    }
  }
  return 0;
}

}  // extern "C"
