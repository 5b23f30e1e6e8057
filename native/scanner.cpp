// dpr_scale_tpu native helpers: newline-offset scanning and host-side
// top-k merge. Built as a plain C shared library consumed via ctypes
// (no pybind11 in this environment).
//
// Role parity: the reference builds its mmap line index with a Python
// readline loop (dpr_scale/datamodule/dpr.py:34-41) — a known init-time
// hot spot on 21M-passage corpora (SURVEY.md §3 hot loops). Here the scan
// is multi-threaded memchr over the raw mapping.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>
#include <queue>

extern "C" {

// Count newline characters in buf[0:size).
int64_t dpr_count_lines(const char* buf, int64_t size) {
  if (size <= 0) return 0;
  int nthreads = std::min<int64_t>(std::thread::hardware_concurrency(), 16);
  if (nthreads < 1) nthreads = 1;
  if (size < (1 << 20)) nthreads = 1;
  std::vector<int64_t> counts(nthreads, 0);
  std::vector<std::thread> workers;
  int64_t chunk = (size + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    workers.emplace_back([&, t]() {
      int64_t begin = t * chunk;
      int64_t end = std::min(size, begin + chunk);
      const char* p = buf + begin;
      const char* e = buf + end;
      int64_t n = 0;
      while (p < e) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', e - p));
        if (!nl) break;
        ++n;
        p = nl + 1;
      }
      counts[t] = n;
    });
  }
  for (auto& w : workers) w.join();
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  // A final line without trailing newline still counts as a line.
  if (buf[size - 1] != '\n') total += 1;
  return total;
}

// Write the byte offset of the start of each line into out (caller
// allocates dpr_count_lines() entries). Returns the number written.
int64_t dpr_scan_offsets(const char* buf, int64_t size, uint64_t* out,
                         int64_t capacity) {
  if (size <= 0 || capacity <= 0) return 0;
  int nthreads = std::min<int64_t>(std::thread::hardware_concurrency(), 16);
  if (nthreads < 1) nthreads = 1;
  if (size < (1 << 20)) nthreads = 1;
  int64_t chunk = (size + nthreads - 1) / nthreads;

  // Per-thread local offset vectors; threads scan newlines in their chunk
  // and record the byte AFTER each newline (a line start).
  std::vector<std::vector<uint64_t>> local(nthreads);
  std::vector<std::thread> workers;
  for (int t = 0; t < nthreads; ++t) {
    workers.emplace_back([&, t]() {
      int64_t begin = t * chunk;
      int64_t end = std::min(size, begin + chunk);
      auto& v = local[t];
      v.reserve((end - begin) / 64 + 4);
      const char* p = buf + begin;
      const char* e = buf + end;
      while (p < e) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', e - p));
        if (!nl) break;
        uint64_t start = static_cast<uint64_t>(nl - buf) + 1;
        if (static_cast<int64_t>(start) < size) v.push_back(start);
        p = nl + 1;
      }
    });
  }
  for (auto& w : workers) w.join();

  int64_t n = 0;
  if (n < capacity) out[n++] = 0;  // first line always starts at 0
  for (int t = 0; t < nthreads; ++t) {
    for (uint64_t off : local[t]) {
      if (n >= capacity) return n;
      out[n++] = off;
    }
  }
  return n;
}

// K-way merge of S sorted-descending score shards.
// scores: S * k entries (shard-major), ids: parallel int64 ids.
// Writes the global top-k into out_scores / out_ids. Used by the
// host-side retrieval shard merger (parity with the sequential
// merge+re-topk in reference run_retrieval_pytorch.py:272-277).
void dpr_merge_topk(const float* scores, const int64_t* ids, int64_t nshards,
                    int64_t k, float* out_scores, int64_t* out_ids) {
  // tie order matches the numpy fallback's STABLE descending sort:
  // equal scores resolve to the smaller flat (shard-major) position —
  // the heap key carries -flat so ties pop lowest-position first
  using Entry = std::pair<float, int64_t>;  // (score, -flat index)
  std::priority_queue<Entry> heap;
  for (int64_t s = 0; s < nshards; ++s) {
    if (k > 0) heap.emplace(scores[s * k], -(s * k));
  }
  int64_t written = 0;
  while (written < k && !heap.empty()) {
    auto [score, negflat] = heap.top();
    int64_t flat = -negflat;
    heap.pop();
    out_scores[written] = score;
    out_ids[written] = ids[flat];
    ++written;
    int64_t shard = flat / k;
    int64_t next = flat + 1;
    if (next < (shard + 1) * k) heap.emplace(scores[next], -next);
  }
  for (; written < k; ++written) {
    out_scores[written] = -3.4e38f;
    out_ids[written] = -1;
  }
}

}  // extern "C"
