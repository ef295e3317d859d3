// Native page allocator for the paged-KV serving runtime.
//
// C ABI consumed from Python via ctypes (no pybind11 in this environment).
// Mirrors runtime/kv_cache.py::PageAllocator exactly: a LIFO free list of
// page ids plus per-sequence page tables and lengths.  The host-side decode
// loop calls ensure_capacity / page_indices / lengths once per step per
// batch; the batched queries here replace Python-loop + list-of-list
// traversal with flat array fills (~45us -> ~2us for a 32-sequence step).
//
// Keys are int64 handles; the Python wrapper interns arbitrary sequence ids.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
  int32_t page_size;
  std::vector<int32_t> free_pages;  // LIFO: pop from back
  std::vector<int32_t> refs;        // per-page reference counts
  std::unordered_map<int64_t, std::vector<int32_t>> tables;
  std::unordered_map<int64_t, int64_t> lengths;

  int64_t pages_needed(int64_t tokens) const {
    if (tokens < 1) tokens = 1;
    return (tokens + page_size - 1) / page_size;
  }
};

}  // namespace

extern "C" {

Allocator* pa_create(int32_t num_pages, int32_t page_size) {
  auto* a = new Allocator();
  a->page_size = page_size;
  a->refs.assign(num_pages, 0);
  a->free_pages.reserve(num_pages);
  // Same order as the Python free list: list(range(n-1, -1, -1)) popped
  // from the back means page 0 is handed out first.
  for (int32_t p = num_pages - 1; p >= 0; --p) a->free_pages.push_back(p);
  return a;
}

void pa_destroy(Allocator* a) { delete a; }

int32_t pa_num_free(Allocator* a) {
  return static_cast<int32_t>(a->free_pages.size());
}

int32_t pa_can_allocate(Allocator* a, int64_t num_tokens) {
  return a->pages_needed(num_tokens) <=
                 static_cast<int64_t>(a->free_pages.size())
             ? 1
             : 0;
}

// 0 ok, -1 key exists, -2 out of pages
int32_t pa_allocate(Allocator* a, int64_t key, int64_t num_tokens) {
  if (a->tables.count(key)) return -1;
  int64_t need = a->pages_needed(num_tokens);
  if (need > static_cast<int64_t>(a->free_pages.size())) return -2;
  auto& table = a->tables[key];
  table.reserve(need);
  for (int64_t i = 0; i < need; ++i) {
    int32_t p = a->free_pages.back();
    a->free_pages.pop_back();
    a->refs[p] = 1;
    table.push_back(p);
  }
  a->lengths[key] = 0;
  return 0;
}

// Allocate with a shared (refcounted, pre-filled) prefix of pages.
// 0 ok, -1 key exists, -2 out of pages.
int32_t pa_allocate_mixed(Allocator* a, int64_t key,
                          const int32_t* shared, int32_t n_shared,
                          int64_t num_tokens) {
  if (a->tables.count(key)) return -1;
  int64_t need = a->pages_needed(num_tokens) - n_shared;
  if (need > static_cast<int64_t>(a->free_pages.size())) return -2;
  auto& table = a->tables[key];
  table.reserve(n_shared + (need > 0 ? need : 0));
  for (int32_t i = 0; i < n_shared; ++i) {
    a->refs[shared[i]] += 1;
    table.push_back(shared[i]);
  }
  for (int64_t i = 0; i < need; ++i) {
    int32_t p = a->free_pages.back();
    a->free_pages.pop_back();
    a->refs[p] = 1;
    table.push_back(p);
  }
  a->lengths[key] = 0;
  return 0;
}

void pa_add_ref(Allocator* a, const int32_t* pages, int32_t n) {
  for (int32_t i = 0; i < n; ++i) a->refs[pages[i]] += 1;
}

void pa_ref_counts(Allocator* a, const int32_t* pages, int32_t n,
                   int32_t* out) {
  for (int32_t i = 0; i < n; ++i) out[i] = a->refs[pages[i]];
}

void pa_release(Allocator* a, const int32_t* pages, int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t p = pages[i];
    if (--a->refs[p] <= 0) {
      a->refs[p] = 0;
      a->free_pages.push_back(p);
    }
  }
}

// 0 ok, -1 missing key, -2 out of pages
int32_t pa_ensure_capacity(Allocator* a, int64_t key, int64_t new_len) {
  auto it = a->tables.find(key);
  if (it == a->tables.end()) return -1;
  int64_t need = (new_len + a->page_size - 1) / a->page_size;
  auto& table = it->second;
  while (static_cast<int64_t>(table.size()) < need) {
    if (a->free_pages.empty()) return -2;
    int32_t p = a->free_pages.back();
    a->free_pages.pop_back();
    a->refs[p] = 1;
    table.push_back(p);
  }
  return 0;
}

int32_t pa_free(Allocator* a, int64_t key) {
  auto it = a->tables.find(key);
  if (it == a->tables.end()) return -1;
  auto& table = it->second;
  // Python frees with extend(reversed(pages)) so reuse order matches;
  // shared pages only return to the free list at refcount 0.
  for (auto rit = table.rbegin(); rit != table.rend(); ++rit) {
    int32_t p = *rit;
    if (--a->refs[p] <= 0) {
      a->refs[p] = 0;
      a->free_pages.push_back(p);
    }
  }
  a->tables.erase(it);
  a->lengths.erase(key);
  return 0;
}

int64_t pa_get_length(Allocator* a, int64_t key) {
  auto it = a->lengths.find(key);
  return it == a->lengths.end() ? -1 : it->second;
}

int32_t pa_set_length(Allocator* a, int64_t key, int64_t len) {
  auto it = a->lengths.find(key);
  if (it == a->lengths.end()) return -1;
  it->second = len;
  return 0;
}

int32_t pa_table_len(Allocator* a, int64_t key) {
  auto it = a->tables.find(key);
  return it == a->tables.end() ? -1 : static_cast<int32_t>(it->second.size());
}

// Copy one table into out (cap entries max); returns count or -1.
int32_t pa_get_table(Allocator* a, int64_t key, int32_t* out, int32_t cap) {
  auto it = a->tables.find(key);
  if (it == a->tables.end()) return -1;
  int32_t n = static_cast<int32_t>(it->second.size());
  if (n > cap) n = cap;
  std::memcpy(out, it->second.data(), n * sizeof(int32_t));
  return n;
}

// Fill out[n, pages_per_seq] (zero-padded) for a batch of keys; 0 ok.
int32_t pa_page_indices(Allocator* a, const int64_t* keys, int32_t n,
                        int32_t pages_per_seq, int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t* row = out + static_cast<int64_t>(i) * pages_per_seq;
    std::memset(row, 0, pages_per_seq * sizeof(int32_t));
    auto it = a->tables.find(keys[i]);
    if (it == a->tables.end()) continue;
    int32_t m = static_cast<int32_t>(it->second.size());
    if (m > pages_per_seq) m = pages_per_seq;
    std::memcpy(row, it->second.data(), m * sizeof(int32_t));
  }
  return 0;
}

// Fill out[n] with lengths (0 for missing keys); 0 ok.
int32_t pa_lengths(Allocator* a, const int64_t* keys, int32_t n,
                   int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    auto it = a->lengths.find(keys[i]);
    out[i] = it == a->lengths.end() ? 0 : static_cast<int32_t>(it->second);
  }
  return 0;
}

// The decode hot path fused into ONE boundary crossing: for every key,
// read pos = length, grow the table to hold pos+1, emit the token's page
// row/offset, the (padded) page table and the new length, then advance the
// stored length.  Returns 0, or -2 on page exhaustion (state before the
// failing key is already advanced — callers treat this as fatal).
// wrap_tokens > 0 = rolling ring (sliding-window serving): the write slot
// is pos % wrap, capacity never grows past the ring, positions/lens stay
// TRUE (the engine clamps the attention length to the window).
// sink_tokens (with wrap) pins the FIRST sink_tokens slots (StreamingLLM
// attention sinks): positions below it write in place, later positions
// ring over the wrap_tokens slots after it.
int32_t pa_decode_step(Allocator* a, const int64_t* keys, int32_t n,
                       int32_t pages_per_seq, int32_t wrap_tokens,
                       int32_t sink_tokens,
                       int32_t* rows, int32_t* offs,
                       int32_t* tbl, int32_t* positions, int32_t* lens) {
  for (int32_t i = 0; i < n; ++i) {
    auto lit = a->lengths.find(keys[i]);
    auto tit = a->tables.find(keys[i]);
    if (lit == a->lengths.end() || tit == a->tables.end()) return -1;
    int64_t pos = lit->second;
    int64_t idx = pos;
    if (wrap_tokens > 0 && pos >= sink_tokens)
      idx = sink_tokens + (pos - sink_tokens) % wrap_tokens;
    int64_t cap = pos + 1;
    int64_t cap_max = wrap_tokens + sink_tokens;
    if (wrap_tokens > 0 && cap > cap_max) cap = cap_max;
    int64_t need = (cap + a->page_size - 1) / a->page_size;
    auto& table = tit->second;
    while (static_cast<int64_t>(table.size()) < need) {
      if (a->free_pages.empty()) return -2;
      int32_t p = a->free_pages.back();
      a->free_pages.pop_back();
      a->refs[p] = 1;
      table.push_back(p);
    }
    rows[i] = table[idx / a->page_size];
    offs[i] = static_cast<int32_t>(idx % a->page_size);
    positions[i] = static_cast<int32_t>(pos);
    lens[i] = static_cast<int32_t>(pos + 1);
    int32_t* row_out = tbl + static_cast<int64_t>(i) * pages_per_seq;
    std::memset(row_out, 0, pages_per_seq * sizeof(int32_t));
    int32_t m = static_cast<int32_t>(table.size());
    if (m > pages_per_seq) m = pages_per_seq;
    std::memcpy(row_out, table.data(), m * sizeof(int32_t));
    lit->second = pos + 1;
  }
  return 0;
}

}  // extern "C"
