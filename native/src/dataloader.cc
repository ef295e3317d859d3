// Native prefetching token data loader for the training input pipeline.
//
// C ABI consumed from Python via ctypes (same pattern as page_allocator.cc).
// The Python loader (runtime/data.py::batches) is mmap + seeded permutation
// + per-window gather on the calling thread; this native variant keeps the
// same contract — deterministic, resumable (epoch, index) cursor; per-host
// strided shard of each epoch's permutation — but moves the page-fault IO,
// dtype widening, and batch assembly onto a background thread with a bounded
// ready queue, so the train loop never blocks on disk and never holds the
// GIL for gather work.  (The reference has no input pipeline at all —
// SURVEY.md §0 — this is framework extension, not a port.)
//
// The shuffle is this loader's own deterministic permutation (splitmix64 +
// Fisher-Yates, seeded by seed + epoch): bit-compatible across runs and
// hosts of THIS loader, intentionally not numpy's PCG64 order.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

// Lemire's nearly-divisionless bounded random (bias-free rejection).
uint64_t bounded(uint64_t& s, uint64_t n) {
  for (;;) {
    uint64_t x = splitmix64(s);
    __uint128_t m = static_cast<__uint128_t>(x) * n;
    uint64_t lo = static_cast<uint64_t>(m);
    if (lo >= n || lo >= (-n) % n) return static_cast<uint64_t>(m >> 64);
  }
}

enum DType { U8 = 0, U16 = 1, I32 = 2, U32 = 3, I64 = 4 };

int64_t dtype_size(int dtype) {
  switch (dtype) {
    case U8: return 1;
    case U16: return 2;
    case I32: case U32: return 4;
    case I64: return 8;
  }
  return 0;
}

struct Batch {
  std::vector<int32_t> tokens;  // [batch, seq_len + 1] row-major
  int64_t epoch, index;         // cursor AFTER this batch (resume state)
};

struct Loader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_bytes = 0;
  int dtype;
  int64_t seq_len, batch, num_windows, num_tokens;
  int64_t pi, pc;
  uint64_t seed;
  int depth;

  // Producer-side cursor (worker thread only after start).
  int64_t epoch, index;
  std::vector<int64_t> shard;  // this host's window ids, current epoch
  int64_t usable = 0;          // shard length rounded down to batch

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::deque<Batch> ready;
  bool stop = false;

  void build_shard() {
    // Full-epoch Fisher-Yates so every host agrees on the permutation and
    // strides it disjointly (pi::pc), exactly like the Python loader.
    std::vector<int64_t> order(num_windows);
    for (int64_t i = 0; i < num_windows; ++i) order[i] = i;
    uint64_t s = seed + static_cast<uint64_t>(epoch);
    for (int64_t i = num_windows - 1; i > 0; --i) {
      int64_t j = static_cast<int64_t>(bounded(s, static_cast<uint64_t>(i + 1)));
      std::swap(order[i], order[j]);
    }
    shard.clear();
    for (int64_t i = pi; i < num_windows; i += pc) shard.push_back(order[i]);
    usable = (static_cast<int64_t>(shard.size()) / batch) * batch;
  }

  void gather(int64_t window, int32_t* out) const {
    const int64_t lo = window * seq_len;
    const int64_t n = seq_len + 1;
    switch (dtype) {
      case U8: {
        const uint8_t* p = map + lo;
        for (int64_t t = 0; t < n; ++t) out[t] = p[t];
        break;
      }
      case U16: {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(map) + lo;
        for (int64_t t = 0; t < n; ++t) out[t] = p[t];
        break;
      }
      case I32: {
        std::memcpy(out, reinterpret_cast<const int32_t*>(map) + lo,
                    n * sizeof(int32_t));
        break;
      }
      case U32: {
        const uint32_t* p = reinterpret_cast<const uint32_t*>(map) + lo;
        for (int64_t t = 0; t < n; ++t) out[t] = static_cast<int32_t>(p[t]);
        break;
      }
      case I64: {
        const int64_t* p = reinterpret_cast<const int64_t*>(map) + lo;
        for (int64_t t = 0; t < n; ++t) out[t] = static_cast<int32_t>(p[t]);
        break;
      }
    }
  }

  void run() {
    build_shard();
    // A resumed cursor may point past this epoch's usable region (e.g.
    // batch size changed across the restore); normalize like Python does
    // by rolling to the next epoch.
    for (;;) {
      if (index + batch > usable) {
        epoch += 1;
        index = 0;
        build_shard();
        continue;
      }
      Batch b;
      b.tokens.resize(batch * (seq_len + 1));
      for (int64_t r = 0; r < batch; ++r)
        gather(shard[index + r], b.tokens.data() + r * (seq_len + 1));
      index += batch;
      b.epoch = epoch;
      b.index = index;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || static_cast<int>(ready.size()) < depth;
        });
        if (stop) return;
        ready.push_back(std::move(b));
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Returns nullptr on any setup failure (missing file, bad dtype, too-short
// corpus).  epoch/index seed the resume cursor (0,0 for a fresh run).
Loader* dl_create(const char* path, int dtype, int64_t seq_len, int64_t batch,
                  uint64_t seed, int64_t process_index, int64_t process_count,
                  int depth, int64_t epoch, int64_t index) {
  if (dtype_size(dtype) == 0 || seq_len < 1 || batch < 1 || depth < 1 ||
      process_count < 1 || process_index < 0 || process_index >= process_count)
    return nullptr;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size <= 0) {
    close(fd);
    return nullptr;
  }
  auto* l = new Loader();
  l->fd = fd;
  l->map_bytes = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, l->map_bytes, PROT_READ, MAP_PRIVATE, fd, 0);
  if (m == MAP_FAILED) {
    close(fd);
    delete l;
    return nullptr;
  }
  madvise(m, l->map_bytes, MADV_WILLNEED);
  l->map = static_cast<const uint8_t*>(m);
  l->dtype = dtype;
  l->seq_len = seq_len;
  l->batch = batch;
  l->num_tokens = st.st_size / dtype_size(dtype);
  l->num_windows = (l->num_tokens - 1) / seq_len;
  l->pi = process_index;
  l->pc = process_count;
  l->seed = seed;
  l->depth = depth;
  l->epoch = epoch;
  l->index = index;
  if (l->num_windows < 1 ||
      (l->num_windows + process_count - 1) / process_count < batch) {
    munmap(const_cast<uint8_t*>(l->map), l->map_bytes);
    close(fd);
    delete l;
    return nullptr;  // not even one full batch per host
  }
  l->worker = std::thread([l] { l->run(); });
  return l;
}

int64_t dl_num_windows(Loader* l) { return l->num_windows; }

// Blocking pop of the next ready batch into out [batch * (seq_len+1)] int32;
// writes the post-batch resume cursor.  Returns 0 (the stream is infinite).
int32_t dl_next(Loader* l, int32_t* out, int64_t* epoch_out,
                int64_t* index_out) {
  Batch b;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_ready.wait(lk, [&] { return !l->ready.empty(); });
    b = std::move(l->ready.front());
    l->ready.pop_front();
  }
  l->cv_space.notify_one();
  std::memcpy(out, b.tokens.data(), b.tokens.size() * sizeof(int32_t));
  *epoch_out = b.epoch;
  *index_out = b.index;
  return 0;
}

void dl_destroy(Loader* l) {
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_space.notify_all();
  if (l->worker.joinable()) l->worker.join();
  if (l->map) munmap(const_cast<uint8_t*>(l->map), l->map_bytes);
  if (l->fd >= 0) close(l->fd);
  delete l;
}

}  // extern "C"
