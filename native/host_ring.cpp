// Host-RAM replay ring with multi-threaded batch gather.
//
// The TPU-native analog of the reference's `reserve_space` path
// (reference pql/replay/simple_replay.py:8-15): for vision-scale
// observations, the 5e6-transition replay cannot live in 16 GB of HBM, so
// the reference stores fp16 observations in CPU memory and ships sampled
// batches to the device per update. Here that host-side store is a C++
// ring buffer:
//
//  - one contiguous malloc'd arena per field (no Python object overhead,
//    no GC pressure, bytes are dtype-agnostic — fp16/uint8 packing is the
//    caller's choice),
//  - ring writes are straight memcpys of [T, E, dim] chunks,
//  - batch gather (the hot op: 8192 random (slot, env) rows per critic
//    update) fans out across a std::thread pool — a single-threaded
//    Python gather of 8192 rows costs milliseconds; this saturates host
//    memory bandwidth instead.
//
// C ABI only (used via ctypes; pybind11 is not on this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.back());
            jobs_.pop_back();
          }
          job();
          if (pending_.fetch_sub(1) == 1) {
            std::unique_lock<std::mutex> lk(done_mu_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void run(std::vector<std::function<void()>> jobs) {
    pending_.fetch_add(static_cast<int>(jobs.size()));
    {
      std::unique_lock<std::mutex> lk(mu_);
      for (auto& j : jobs) jobs_.push_back(std::move(j));
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::vector<std::function<void()>> jobs_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  std::atomic<int> pending_;
};

struct Ring {
  int64_t slots;
  int64_t envs;
  int64_t row_bytes;  // bytes per (slot, env) row
  char* data;
  int64_t ptr;           // next slot to write
  int64_t total_writes;  // slots written since creation
  ThreadPool* pool;
};

}  // namespace

extern "C" {

void* host_ring_create(int64_t slots, int64_t envs, int64_t row_bytes,
                       int threads) {
  Ring* r = new Ring();
  r->slots = slots;
  r->envs = envs;
  r->row_bytes = row_bytes;
  r->data = static_cast<char*>(
      std::malloc(static_cast<size_t>(slots) * envs * row_bytes));
  if (!r->data) {
    delete r;
    return nullptr;
  }
  r->ptr = 0;
  r->total_writes = 0;
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 4;
  }
  r->pool = new ThreadPool(threads);
  return r;
}

void host_ring_destroy(void* h) {
  Ring* r = static_cast<Ring*>(h);
  delete r->pool;
  std::free(r->data);
  delete r;
}

int64_t host_ring_ptr(void* h) { return static_cast<Ring*>(h)->ptr; }
int64_t host_ring_filled(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return r->total_writes < r->slots ? r->total_writes : r->slots;
}

// Write a [t, envs, row_bytes] chunk at the ring pointer (with wrap).
void host_ring_write(void* h, const char* src, int64_t t) {
  Ring* r = static_cast<Ring*>(h);
  const int64_t slot_bytes = r->envs * r->row_bytes;
  int64_t written = 0;
  while (written < t) {
    const int64_t pos = r->ptr;
    const int64_t n = std::min(t - written, r->slots - pos);
    std::memcpy(r->data + pos * slot_bytes, src + written * slot_bytes,
                static_cast<size_t>(n) * slot_bytes);
    r->ptr = (pos + n) % r->slots;
    written += n;
  }
  r->total_writes += t;
}

// Gather batch rows (slot_idx[i], env_idx[i]) into out [batch, row_bytes],
// fanned out over the thread pool.
void host_ring_gather(void* h, const int64_t* slot_idx, const int64_t* env_idx,
                      int64_t batch, char* out) {
  Ring* r = static_cast<Ring*>(h);
  const int64_t row = r->row_bytes;
  const int64_t slot_bytes = r->envs * row;
  const char* data = r->data;
  const int shards = 16;
  const int64_t per = (batch + shards - 1) / shards;
  std::vector<std::function<void()>> jobs;
  for (int s = 0; s < shards; ++s) {
    const int64_t lo = s * per;
    const int64_t hi = std::min(batch, lo + per);
    if (lo >= hi) break;
    jobs.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * row,
                    data + slot_idx[i] * slot_bytes + env_idx[i] * row,
                    static_cast<size_t>(row));
      }
    });
  }
  r->pool->run(std::move(jobs));
}

}  // extern "C"
