// Persistent worker-thread pool for the native eager kernels.
//
// Every native kernel used to spawn fresh std::threads per call
// (~100 us per spawn) — for sub-millisecond kernels (CSR SpMV at a few
// hundred k nnz, fused merges, counting scatters) the spawn cost was a
// large, *variable* fraction of the call and the dominant residual vs
// scipy on small boxes (VERDICT r3 #5).  This pool keeps hw-1 detached
// workers parked on a generation counter: dispatch is an atomic bump +
// condvar notify (workers spin briefly before sleeping), completion is a
// caller spin on an atomic counter — both microseconds.
//
// Concurrency contract: run() serializes concurrent callers (they would
// oversubscribe the cores anyway); fn(i) is called for i in [0, t) with
// the caller executing i == 0.  Fork-safe via pthread_atfork (the child
// reinitializes primitives and respawns workers lazily).  The singleton
// is leaked so workers never race static destruction at exit.

#pragma once

#include <pthread.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <mutex>
#include <new>
#include <thread>

namespace stpool {

inline void cpu_pause() {
#if defined(__x86_64__) || defined(__i386__)
  __builtin_ia32_pause();
#else
  std::this_thread::yield();
#endif
}

class ThreadPool {
 public:
  static int max_threads() {
    unsigned hw = std::thread::hardware_concurrency();
    return hw ? (int)hw : 1;
  }

  static ThreadPool& get() {
    static ThreadPool* p = [] {
      auto* q = new ThreadPool();
      pthread_atfork(nullptr, nullptr, [] { ThreadPool::get().reset_after_fork(); });
      return q;
    }();
    return *p;
  }

  // Run fn(i) for i in [0, t); blocks until all t calls return.  t above
  // the core count oversubscribes (slow) but still executes EVERY slot —
  // silently clamping would drop work and corrupt results.
  void run(int t, const std::function<void(int)>& fn) {
    if (t <= 1) {
      fn(0);
      return;
    }
    std::lock_guard<std::mutex> outer(run_mutex_);
    ensure(t - 1);
    fn_ = &fn;
    n_active_ = t - 1;
    done_.store(0, std::memory_order_release);
    {
      // bump under the mutex so a worker checking the predicate inside
      // cv_.wait cannot miss the notify
      std::lock_guard<std::mutex> lk(m_);
      gen_.fetch_add(1, std::memory_order_acq_rel);
    }
    cv_.notify_all();
    fn(0);
    int spins = 0;
    while (done_.load(std::memory_order_acquire) != n_active_) {
      if (++spins < (1 << 14))
        cpu_pause();
      else
        std::this_thread::yield();
    }
  }

  void reset_after_fork() {
    // pool threads do not exist in the child; reinitialize primitives and
    // let ensure() respawn lazily.  (Leaks the parent's bookkeeping, which
    // is the only safe option post-fork.)
    new (&m_) std::mutex();
    new (&run_mutex_) std::mutex();
    new (&cv_) std::condition_variable();
    n_workers_ = 0;
    n_active_ = 0;
    done_.store(0, std::memory_order_release);
  }

 private:
  ThreadPool() = default;

  void ensure(int k) {
    // capture the CURRENT generation before spawning: a worker must start
    // with seen == pre-dispatch gen or it would skip its first task
    uint64_t cur = gen_.load(std::memory_order_acquire);
    while (n_workers_ < k) {
      int idx = ++n_workers_;
      std::thread([this, idx, cur] { loop(idx, cur); }).detach();
    }
  }

  void loop(int idx, uint64_t seen) {
    for (;;) {
      int spins = 0;
      while (gen_.load(std::memory_order_acquire) == seen) {
        if (++spins > 20000) {
          std::unique_lock<std::mutex> lk(m_);
          cv_.wait(lk, [&] { return gen_.load(std::memory_order_acquire) != seen; });
          break;
        }
        cpu_pause();
      }
      seen = gen_.load(std::memory_order_acquire);
      if (idx <= n_active_) {
        (*fn_)(idx);
        done_.fetch_add(1, std::memory_order_acq_rel);
      }
    }
  }

  std::mutex run_mutex_;  // serializes concurrent run() callers
  std::mutex m_;
  std::condition_variable cv_;
  std::atomic<uint64_t> gen_{0};
  std::atomic<int> done_{0};
  const std::function<void(int)>* fn_ = nullptr;
  int n_active_ = 0;
  int n_workers_ = 0;
};

// Convenience: run body(i) across t slots (caller participates).
template <typename F>
inline void parallel_for_slots(int t, F&& body) {
  if (t <= 1) {
    body(0);
    return;
  }
  const std::function<void(int)> fn = std::forward<F>(body);
  ThreadPool::get().run(t, fn);
}

}  // namespace stpool
