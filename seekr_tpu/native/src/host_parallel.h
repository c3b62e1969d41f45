// Shared threading helpers for the host-side native kernels
// (sortops.cpp, statops.cpp).  Header-only; build.py hashes this file
// alongside the .cpp sources so edits invalidate the cached library.
#pragma once

#include <algorithm>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace seekr_host {

// Threads scale with the work size so tiny inputs stay single-threaded
// (thread launch costs more than the work below per_thread_floor items).
inline int64_t pick_threads(int64_t work, int64_t per_thread_floor) {
  int64_t hw = std::max<int64_t>(1, std::thread::hardware_concurrency());
  return std::max<int64_t>(
      1, std::min(hw, work / std::max<int64_t>(1, per_thread_floor)));
}

inline void run_parallel(int64_t n_threads,
                         const std::function<void(int64_t)>& fn) {
  std::vector<std::thread> ts;
  ts.reserve(static_cast<size_t>(n_threads - 1));
  for (int64_t t = 1; t < n_threads; ++t) ts.emplace_back(fn, t);
  fn(0);
  for (auto& th : ts) th.join();
}

}  // namespace seekr_host
