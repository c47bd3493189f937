// Batched 2048 environment pool — native data-plane for the host-env path.
//
// Role in the framework: the reference's game2048 example trains on
// jumanji's Game2048-v1 (examples/rl_discrete/game2048/); here the batched
// environment is a C++ pool stepped via one io_callback per rollout step,
// with all N envs advanced in parallel worker threads. This is the
// native-runtime analog of the Reverb/Launchpad layer the reference
// outsourced to C++ deps (SURVEY §2i): IO/runtime in native code, compute
// in XLA.
//
// Board encoding: 16 cells of uint8 exponents (0 = empty, k = tile 2^k),
// row-major 4x4. Actions: 0=up, 1=right, 2=down, 3=left.
// Reward: sum of merged tile values (standard 2048 scoring).
// Observations: float32[16] exponents (the jumanji board convention).
// Action mask: move must change the board.
//
// Build: g++ -O3 -shared -fPIC -pthread -o libenv2048.so env2048.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Env {
  uint8_t board[16];
  std::mt19937 rng;
  bool done;
};

// Slide+merge one row of 4 exponents toward index 0. Returns reward gained.
// 2048 rule: each tile merges at most once per move.
inline float slide_row(uint8_t* row) {
  uint8_t out[4] = {0, 0, 0, 0};
  int pos = 0;
  float reward = 0.0f;
  bool last_merged = false;
  for (int i = 0; i < 4; ++i) {
    uint8_t v = row[i];
    if (v == 0) continue;
    if (pos > 0 && out[pos - 1] == v && !last_merged) {
      out[pos - 1] = v + 1;
      reward += static_cast<float>(1u << (v + 1));
      last_merged = true;
    } else {
      out[pos++] = v;
      last_merged = false;
    }
  }
  std::memcpy(row, out, 4);
  return reward;
}

// Gather a line of the board for a direction, slide it, scatter back.
// dir: 0=up, 1=right, 2=down, 3=left. Returns reward.
inline float apply_move(uint8_t* board, int dir) {
  float reward = 0.0f;
  for (int line = 0; line < 4; ++line) {
    uint8_t tmp[4];
    int idx[4];
    for (int k = 0; k < 4; ++k) {
      switch (dir) {
        case 0: idx[k] = k * 4 + line; break;          // up: columns top-down
        case 1: idx[k] = line * 4 + (3 - k); break;    // right: rows right-left
        case 2: idx[k] = (3 - k) * 4 + line; break;    // down: columns bottom-up
        default: idx[k] = line * 4 + k; break;         // left: rows left-right
      }
      tmp[k] = board[idx[k]];
    }
    reward += slide_row(tmp);
    for (int k = 0; k < 4; ++k) board[idx[k]] = tmp[k];
  }
  return reward;
}

inline bool move_changes(const uint8_t* board, int dir) {
  uint8_t copy[16];
  std::memcpy(copy, board, 16);
  apply_move(copy, dir);
  return std::memcmp(copy, board, 16) != 0;
}

inline bool any_move(const uint8_t* board) {
  for (int d = 0; d < 4; ++d)
    if (move_changes(board, d)) return true;
  return false;
}

inline void add_random_tile(Env& env) {
  int empties[16];
  int n = 0;
  for (int i = 0; i < 16; ++i)
    if (env.board[i] == 0) empties[n++] = i;
  if (n == 0) return;
  std::uniform_int_distribution<int> cell(0, n - 1);
  std::uniform_real_distribution<float> val(0.0f, 1.0f);
  int where = empties[cell(env.rng)];
  env.board[where] = (val(env.rng) < 0.9f) ? 1 : 2;  // 2^1=2 or 2^2=4
}

inline void reset_env(Env& env) {
  std::memset(env.board, 0, 16);
  env.done = false;
  add_random_tile(env);
  add_random_tile(env);
}

struct Pool {
  std::vector<Env> envs;
  int num_threads;
};

void parallel_for(int n, int num_threads, const std::function<void(int, int)>& fn) {
  if (num_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> workers;
  int chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int lo = t * chunk;
    int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back(fn, lo, hi);
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

void* env2048_create(int num_envs, uint64_t seed, int num_threads) {
  auto* pool = new Pool;
  pool->envs.resize(num_envs);
  pool->num_threads = num_threads > 0 ? num_threads : 1;
  for (int i = 0; i < num_envs; ++i) {
    pool->envs[i].rng.seed(seed + static_cast<uint64_t>(i) * 0x9E3779B9u);
    reset_env(pool->envs[i]);
  }
  return pool;
}

void env2048_destroy(void* handle) { delete static_cast<Pool*>(handle); }

// obs_out: float32 [num_envs, 16]; mask_out: float32 [num_envs, 4]
void env2048_observe(void* handle, float* obs_out, float* mask_out) {
  auto* pool = static_cast<Pool*>(handle);
  int n = static_cast<int>(pool->envs.size());
  parallel_for(n, pool->num_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      const Env& e = pool->envs[i];
      for (int c = 0; c < 16; ++c)
        obs_out[i * 16 + c] = static_cast<float>(e.board[c]);
      for (int d = 0; d < 4; ++d)
        mask_out[i * 4 + d] = move_changes(e.board, d) ? 1.0f : 0.0f;
    }
  });
}

void env2048_reset_all(void* handle) {
  auto* pool = static_cast<Pool*>(handle);
  int n = static_cast<int>(pool->envs.size());
  parallel_for(n, pool->num_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) reset_env(pool->envs[i]);
  });
}

// actions: int32 [num_envs]. Auto-resets finished envs (done reported once).
// Illegal moves (no board change) yield reward 0 and leave the board as-is.
void env2048_step(void* handle, const int32_t* actions, float* obs_out,
                  float* reward_out, uint8_t* done_out, float* mask_out) {
  auto* pool = static_cast<Pool*>(handle);
  int n = static_cast<int>(pool->envs.size());
  parallel_for(n, pool->num_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      Env& e = pool->envs[i];
      int a = actions[i] & 3;
      float reward = 0.0f;
      if (move_changes(e.board, a)) {
        reward = apply_move(e.board, a);
        add_random_tile(e);
      }
      bool done = !any_move(e.board);
      reward_out[i] = reward;
      done_out[i] = done ? 1 : 0;
      if (done) reset_env(e);
      for (int c = 0; c < 16; ++c)
        obs_out[i * 16 + c] = static_cast<float>(e.board[c]);
      for (int d = 0; d < 4; ++d)
        mask_out[i * 4 + d] = move_changes(e.board, d) ? 1.0f : 0.0f;
    }
  });
}

}  // extern "C"
