// Host-side prefetching mini-batch loader.
//
// Native runtime component of pytorchhessianfree_tpu: the reference drives
// its workloads with torch.utils.data.DataLoader (multi-process Python
// batch assembly, reference examples/example_utils.py:41-56, :96-105); the
// TPU-native equivalent is this C++ threaded batcher -- background threads
// gather shuffled mini-batches into a fixed ring of preallocated buffers so
// the training loop's next_batch() is a pointer swap + memcpy, never a
// Python-side gather.  Exposed through a plain C API consumed via ctypes
// (runtime/loader.py).
//
// Design:
//  - the dataset lives in caller-owned memory (inputs: N x in_elems floats,
//    targets: N x tgt_elems floats); the batcher never copies it;
//  - each epoch draws a fresh Fisher-Yates permutation from a seeded
//    xorshift PRNG (deterministic across runs for a fixed seed);
//  - `depth` ring slots are filled by `n_threads` producer threads; the
//    consumer pops slots in order (hfb_next) and releases them (hfb_release).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<float> x;
  std::vector<float> y;
  uint64_t seq = 0;       // which batch index this slot holds
  bool ready = false;
};

struct Batcher {
  const float* inputs;
  const float* targets;
  int64_t n, in_elems, tgt_elems, batch;
  uint64_t seed;
  bool drop_last;

  std::vector<int64_t> perm;      // current epoch permutation
  uint64_t epoch = 0;
  int64_t batches_per_epoch = 0;

  std::vector<Slot> slots;
  uint64_t next_to_produce = 0;   // global batch sequence number
  uint64_t next_to_consume = 0;

  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};

  uint64_t rng_state;
  uint64_t rng() {
    // xorshift64*
    uint64_t x = rng_state;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    rng_state = x;
    return x * 0x2545F4914F6CDD1DULL;
  }

  void reshuffle_locked() {
    perm.resize(n);
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    for (int64_t i = n - 1; i > 0; --i) {
      int64_t j = static_cast<int64_t>(rng() % static_cast<uint64_t>(i + 1));
      std::swap(perm[i], perm[j]);
    }
    ++epoch;
  }

  // Gather batch `seq` (global sequence number) into slot s.
  void fill(Slot& s, uint64_t seq) {
    const uint64_t bpe = static_cast<uint64_t>(batches_per_epoch);
    const uint64_t within = seq % bpe;
    const int64_t start = static_cast<int64_t>(within) * batch;
    const int64_t count =
        drop_last ? batch : std::min<int64_t>(batch, n - start);
    s.x.resize(static_cast<size_t>(batch) * in_elems);
    s.y.resize(static_cast<size_t>(batch) * tgt_elems);
    for (int64_t k = 0; k < count; ++k) {
      const int64_t src = perm[start + k];
      std::memcpy(&s.x[static_cast<size_t>(k) * in_elems],
                  inputs + src * in_elems, sizeof(float) * in_elems);
      std::memcpy(&s.y[static_cast<size_t>(k) * tgt_elems],
                  targets + src * tgt_elems, sizeof(float) * tgt_elems);
    }
    // pad a short final batch by repeating the last sample (caller sees
    // full `batch` rows; count < batch only when drop_last == false)
    for (int64_t k = count; k < batch; ++k) {
      std::memcpy(&s.x[static_cast<size_t>(k) * in_elems],
                  &s.x[static_cast<size_t>(count - 1) * in_elems],
                  sizeof(float) * in_elems);
      std::memcpy(&s.y[static_cast<size_t>(k) * tgt_elems],
                  &s.y[static_cast<size_t>(count - 1) * tgt_elems],
                  sizeof(float) * tgt_elems);
    }
    s.seq = seq;
    s.ready = true;
  }

  void producer_loop() {
    for (;;) {
      std::unique_lock<std::mutex> lk(mu);
      uint64_t seq;
      Slot* slot = nullptr;
      for (;;) {
        if (stop.load()) return;
        seq = next_to_produce;
        Slot& cand = slots[seq % slots.size()];
        // A slot is free once the consumer has moved past what it held.
        if (!cand.ready && seq < next_to_consume + slots.size()) {
          slot = &cand;
          next_to_produce = seq + 1;
          const uint64_t bpe = static_cast<uint64_t>(batches_per_epoch);
          if (seq % bpe == 0 && seq / bpe + 1 > epoch) reshuffle_locked();
          break;
        }
        cv_produce.wait(lk);
      }
      // NOTE: fill under the lock -- the permutation may be replaced at
      // epoch boundaries and slots are small; contention is negligible
      // next to the device step this pipeline overlaps with.
      fill(*slot, seq);
      cv_consume.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* hfb_create(const float* inputs, const float* targets, int64_t n,
                 int64_t in_elems, int64_t tgt_elems, int64_t batch,
                 uint64_t seed, int32_t depth, int32_t n_threads,
                 int32_t drop_last) {
  if (n <= 0 || batch <= 0 || batch > n || depth < 1 || n_threads < 1)
    return nullptr;
  auto* b = new Batcher();
  b->inputs = inputs;
  b->targets = targets;
  b->n = n;
  b->in_elems = in_elems;
  b->tgt_elems = tgt_elems;
  b->batch = batch;
  b->seed = seed;
  b->rng_state = seed ^ 0x9E3779B97F4A7C15ULL;
  if (b->rng_state == 0) b->rng_state = 1;
  b->drop_last = drop_last != 0;
  b->batches_per_epoch = b->drop_last ? n / batch : (n + batch - 1) / batch;
  b->slots.resize(static_cast<size_t>(depth));
  {
    std::lock_guard<std::mutex> lk(b->mu);
    b->reshuffle_locked();
  }
  for (int32_t i = 0; i < n_threads; ++i)
    b->threads.emplace_back([b] { b->producer_loop(); });
  return b;
}

int64_t hfb_batches_per_epoch(void* handle) {
  return static_cast<Batcher*>(handle)->batches_per_epoch;
}

// Blocking: copy the next batch into caller buffers.  Returns the global
// batch sequence number (>= 0).
int64_t hfb_next(void* handle, float* out_x, float* out_y) {
  auto* b = static_cast<Batcher*>(handle);
  std::unique_lock<std::mutex> lk(b->mu);
  const uint64_t seq = b->next_to_consume;
  Slot& s = b->slots[seq % b->slots.size()];
  b->cv_consume.wait(lk, [&] { return (s.ready && s.seq == seq); });
  std::memcpy(out_x, s.x.data(), sizeof(float) * s.x.size());
  std::memcpy(out_y, s.y.data(), sizeof(float) * s.y.size());
  s.ready = false;
  b->next_to_consume = seq + 1;
  b->cv_produce.notify_all();
  return static_cast<int64_t>(seq);
}

void hfb_destroy(void* handle) {
  auto* b = static_cast<Batcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(b->mu);
    b->stop.store(true);
  }
  b->cv_produce.notify_all();
  b->cv_consume.notify_all();
  for (auto& t : b->threads) t.join();
  delete b;
}

}  // extern "C"
