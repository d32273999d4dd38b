// Host-side variable store: the ReverbVariableContainer replacement for
// same-host actor fan-out (SURVEY.md §2.9, §2.11).
//
// The reference broadcasts learner weights to collect jobs through a
// Reverb "variable container" table over gRPC
// (experimental/distributed/reverb_variable_container.py:41-160). On a
// single host (one pod's CPU side feeding N simulator processes) that
// round-trip is pure overhead: the learner publishes a parameter blob
// into POSIX shared memory and collectors read the newest snapshot
// lock-free.
//
// Design: single-writer seqlock.
//   - Header holds a sequence counter: odd while a write is in flight,
//     even when stable. The writer bumps it before and after the
//     payload memcpy (release ordering on completion).
//   - Readers snapshot seq, copy the payload, and re-check seq
//     (acquire); a change or an odd value means a torn read — retry.
//     Readers never block the writer and vice versa.
//   - `step` rides the header so staleness metrics come for free
//     (train_utils staleness, reference train/utils/train_utils.py:49).
//
// C ABI only (used from Python via ctypes).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct StoreHeader {
  uint64_t magic;
  uint64_t capacity;            // payload capacity in bytes
  std::atomic<uint64_t> seq;    // seqlock: odd = write in flight
  std::atomic<uint64_t> size;   // current payload size
  std::atomic<int64_t> step;    // train step of current payload
  std::atomic<uint64_t> writes; // total publishes
};

constexpr uint64_t kMagic = 0x4156415253544f52ULL;  // "AVARSTOR"
constexpr size_t kHeaderSize = 4096;                // page-aligned

struct Store {
  StoreHeader* hdr;
  uint8_t* data;
  size_t map_bytes;
  std::string name;
  bool owner;
};

Store* map_store(const char* name, uint64_t capacity, bool create) {
  int flags = create ? (O_RDWR | O_CREAT | O_EXCL) : O_RDWR;
  // On EEXIST we fail rather than unlink+recreate: readers mmap'ed to a
  // replaced segment would keep reading the orphaned mapping forever
  // (step() frozen) with no error. The owner must vs_unlink explicitly.
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;

  size_t map_bytes;
  if (create) {
    map_bytes = kHeaderSize + capacity;
    if (ftruncate(fd, map_bytes) != 0) {
      close(fd);
      shm_unlink(name);
      return nullptr;
    }
  } else {
    struct stat st;
    if (fstat(fd, &st) != 0 || (size_t)st.st_size < kHeaderSize) {
      close(fd);
      return nullptr;
    }
    map_bytes = st.st_size;
  }

  void* mem = mmap(nullptr, map_bytes, PROT_READ | PROT_WRITE, MAP_SHARED,
                   fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;

  Store* s = new Store;
  s->hdr = reinterpret_cast<StoreHeader*>(mem);
  s->data = reinterpret_cast<uint8_t*>(mem) + kHeaderSize;
  s->map_bytes = map_bytes;
  s->name = name;
  s->owner = create;

  if (create) {
    s->hdr->magic = kMagic;
    s->hdr->capacity = capacity;
    s->hdr->seq.store(0, std::memory_order_relaxed);
    s->hdr->size.store(0, std::memory_order_relaxed);
    s->hdr->step.store(-1, std::memory_order_relaxed);
    s->hdr->writes.store(0, std::memory_order_relaxed);
  } else if (s->hdr->magic != kMagic) {
    munmap(mem, map_bytes);
    delete s;
    return nullptr;
  }
  return s;
}

}  // namespace

extern "C" {

void* vs_create(const char* name, uint64_t capacity) {
  return map_store(name, capacity, /*create=*/true);
}

void* vs_open(const char* name) {
  return map_store(name, 0, /*create=*/false);
}

// Publish a new payload. Single writer only. Returns 0, or -1 if len
// exceeds capacity.
int vs_write(void* handle, const uint8_t* buf, uint64_t len, int64_t step) {
  Store* s = static_cast<Store*>(handle);
  if (len > s->hdr->capacity) return -1;
  uint64_t seq = s->hdr->seq.load(std::memory_order_relaxed);
  s->hdr->seq.store(seq + 1, std::memory_order_relaxed);  // odd: writing
  // Full fence: the odd seq must become visible BEFORE any payload byte.
  // A release store only orders PRIOR writes, and an acquire fence orders
  // loads — neither gives the StoreStore edge needed here on weakly
  // ordered hosts (ARM), where a reader could otherwise pass both seq
  // checks around a torn payload.
  std::atomic_thread_fence(std::memory_order_seq_cst);
  std::memcpy(s->data, buf, len);
  s->hdr->size.store(len, std::memory_order_relaxed);
  s->hdr->step.store(step, std::memory_order_relaxed);
  s->hdr->writes.fetch_add(1, std::memory_order_relaxed);
  s->hdr->seq.store(seq + 2, std::memory_order_release);  // even: stable
  return 0;
}

// Snapshot the newest payload. Returns 0 on success, -1 if `cap` is too
// small, -2 if nothing has been published yet. Retries internally on
// torn reads (bounded spin).
int vs_read(void* handle, uint8_t* buf, uint64_t cap, uint64_t* len_out,
            int64_t* step_out) {
  Store* s = static_cast<Store*>(handle);
  for (int attempt = 0; attempt < 1000000; ++attempt) {
    uint64_t seq0 = s->hdr->seq.load(std::memory_order_acquire);
    if (seq0 == 0) return -2;
    if (seq0 & 1) continue;  // write in flight
    uint64_t len = s->hdr->size.load(std::memory_order_relaxed);
    int64_t step = s->hdr->step.load(std::memory_order_relaxed);
    if (len > cap) return -1;
    std::memcpy(buf, s->data, len);
    std::atomic_thread_fence(std::memory_order_acquire);
    if (s->hdr->seq.load(std::memory_order_relaxed) == seq0) {
      *len_out = len;
      *step_out = step;
      return 0;
    }
  }
  return -3;  // pathological writer livelock
}

int64_t vs_step(void* handle) {
  return static_cast<Store*>(handle)->hdr->step.load(
      std::memory_order_acquire);
}

uint64_t vs_capacity(void* handle) {
  return static_cast<Store*>(handle)->hdr->capacity;
}

uint64_t vs_writes(void* handle) {
  return static_cast<Store*>(handle)->hdr->writes.load(
      std::memory_order_relaxed);
}

void vs_close(void* handle) {
  Store* s = static_cast<Store*>(handle);
  munmap(s->hdr, s->map_bytes);
  delete s;
}

int vs_unlink(const char* name) { return shm_unlink(name); }

}  // extern "C"
