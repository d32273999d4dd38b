// Host-side trajectory ingest ring: the dm-reverb replacement for
// off-device actors (SURVEY.md §2.9).
//
// The reference ships trajectories from actor processes to the learner
// through Reverb's C++ gRPC server. On a TPU pod the learner's replay
// lives in HBM, so all the host side needs is a fast, zero-copy,
// multi-producer frame queue: actor processes write fixed-size frames
// into a POSIX shared-memory ring; the learner process drains batches and
// device_puts them straight into the on-HBM replay.
//
// Design: MPSC ring over shm.
//   - Slots are fixed-size (frame_bytes), capacity is a power of two.
//   - Producers claim slots with a lock-free fetch_add on `head`, write
//     the payload, then publish by storing the slot's sequence number.
//   - The single consumer scans from `tail`, consuming only published
//     slots (per-slot seq acts as the commit flag), so partially written
//     frames are never visible.
//   - Backpressure: if the ring is full, push fails (caller retries) —
//     the analogue of Reverb's rate limiters, kept explicit.
//
// C ABI only (used from Python via ctypes).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct RingHeader {
  // Atomic: the creator publishes magic LAST with release semantics so
  // an attacher that observes it (acquire) also observes
  // frame_bytes/capacity/head/tail/seq initialization — plain stores
  // let a concurrent attacher pass the magic check and wire() itself
  // with capacity=0, aliasing the seq array.
  std::atomic<uint64_t> magic;
  uint64_t frame_bytes;
  uint64_t capacity;      // number of slots, power of two
  std::atomic<uint64_t> head;  // next slot to claim (producers)
  std::atomic<uint64_t> tail;  // next slot to read (consumer)
  std::atomic<uint64_t> dropped;  // frames rejected due to full ring
};

constexpr uint64_t kMagic = 0x414a494e47455354ULL;  // "AJINGEST"
constexpr size_t kHeaderSize = 4096;                 // page-aligned

struct Ring {
  RingHeader* hdr;
  std::atomic<uint64_t>* seq;  // per-slot published sequence
  uint8_t* data;
  size_t map_bytes;
  int fd;
  std::string name;
  bool owner;
};

size_t layout_bytes(uint64_t frame_bytes, uint64_t capacity) {
  return kHeaderSize + capacity * sizeof(std::atomic<uint64_t>) +
         capacity * frame_bytes;
}

void wire(Ring* r, void* base, uint64_t capacity) {
  r->hdr = reinterpret_cast<RingHeader*>(base);
  r->seq = reinterpret_cast<std::atomic<uint64_t>*>(
      reinterpret_cast<uint8_t*>(base) + kHeaderSize);
  r->data = reinterpret_cast<uint8_t*>(base) + kHeaderSize +
            capacity * sizeof(std::atomic<uint64_t>);
}

}  // namespace

extern "C" {

// Create the ring (consumer side). Returns handle or nullptr.
void* ingest_create(const char* name, uint64_t frame_bytes,
                    uint64_t capacity) {
  if (capacity == 0 || (capacity & (capacity - 1)) != 0) return nullptr;
  shm_unlink(name);
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t bytes = layout_bytes(frame_bytes, capacity);
  if (ftruncate(fd, static_cast<off_t>(bytes)) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* base = mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  Ring* r = new Ring();
  r->map_bytes = bytes;
  r->fd = fd;
  r->name = name;
  r->owner = true;
  wire(r, base, capacity);
  r->hdr->frame_bytes = frame_bytes;
  r->hdr->capacity = capacity;
  r->hdr->head.store(0);
  r->hdr->tail.store(0);
  r->hdr->dropped.store(0);
  for (uint64_t i = 0; i < capacity; ++i) {
    r->seq[i].store(0, std::memory_order_relaxed);
  }
  r->hdr->magic.store(kMagic, std::memory_order_release);
  return r;
}

// Attach to an existing ring (producer side).
void* ingest_attach(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* base =
      mmap(nullptr, st.st_size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  RingHeader* hdr = reinterpret_cast<RingHeader*>(base);
  if (hdr->magic.load(std::memory_order_acquire) != kMagic) {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  }
  Ring* r = new Ring();
  r->map_bytes = st.st_size;
  r->fd = fd;
  r->name = name;
  r->owner = false;
  wire(r, base, hdr->capacity);
  return r;
}

uint64_t ingest_frame_bytes(void* h) {
  return static_cast<Ring*>(h)->hdr->frame_bytes;
}
uint64_t ingest_capacity(void* h) {
  return static_cast<Ring*>(h)->hdr->capacity;
}
uint64_t ingest_dropped(void* h) {
  return static_cast<Ring*>(h)->hdr->dropped.load();
}
uint64_t ingest_size(void* h) {
  // tail BEFORE head: a concurrent drain between the two loads then
  // only undercounts; head-first can make tail pass the loaded head and
  // the unsigned difference explode to ~2^64.
  Ring* r = static_cast<Ring*>(h);
  uint64_t tail = r->hdr->tail.load(std::memory_order_acquire);
  uint64_t head = r->hdr->head.load(std::memory_order_acquire);
  return head >= tail ? head - tail : 0;
}

// Push n frames (producer). Returns number actually enqueued.
static uint64_t push_impl(Ring* r, const uint8_t* src, uint64_t n,
                          bool count_drops) {
  RingHeader* hdr = r->hdr;
  const uint64_t cap = hdr->capacity;
  const uint64_t fb = hdr->frame_bytes;
  uint64_t pushed = 0;
  for (; pushed < n; ++pushed) {
    uint64_t head = hdr->head.load(std::memory_order_relaxed);
    for (;;) {
      uint64_t tail = hdr->tail.load(std::memory_order_acquire);
      if (head - tail >= cap) {  // full
        if (count_drops) {
          hdr->dropped.fetch_add(n - pushed, std::memory_order_relaxed);
        }
        return pushed;
      }
      if (hdr->head.compare_exchange_weak(head, head + 1,
                                          std::memory_order_acq_rel)) {
        break;
      }
    }
    uint64_t slot = head & (cap - 1);
    std::memcpy(r->data + slot * fb, src + pushed * fb, fb);
    // Publish: seq = head + 1 marks "written for round head/cap".
    r->seq[slot].store(head + 1, std::memory_order_release);
  }
  return pushed;
}

uint64_t ingest_push(void* h, const void* frames, uint64_t n) {
  Ring* r = static_cast<Ring*>(h);
  return push_impl(r, static_cast<const uint8_t*>(frames), n,
                   /*count_drops=*/true);
}

// Like ingest_push but a full ring is NOT counted as drops: the caller
// intends to retry the rejected tail (blocking producer backpressure).
uint64_t ingest_try_push(void* h, const void* frames, uint64_t n) {
  Ring* r = static_cast<Ring*>(h);
  return push_impl(r, static_cast<const uint8_t*>(frames), n,
                   /*count_drops=*/false);
}

// Drain up to max_frames into out (consumer). Returns count drained.
uint64_t ingest_drain(void* h, void* out, uint64_t max_frames) {
  Ring* r = static_cast<Ring*>(h);
  RingHeader* hdr = r->hdr;
  const uint64_t cap = hdr->capacity;
  const uint64_t fb = hdr->frame_bytes;
  uint8_t* dst = static_cast<uint8_t*>(out);
  uint64_t tail = hdr->tail.load(std::memory_order_relaxed);
  uint64_t drained = 0;
  while (drained < max_frames) {
    uint64_t slot = tail & (cap - 1);
    // A slot is consumable only when its published seq matches tail + 1.
    if (r->seq[slot].load(std::memory_order_acquire) != tail + 1) break;
    std::memcpy(dst + drained * fb, r->data + slot * fb, fb);
    ++tail;
    ++drained;
  }
  if (drained) {
    hdr->tail.store(tail, std::memory_order_release);
  }
  return drained;
}

void ingest_close(void* h) {
  Ring* r = static_cast<Ring*>(h);
  munmap(r->hdr, r->map_bytes);
  close(r->fd);
  if (r->owner) shm_unlink(r->name.c_str());
  delete r;
}

}  // extern "C"
