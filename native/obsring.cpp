// obsring: lock-free shared-memory observation ring for episode farming.
//
// Role in the framework: the transport between host-side simulator worker
// PROCESSES (habitat-sim, robot bridges) and the single JAX driver process
// that batches observations onto the TPU. Replaces the reference's
// per-request JPEG-base64 HTTP + filesystem-lockfile serialization
// (vlfm/vlm/server_wrapper.py:57-164) and habitat VectorEnv pickle pipes:
// producers memcpy fixed-size records into POSIX shared memory; the consumer
// drains a whole batch with one pass and zero syscalls on the hot path.
//
// Design: MPSC seqlock ring.
//  - header: magic, slot_bytes, n_slots, atomic global ticket counter
//  - slot:   atomic sequence + payload_len + payload
//  - push:   ticket = fetch_add(1); slot = ticket % n_slots;
//            seq.store(WRITING); memcpy; seq.store(2*ticket+2) [release]
//  - poll:   consumer walks tickets IN ORDER from its cursor, copies ready
//            payloads out, re-checks seq to detect torn reads (seqlock
//            validate), and STOPS at the first ticket still being written —
//            an in-flight record is retried on the next poll, never dropped.
// Overwrite semantics: a slow consumer loses the oldest records to writer
// laps (the ring is sized for worst-case burst); a producer that dies
// mid-push stalls delivery of newer tickets, which the driver bounds with
// its own watchdog.
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x4F42534C52494E47ULL;  // "OBSLRING"
constexpr uint64_t kWriting = 1;                    // odd == in progress

struct Header {
  uint64_t magic;
  uint64_t slot_bytes;   // payload capacity per slot
  uint64_t n_slots;
  std::atomic<uint64_t> ticket;  // next write ticket
};

struct SlotHeader {
  std::atomic<uint64_t> seq;  // 0 = empty, odd = writing, 2*ticket+2 = ready
  uint64_t len;
};

struct Ring {
  Header* header;
  uint8_t* slots;
  size_t map_bytes;
  int fd;
  bool owner;
  char name[256];
};

inline size_t slot_stride(uint64_t slot_bytes) {
  size_t s = sizeof(SlotHeader) + slot_bytes;
  return (s + 63) & ~size_t(63);  // cache-line align
}

inline SlotHeader* slot_at(Ring* r, uint64_t i) {
  return reinterpret_cast<SlotHeader*>(
      r->slots + i * slot_stride(r->header->slot_bytes));
}

Ring* map_ring(const char* name, int fd, size_t bytes, bool owner) {
  void* mem = mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) return nullptr;
  Ring* r = new Ring();
  r->header = reinterpret_cast<Header*>(mem);
  r->slots = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  r->map_bytes = bytes;
  r->fd = fd;
  r->owner = owner;
  strncpy(r->name, name, sizeof(r->name) - 1);
  return r;
}

}  // namespace

extern "C" {

// Create (or replace) a ring. Returns an opaque handle or null.
void* obsring_create(const char* name, uint64_t slot_bytes, uint64_t n_slots) {
  shm_unlink(name);
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t bytes = sizeof(Header) + n_slots * slot_stride(slot_bytes);
  if (ftruncate(fd, (off_t)bytes) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  Ring* r = map_ring(name, fd, bytes, /*owner=*/true);
  if (!r) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  r->header->slot_bytes = slot_bytes;
  r->header->n_slots = n_slots;
  r->header->ticket.store(0, std::memory_order_relaxed);
  for (uint64_t i = 0; i < n_slots; ++i)
    slot_at(r, i)->seq.store(0, std::memory_order_relaxed);
  std::atomic_thread_fence(std::memory_order_release);
  r->header->magic = kMagic;
  return r;
}

// Open an existing ring (producer or extra consumer).
void* obsring_open(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  Ring* r = map_ring(name, fd, (size_t)st.st_size, /*owner=*/false);
  if (!r) {
    close(fd);
    return nullptr;
  }
  if (r->header->magic != kMagic) {
    munmap(r->header, r->map_bytes);
    close(fd);
    delete r;
    return nullptr;
  }
  return r;
}

uint64_t obsring_slot_bytes(void* h) { return ((Ring*)h)->header->slot_bytes; }
uint64_t obsring_n_slots(void* h) { return ((Ring*)h)->header->n_slots; }

// Push one record. Returns the ticket (>=0) or -1 if len too large.
int64_t obsring_push(void* h, const uint8_t* data, uint64_t len) {
  Ring* r = (Ring*)h;
  if (len > r->header->slot_bytes) return -1;
  uint64_t ticket = r->header->ticket.fetch_add(1, std::memory_order_relaxed);
  SlotHeader* s = slot_at(r, ticket % r->header->n_slots);
  s->seq.store(kWriting, std::memory_order_release);
  s->len = len;
  memcpy(reinterpret_cast<uint8_t*>(s) + sizeof(SlotHeader), data, len);
  s->seq.store(2 * ticket + 2, std::memory_order_release);
  return (int64_t)ticket;
}

// Drain records with ticket >= *cursor into out (max_records rows of
// slot_bytes each; lens[i] receives payload length, tickets[i] the ticket).
// IN-ORDER: stops at the first ticket whose slot is not yet published
// (writer mid-memcpy) and leaves *cursor there, so a record in flight is
// retried on the next poll, never dropped. Only records genuinely
// OVERWRITTEN by a writer lapping the ring (seq advanced past the ticket)
// are skipped. A mid-copy record used to be skipped with the cursor
// advanced past it — with MB-size records the consumer's tight poll loop
// reliably landed inside the producer's memcpy window and the record (and
// the worker waiting on its reply) was lost forever. Returns count.
int64_t obsring_poll(void* h, uint64_t* cursor, uint8_t* out, uint64_t* lens,
                     uint64_t* tickets, uint64_t max_records) {
  Ring* r = (Ring*)h;
  uint64_t newest = r->header->ticket.load(std::memory_order_acquire);
  if (newest == 0 || *cursor >= newest) return 0;
  uint64_t n_slots = r->header->n_slots;
  uint64_t start = *cursor;
  // records older than (newest - n_slots) are overwritten; skip them
  if (newest > n_slots && start < newest - n_slots) start = newest - n_slots;

  uint64_t stride = r->header->slot_bytes;
  int64_t count = 0;
  uint64_t t = start;
  for (; t < newest && (uint64_t)count < max_records; ++t) {
    SlotHeader* s = slot_at(r, t % n_slots);
    uint64_t seq1 = s->seq.load(std::memory_order_acquire);
    uint64_t ready = 2 * t + 2;
    if (seq1 < ready) break;     // ticket t not yet published: retry next poll
    if (seq1 > ready) continue;  // lapped: record lost to overwrite, skip
    uint64_t len = s->len;
    if (len > stride) continue;
    memcpy(out + (uint64_t)count * stride,
           reinterpret_cast<uint8_t*>(s) + sizeof(SlotHeader), len);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t seq2 = s->seq.load(std::memory_order_acquire);
    if (seq2 != seq1) {
      if (seq2 < ready) break;  // defensive: seq is monotonic, retry
      continue;                 // writer lapped us mid-read: discard
    }
    lens[count] = len;
    tickets[count] = t;
    ++count;
  }
  *cursor = t;
  return count;
}

void obsring_close(void* h) {
  Ring* r = (Ring*)h;
  bool owner = r->owner;
  char name[256];
  strncpy(name, r->name, sizeof(name));
  munmap(r->header, r->map_bytes);
  close(r->fd);
  if (owner) shm_unlink(name);
  delete r;
}

}  // extern "C"
