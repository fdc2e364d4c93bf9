// Lock-free single-producer single-consumer ring buffer for fixed-size
// records (C++17, no dependencies).
//
// Role: the real-time host I/O path of the controller runtime — the native
// equivalent of the reference's DDS transport between the sensor/control
// threads and the MPC loop (SURVEY.md §2b N10: "host-side async runtime ...
// double-buffered"). The producer (robot I/O thread) pushes sensor records
// at the control rate; the consumer (MPC loop) drains the latest without
// ever blocking the producer.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct RingBuffer {
  std::atomic<uint64_t> head;  // next write slot (producer)
  std::atomic<uint64_t> tail;  // next read slot (consumer)
  uint64_t capacity;           // number of slots (power of two)
  uint64_t record_size;        // bytes per record
  alignas(64) unsigned char data[1];  // flexible array
};

inline uint64_t mask(const RingBuffer* rb, uint64_t i) {
  return i & (rb->capacity - 1);
}

}  // namespace

extern "C" {

void* rb_create(uint64_t capacity_pow2, uint64_t record_size) {
  if (capacity_pow2 == 0 || (capacity_pow2 & (capacity_pow2 - 1)) != 0)
    return nullptr;
  size_t bytes = sizeof(RingBuffer) + capacity_pow2 * record_size;
  auto* rb = static_cast<RingBuffer*>(::operator new(bytes, std::align_val_t(64)));
  rb->head.store(0, std::memory_order_relaxed);
  rb->tail.store(0, std::memory_order_relaxed);
  rb->capacity = capacity_pow2;
  rb->record_size = record_size;
  return rb;
}

void rb_destroy(void* h) {
  ::operator delete(static_cast<RingBuffer*>(h), std::align_val_t(64));
}

// Push one record. Returns 1 on success, 0 if full (record dropped —
// real-time producers must never block).
int rb_push(void* h, const void* record) {
  auto* rb = static_cast<RingBuffer*>(h);
  uint64_t head = rb->head.load(std::memory_order_relaxed);
  uint64_t tail = rb->tail.load(std::memory_order_acquire);
  if (head - tail >= rb->capacity) return 0;
  std::memcpy(rb->data + mask(rb, head) * rb->record_size, record,
              rb->record_size);
  rb->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Pop the OLDEST record. Returns 1 on success, 0 if empty.
int rb_pop(void* h, void* record) {
  auto* rb = static_cast<RingBuffer*>(h);
  uint64_t tail = rb->tail.load(std::memory_order_relaxed);
  uint64_t head = rb->head.load(std::memory_order_acquire);
  if (tail == head) return 0;
  std::memcpy(record, rb->data + mask(rb, tail) * rb->record_size,
              rb->record_size);
  rb->tail.store(tail + 1, std::memory_order_release);
  return 1;
}

// Read the NEWEST record without consuming (sensor-snapshot semantics: the
// MPC tick wants the latest state, like the reference's latched sensor_msg).
// Returns 1 on success, 0 if empty.
int rb_latest(void* h, void* record) {
  auto* rb = static_cast<RingBuffer*>(h);
  uint64_t head = rb->head.load(std::memory_order_acquire);
  uint64_t tail = rb->tail.load(std::memory_order_relaxed);
  if (tail == head) return 0;
  std::memcpy(record, rb->data + mask(rb, head - 1) * rb->record_size,
              rb->record_size);
  return 1;
}

uint64_t rb_size(void* h) {
  auto* rb = static_cast<RingBuffer*>(h);
  return rb->head.load(std::memory_order_acquire) -
         rb->tail.load(std::memory_order_acquire);
}

}  // extern "C"
