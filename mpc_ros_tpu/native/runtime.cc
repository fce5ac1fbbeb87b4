// mpc_ros_tpu native runtime: transport shim, rate executor, CSV logger.
//
// Replaces the runtime pieces the reference delegated to ROS:
//  * Topic slots  — the pub/sub boundary (reference: TCPROS topics). The
//    reference's feedback_vel subscriber writes a shared Twist from the
//    spinner thread while the control loop reads it with NO synchronization
//    (/root/reference/mpc_ros/src/mpc_planner_ros.cpp:122-124,177-179 —
//    SURVEY.md §5.2). Here: a seqlock per topic slot gives wait-free,
//    tear-free reads of fixed-size payloads.
//  * Rate executor — move_base drives the planner at controller_frequency
//    with no overrun detection (the 0.5 s solver cap exceeds the 0.05/0.1 s
//    period, SURVEY.md §6). Here: absolute-deadline clock_nanosleep pacing
//    with cycle/overrun/jitter accounting.
//  * CSV logger  — buffered tracking-log appender in the reference's
//    assets/*.csv schema, off the Python hot path.
//
// Built as a plain shared library (no pybind11 in the image); consumed via
// ctypes from runtime.py.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <new>

extern "C" {

// ---------------------------------------------------------------- topics --

// Seqlock-protected latest-value slot for POD payloads (<= capacity bytes).
struct TopicSlot {
  std::atomic<uint64_t> seq;       // even = stable, odd = write in progress
  uint32_t capacity;
  uint32_t size;                   // bytes of last publish
  uint64_t publish_count;
  unsigned char data[];            // payload buffer (flexible tail)
};

TopicSlot* topic_create(uint32_t capacity) {
  void* mem = ::operator new(sizeof(TopicSlot) + capacity, std::nothrow);
  if (!mem) return nullptr;
  auto* t = new (mem) TopicSlot();
  t->seq.store(0, std::memory_order_relaxed);
  t->capacity = capacity;
  t->size = 0;
  t->publish_count = 0;
  std::memset(t->data, 0, capacity);
  return t;
}

void topic_destroy(TopicSlot* t) {
  if (t) {
    t->~TopicSlot();
    ::operator delete(t);
  }
}

// Single-writer publish: bump to odd, copy, bump to even.
int topic_publish(TopicSlot* t, const void* payload, uint32_t size) {
  if (!t || size > t->capacity) return -1;
  uint64_t s = t->seq.load(std::memory_order_relaxed);
  t->seq.store(s + 1, std::memory_order_release);
  std::atomic_thread_fence(std::memory_order_release);
  std::memcpy(t->data, payload, size);
  t->size = size;
  t->publish_count++;
  std::atomic_thread_fence(std::memory_order_release);
  t->seq.store(s + 2, std::memory_order_release);
  return 0;
}

// Wait-free read of the latest value; retries while a write is in flight.
// Returns payload size, 0 if nothing published yet, -1 on error.
int topic_read(TopicSlot* t, void* out, uint32_t out_capacity) {
  if (!t) return -1;
  for (;;) {
    uint64_t s1 = t->seq.load(std::memory_order_acquire);
    if (s1 & 1) continue;  // write in progress
    if (s1 == 0) return 0;
    uint32_t size = t->size;
    if (size > out_capacity) return -1;
    std::atomic_thread_fence(std::memory_order_acquire);
    std::memcpy(out, t->data, size);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s2 = t->seq.load(std::memory_order_acquire);
    if (s1 == s2) return (int)size;
  }
}

uint64_t topic_publish_count(TopicSlot* t) {
  return t ? t->publish_count : 0;
}

// ------------------------------------------------------------- rate loop --

struct RateLoop {
  int64_t period_ns;
  struct timespec next;
  uint64_t cycles;
  uint64_t overruns;
  int64_t worst_late_ns;
  int64_t total_late_ns;
  int started;
};

static inline int64_t ts_diff_ns(const timespec& a, const timespec& b) {
  return (int64_t)(a.tv_sec - b.tv_sec) * 1000000000LL +
         (a.tv_nsec - b.tv_nsec);
}

static inline void ts_add_ns(timespec* t, int64_t ns) {
  t->tv_sec += ns / 1000000000LL;
  t->tv_nsec += ns % 1000000000LL;
  if (t->tv_nsec >= 1000000000L) {
    t->tv_sec += 1;
    t->tv_nsec -= 1000000000L;
  }
}

RateLoop* rate_create(int64_t period_ns) {
  auto* r = new (std::nothrow) RateLoop();
  if (!r) return nullptr;
  r->period_ns = period_ns;
  r->cycles = 0;
  r->overruns = 0;
  r->worst_late_ns = 0;
  r->total_late_ns = 0;
  // first deadline: one period from creation (loop-entry anchor)
  clock_gettime(CLOCK_MONOTONIC, &r->next);
  ts_add_ns(&r->next, period_ns);
  r->started = 1;
  return r;
}

void rate_destroy(RateLoop* r) { delete r; }

// Sleep until the current cycle's absolute deadline. Returns the cycle's
// lateness in ns (>0 = the work overran its deadline; no sleep happens and
// the schedule re-anchors at `now` rather than bursting).
int64_t rate_sleep(RateLoop* r) {
  if (!r) return 0;
  struct timespec now;
  clock_gettime(CLOCK_MONOTONIC, &now);
  int64_t late = ts_diff_ns(now, r->next);
  if (late > 0) {
    r->overruns++;
    if (late > r->worst_late_ns) r->worst_late_ns = late;
    r->total_late_ns += late;
    r->next = now;  // re-anchor
  } else {
    clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &r->next, nullptr);
  }
  ts_add_ns(&r->next, r->period_ns);
  r->cycles++;
  return late > 0 ? late : 0;
}

uint64_t rate_cycles(RateLoop* r) { return r ? r->cycles : 0; }
uint64_t rate_overruns(RateLoop* r) { return r ? r->overruns : 0; }
int64_t rate_worst_late_ns(RateLoop* r) { return r ? r->worst_late_ns : 0; }

// ------------------------------------------------------------ CSV logger --

struct CsvLogger {
  FILE* f;
  uint64_t rows;
};

CsvLogger* csv_open(const char* path) {
  FILE* f = std::fopen(path, "w");
  if (!f) return nullptr;
  std::setvbuf(f, nullptr, _IOFBF, 1 << 16);
  std::fputs("idx,cte,etheta,cmd_vel.linear.x,cmd_vel.angular.z\n", f);
  auto* l = new (std::nothrow) CsvLogger();
  if (!l) {
    std::fclose(f);
    return nullptr;
  }
  l->f = f;
  l->rows = 0;
  return l;
}

int csv_row(CsvLogger* l, int64_t idx, double cte, double etheta, double v,
            double w) {
  if (!l || !l->f) return -1;
  std::fprintf(l->f, "%lld,%.6g,%.6g,%.6g,%.6g\n", (long long)idx, cte,
               etheta, v, w);
  l->rows++;
  return 0;
}

// Footer format: "tracking time,<sec>,<nsec>" (reference assets/mpc.csv).
int csv_close(CsvLogger* l, int64_t sec, int64_t nsec) {
  if (!l) return -1;
  if (l->f) {
    std::fprintf(l->f, "tracking time,%lld,%lld\n", (long long)sec,
                 (long long)nsec);
    std::fclose(l->f);
  }
  uint64_t rows = l->rows;
  delete l;
  return (int)rows;
}

}  // extern "C"
