// trajsink: asynchronous binary trajectory/metrics sink.
//
// The TPU-native runtime counterpart of the reference's host-side dataset
// and snapshot IO (SURVEY.md §2.1 Logger / §5 checkpoint row: rllab-style
// pickles and CSVs written synchronously from the python loop). Device→host
// transfers hand buffers to this sink, which writes them on a background
// thread so the collect/fit loop never blocks on the filesystem.
//
// File format: a stream of length-prefixed records
//   [u64 tag][u64 nbytes][payload bytes]
// with a fixed 16-byte magic header. Readers (python TrajReader) mmap or
// stream-parse; payloads are raw array bytes + a small JSON sidecar written
// by the python wrapper.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 trajsink.cpp -o libtrajsink.so
// Binding: ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[16] = "CADMTRAJSINK v1";

struct Record {
  uint64_t tag;
  std::vector<uint8_t> payload;
};

class Sink {
 public:
  Sink(const char* path, uint64_t max_queue_bytes)
      : max_queue_bytes_(max_queue_bytes), queued_bytes_(0), stop_(false),
        in_flight_(false), dropped_(0), written_records_(0) {
    file_ = std::fopen(path, "wb");
    if (file_) {
      std::fwrite(kMagic, 1, sizeof(kMagic), file_);
    }
    worker_ = std::thread([this] { Run(); });
  }

  ~Sink() { Close(); }

  bool ok() const { return file_ != nullptr; }

  // Copies the buffer and enqueues it; drops (and counts) when the queue is
  // over budget — the collect loop must never block on disk.
  bool Append(uint64_t tag, const uint8_t* data, uint64_t nbytes) {
    if (!file_) return false;
    {
      std::lock_guard<std::mutex> lock(mu_);
      if (queued_bytes_ + nbytes > max_queue_bytes_) {
        dropped_.fetch_add(1);
        return false;
      }
      Record r;
      r.tag = tag;
      r.payload.assign(data, data + nbytes);
      queued_bytes_ += nbytes;
      queue_.push_back(std::move(r));
    }
    cv_.notify_one();
    return true;
  }

  // Enqueues TWO records atomically (e.g. a META/ARRAY pair): both are
  // admitted or both dropped, so readers can never pair an ARRAY with a
  // stale earlier META.
  bool Append2(uint64_t tag1, const uint8_t* d1, uint64_t n1, uint64_t tag2,
               const uint8_t* d2, uint64_t n2) {
    if (!file_) return false;
    {
      std::lock_guard<std::mutex> lock(mu_);
      if (queued_bytes_ + n1 + n2 > max_queue_bytes_) {
        dropped_.fetch_add(2);
        return false;
      }
      Record r1;
      r1.tag = tag1;
      r1.payload.assign(d1, d1 + n1);
      Record r2;
      r2.tag = tag2;
      r2.payload.assign(d2, d2 + n2);
      queued_bytes_ += n1 + n2;
      queue_.push_back(std::move(r1));
      queue_.push_back(std::move(r2));
    }
    cv_.notify_one();
    return true;
  }

  // Durable: returns only after every enqueued record has been PHYSICALLY
  // written (queue empty AND no record in flight between pop and fwrite).
  void Flush() {
    std::unique_lock<std::mutex> lock(mu_);
    flush_cv_.wait(lock, [this] { return queue_.empty() && !in_flight_; });
    if (file_) std::fflush(file_);
  }

  void Close() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      if (stop_) return;
      stop_ = true;
    }
    cv_.notify_one();
    if (worker_.joinable()) worker_.join();
    if (file_) {
      std::fclose(file_);
      file_ = nullptr;
    }
  }

  uint64_t dropped() const { return dropped_.load(); }
  uint64_t written() const { return written_records_.load(); }

 private:
  void Run() {
    for (;;) {
      Record r;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        r = std::move(queue_.front());
        queue_.pop_front();
        queued_bytes_ -= r.payload.size();
        in_flight_ = true;
      }
      uint64_t n = r.payload.size();
      std::fwrite(&r.tag, sizeof(r.tag), 1, file_);
      std::fwrite(&n, sizeof(n), 1, file_);
      if (n) std::fwrite(r.payload.data(), 1, n, file_);
      written_records_.fetch_add(1);
      {
        std::lock_guard<std::mutex> lock(mu_);
        in_flight_ = false;
        if (queue_.empty()) flush_cv_.notify_all();
      }
    }
  }

  std::FILE* file_;
  uint64_t max_queue_bytes_;
  uint64_t queued_bytes_;
  std::deque<Record> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable flush_cv_;
  bool stop_;
  bool in_flight_;
  std::thread worker_;
  std::atomic<uint64_t> dropped_;
  std::atomic<uint64_t> written_records_;
};

}  // namespace

extern "C" {

void* trajsink_open(const char* path, uint64_t max_queue_bytes) {
  Sink* s = new Sink(path, max_queue_bytes);
  if (!s->ok()) {
    delete s;
    return nullptr;
  }
  return s;
}

int trajsink_append(void* handle, uint64_t tag, const uint8_t* data,
                    uint64_t nbytes) {
  return static_cast<Sink*>(handle)->Append(tag, data, nbytes) ? 1 : 0;
}

int trajsink_append2(void* handle, uint64_t tag1, const uint8_t* d1,
                     uint64_t n1, uint64_t tag2, const uint8_t* d2,
                     uint64_t n2) {
  return static_cast<Sink*>(handle)->Append2(tag1, d1, n1, tag2, d2, n2) ? 1
                                                                         : 0;
}

void trajsink_flush(void* handle) { static_cast<Sink*>(handle)->Flush(); }

uint64_t trajsink_dropped(void* handle) {
  return static_cast<Sink*>(handle)->dropped();
}

uint64_t trajsink_written(void* handle) {
  return static_cast<Sink*>(handle)->written();
}

void trajsink_close(void* handle) {
  Sink* s = static_cast<Sink*>(handle);
  s->Close();
  delete s;
}

}  // extern "C"
