// Threaded audio-segment prefetcher: the native data-loader the reference
// gets from torch DataLoader worker processes (dataloader_num_workers: 32
// in its train YAMLs; utility_scripts/dump_tokens Collator runs file reads
// + FLAC decode in those workers). Here: a C++ thread pool reads FLAC
// windows and decodes them (flac.cc's edmflac_decode, thread-safe via
// thread_local scratch) while the Python host loop feeds the accelerator;
// results are delivered in strict submission order so the data pipeline
// stays deterministic regardless of worker scheduling.
//
// C ABI (ctypes-consumed by edm_tts_tpu/data/native_prefetch.py):
//   edmpf_create(n_threads, max_inflight) -> handle
//   edmpf_submit(handle, path, start, count) -> ticket (blocks if full)
//   edmpf_next(handle, out, max_floats, *sr, *ch) -> samples per channel
//     (delivers tickets in submission order; -1 = decode/read error;
//      max_floats = capacity of out in total interleaved floats)
//   edmpf_destroy(handle)

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" int64_t edmflac_decode(const uint8_t* data, size_t size,
                                  int64_t start, int64_t count, float* out);
struct FlacInfo {
  uint32_t sample_rate;
  uint32_t channels;
  uint32_t bits_per_sample;
  uint64_t total_samples;
};
extern "C" int edmflac_info(const uint8_t* data, size_t size, FlacInfo* info);

namespace {

struct Job {
  uint64_t ticket;
  std::string path;
  int64_t start;
  int64_t count;
};

struct Result {
  std::vector<float> samples;  // interleaved
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  int64_t n = -1;  // samples per channel, -1 on error
};

struct Prefetcher {
  std::mutex mu;
  std::condition_variable cv_submit;   // space available / shutdown
  std::condition_variable cv_work;     // jobs available
  std::condition_variable cv_result;   // results available
  std::deque<Job> queue;
  std::map<uint64_t, Result> results;
  uint64_t next_ticket = 0;    // next to hand out
  uint64_t next_deliver = 0;   // next to return from edmpf_next
  size_t max_inflight;
  bool shutdown = false;
  std::vector<std::thread> workers;

  size_t inflight() const {
    // jobs queued or completed but not yet delivered
    return (size_t)(next_ticket - next_deliver);
  }
};

Result decode_file(const std::string& path, int64_t start, int64_t count) {
  Result r;
  if (start < 0) return r;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return r;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if (size < 0) {  // ftell failure: don't turn -1 into a huge allocation
    fclose(f);
    return r;
  }
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)size);
  if (fread(data.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return r;
  }
  fclose(f);

  FlacInfo info;
  if (edmflac_info(data.data(), data.size(), &info) != 0) return r;
  int64_t n = count;
  if (n < 0) n = (int64_t)info.total_samples - start;
  if (info.total_samples > 0) {
    // clamp to what the stream can deliver: an oversized num_frames must
    // not drive the allocation below (decode would return fewer anyway)
    int64_t avail = (int64_t)info.total_samples - start;
    if (avail < 0) avail = 0;
    if (n > avail) n = avail;
  }
  if (n < 0) return r;
  r.samples.resize((size_t)(n * info.channels));
  int64_t got = edmflac_decode(data.data(), data.size(), start, n,
                               r.samples.data());
  if (got < 0) return r;
  r.samples.resize((size_t)(got * info.channels));
  r.sample_rate = info.sample_rate;
  r.channels = info.channels;
  r.n = got;
  return r;
}

void worker_loop(Prefetcher* p) {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_work.wait(lk, [&] { return p->shutdown || !p->queue.empty(); });
      if (p->shutdown && p->queue.empty()) return;
      job = std::move(p->queue.front());
      p->queue.pop_front();
    }
    Result r;
    try {
      r = decode_file(job.path, job.start, job.count);
    } catch (...) {
      // bad_alloc etc. must not escape the worker thread (std::terminate);
      // report the job as failed (r.n stays -1) instead
      r = Result();
    }
    {
      std::lock_guard<std::mutex> lk(p->mu);
      p->results.emplace(job.ticket, std::move(r));
    }
    p->cv_result.notify_all();
  }
}

}  // namespace

extern "C" {

void* edmpf_create(int n_threads, int max_inflight) {
  if (n_threads < 1) n_threads = 1;
  if (max_inflight < n_threads) max_inflight = n_threads;
  auto* p = new Prefetcher;
  p->max_inflight = (size_t)max_inflight;
  for (int i = 0; i < n_threads; ++i) {
    p->workers.emplace_back(worker_loop, p);
  }
  return p;
}

// Blocks while max_inflight undelivered tickets are outstanding (natural
// backpressure: bounded memory regardless of consumer speed).
int64_t edmpf_submit(void* h, const char* path, int64_t start,
                     int64_t count) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_submit.wait(lk, [&] {
    return p->shutdown || p->inflight() < p->max_inflight;
  });
  if (p->shutdown) return -1;
  uint64_t t = p->next_ticket++;
  p->queue.push_back(Job{t, path, start, count});
  lk.unlock();
  p->cv_work.notify_one();
  return (int64_t)t;
}

// Delivers the next ticket in submission order. Returns samples per
// channel (data copied into out, interleaved), or: -1 = job failed,
// -2 = nothing outstanding, -3 = result larger than the buffer (the
// result is consumed either way; no silent truncation).
// ``max_floats`` is the capacity of ``out`` in TOTAL floats (all channels
// interleaved), so the bound matches the memcpy size exactly.
int64_t edmpf_next(void* h, float* out, int64_t max_floats,
                   uint32_t* sample_rate, uint32_t* channels) {
  auto* p = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_deliver == p->next_ticket) return -2;
  uint64_t want = p->next_deliver;
  p->cv_result.wait(lk, [&] { return p->results.count(want) > 0; });
  Result r = std::move(p->results[want]);
  p->results.erase(want);
  p->next_deliver++;
  lk.unlock();
  p->cv_submit.notify_all();

  if (r.n < 0) return -1;
  if (r.n * (int64_t)r.channels > max_floats) return -3;  // buffer too small
  memcpy(out, r.samples.data(), (size_t)(r.n * r.channels) * sizeof(float));
  *sample_rate = r.sample_rate;
  *channels = r.channels;
  return r.n;
}

void edmpf_destroy(void* h) {
  auto* p = (Prefetcher*)h;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->shutdown = true;
  }
  p->cv_work.notify_all();
  p->cv_submit.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
