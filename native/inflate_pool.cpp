// Parallel zlib inflate pool for HDF5 gzip chunk decompression.
//
// The aposteriori tree schema stores gzip'd chunks per residue frame;
// h5py serializes ALL HDF5 calls behind a global lock, so decompression
// cannot parallelize from Python threads through h5py. The loader instead
// reads RAW chunk bytes under the lock (cheap) and hands batches of them
// to this pool, which inflates straight into the destination batch buffer
// from N worker threads (HDF5's deflate filter writes standard zlib
// streams). On a 1-core host this matches the h5py path; on TPU-VM-class
// hosts (dozens of cores) it scales the tree-layout loader accordingly.
//
// Concurrency: all queue state (jobs/next/remaining/first_error) is guarded
// by one mutex — workers only release it around the actual inflate. The
// done signal is raised while holding the mutex so the waiter cannot miss
// it, and run() is serialized by run_mu so concurrent callers (two loader
// producer threads in one process) cannot corrupt each other's job state.
//
// Built via g++ -O3 -shared -fPIC -lz (see timed_design_tpu/io/fast_inflate.py).
#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstddef>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Job {
    const uint8_t* src;
    size_t src_len;
    uint8_t* dst;
    size_t dst_len;
};

struct Pool {
    std::mutex run_mu;  // serializes whole run() calls
    std::mutex mu;      // guards everything below
    std::condition_variable cv_work, cv_done;
    std::vector<Job> jobs;
    size_t next = 0;
    int remaining = 0;
    int first_error = 0;  // 0 = ok, else job index + 1
    bool stop = false;
    std::vector<std::thread> workers;

    explicit Pool(int n_threads) {
        for (int i = 0; i < n_threads; ++i) {
            workers.emplace_back([this] { this->worker(); });
        }
    }

    ~Pool() {
        {
            std::lock_guard<std::mutex> g(mu);
            stop = true;
        }
        cv_work.notify_all();
        for (auto& t : workers) t.join();
    }

    static bool inflate_one(const Job& j) {
        uLongf dlen = j.dst_len;
        // HDF5's H5Z_FILTER_DEFLATE produces standard zlib streams.
        int rc = uncompress(j.dst, &dlen, j.src, j.src_len);
        return rc == Z_OK && dlen == j.dst_len;
    }

    void worker() {
        std::unique_lock<std::mutex> g(mu);
        for (;;) {
            cv_work.wait(g, [&] { return stop || next < jobs.size(); });
            if (stop) return;
            const size_t i = next++;
            const Job job = jobs[i];
            g.unlock();
            const bool ok = inflate_one(job);
            g.lock();
            if (!ok && first_error == 0) first_error = static_cast<int>(i) + 1;
            if (--remaining == 0) cv_done.notify_all();  // under mu: no lost wakeup
        }
    }

    int run(const Job* js, int n) {
        if (n == 0) return 0;
        std::lock_guard<std::mutex> serial(run_mu);
        std::unique_lock<std::mutex> g(mu);
        jobs.assign(js, js + n);
        next = 0;
        remaining = n;
        first_error = 0;
        cv_work.notify_all();
        cv_done.wait(g, [&] { return remaining == 0; });
        // leave no stale work visible: next == jobs.size() == 0 for waiters
        jobs.clear();
        next = 0;
        return first_error;
    }
};

}  // namespace

extern "C" {

void* inflate_pool_create(int n_threads) {
    if (n_threads < 1) n_threads = 1;
    return new Pool(n_threads);
}

void inflate_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Inflate n_jobs zlib streams in parallel. Returns 0 on success, else the
// 1-based index of the first failing job. Thread-safe (calls serialize).
int inflate_pool_run(void* pool, const uint8_t** srcs, const size_t* src_lens,
                     uint8_t** dsts, const size_t* dst_lens, int n_jobs) {
    std::vector<Job> jobs(n_jobs);
    for (int i = 0; i < n_jobs; ++i) {
        jobs[i] = Job{srcs[i], src_lens[i], dsts[i], dst_lens[i]};
    }
    return static_cast<Pool*>(pool)->run(jobs.data(), n_jobs);
}

}  // extern "C"
