// Parallel zlib inflate pool for HDF5 gzip chunk decompression.
//
// The aposteriori tree schema stores one gzip'd chunk per residue frame;
// h5py serializes ALL HDF5 calls behind a global lock, so decompression
// cannot parallelize from Python threads through h5py. The loader instead
// reads RAW chunk bytes under the lock (cheap) and hands batches of them
// to this pool, which inflates straight into the destination batch buffer
// from N worker threads (HDF5's deflate filter writes standard zlib
// streams). On a 1-core host this matches the h5py path; on TPU-VM-class
// hosts (dozens of cores) it scales the tree-layout loader accordingly.
//
// Built via g++ -O3 -shared -fPIC -lz (see timed_design_tpu/io/fast_inflate.py).
#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
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
    std::vector<std::thread> workers;
    std::mutex mu;
    std::condition_variable cv_work, cv_done;
    const Job* jobs = nullptr;
    int n_jobs = 0;
    std::atomic<int> next{0};
    std::atomic<int> remaining{0};
    std::atomic<int> first_error{0};  // 0 = ok, else job index + 1
    uint64_t generation = 0;
    bool stop = false;

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
        uint64_t seen = 0;
        for (;;) {
            {
                std::unique_lock<std::mutex> g(mu);
                cv_work.wait(g, [&] { return stop || generation != seen; });
                if (stop) return;
                seen = generation;
            }
            for (;;) {
                int i = next.fetch_add(1);
                if (i >= n_jobs) break;
                if (!inflate_one(jobs[i])) {
                    int expected = 0;
                    first_error.compare_exchange_strong(expected, i + 1);
                }
                if (remaining.fetch_sub(1) == 1) cv_done.notify_all();
            }
        }
    }

    int run(const Job* js, int n) {
        if (n == 0) return 0;
        {
            std::lock_guard<std::mutex> g(mu);
            jobs = js;
            n_jobs = n;
            next.store(0);
            remaining.store(n);
            first_error.store(0);
            ++generation;
        }
        cv_work.notify_all();
        {
            std::unique_lock<std::mutex> g(mu);
            cv_done.wait(g, [&] { return remaining.load() == 0; });
        }
        return first_error.load();
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
// 1-based index of the first failing job.
int inflate_pool_run(void* pool, const uint8_t** srcs, const size_t* src_lens,
                     uint8_t** dsts, const size_t* dst_lens, int n_jobs) {
    std::vector<Job> jobs(n_jobs);
    for (int i = 0; i < n_jobs; ++i) {
        jobs[i] = Job{srcs[i], src_lens[i], dsts[i], dst_lens[i]};
    }
    return static_cast<Pool*>(pool)->run(jobs.data(), n_jobs);
}

}  // extern "C"
