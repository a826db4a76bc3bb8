// Multi-threaded fixed-record gather for the packed crop cache.
//
// Assembling one global-batch of crops (8192 x 2 views x 224x224x3 uint8
// ~= 2.4 GB) from memmapped shards is a pure memcpy problem; Python-side
// fancy indexing runs it single-threaded. This kernel fans the record
// copies across threads (memory-bandwidth-bound, scales with DRAM
// channels).
//
// Built on demand by simhand_tpu.native (g++ -O3 -shared -fopenmp, no
// external deps; falls back to numpy when no compiler is present).
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Copies n records of record_size bytes: dst[i] = src[indices[i]].
void gather_records(const uint8_t* src, const int64_t* indices, int64_t n,
                    int64_t record_size, uint8_t* dst) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + i * record_size, src + indices[i] * record_size,
                static_cast<size_t>(record_size));
  }
}

// Multi-source variant: records live in shard `shard_ids[i]` at row
// `rows[i]`; srcs is an array of shard base pointers.
void gather_records_sharded(const uint8_t* const* srcs,
                            const int64_t* shard_ids, const int64_t* rows,
                            int64_t n, int64_t record_size, uint8_t* dst) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + i * record_size,
                srcs[shard_ids[i]] + rows[i] * record_size,
                static_cast<size_t>(record_size));
  }
}

}  // extern "C"
