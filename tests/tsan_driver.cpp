// ThreadSanitizer harness for libpancov_io (SURVEY.md §5 "race
// detection"): drives every multi-threaded code path — the streaming
// producer (parallel inflate + chaser + consumer handoff), the
// accumulating encoder, and the vrange-parallel one-shot loader —
// under -fsanitize=thread. Built and run by tests/test_tsan.py;
// any data race makes TSAN print a WARNING and exit nonzero
// (halt_on_error=1).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* pancov_stream_open(const char* path, int n_threads,
                         uint32_t flags_mask, int32_t min_mapq,
                         int64_t pad, const int64_t* ext_offsets,
                         const int64_t* ext_limits, int64_t n_ext,
                         const int64_t* reg_off,
                         const int64_t* reg_start,
                         const int64_t* reg_end, int64_t n_regions,
                         int region_mode, int64_t window_bytes,
                         char* err, int err_len);
int64_t pancov_stream_take_enc_acc(void* h, uint8_t* d8, uint8_t* l8,
                                   int32_t* excd, int32_t* excl,
                                   int64_t cap, int64_t exc_cap,
                                   int32_t* base_out,
                                   int64_t* n_excd_out,
                                   int64_t* n_excl_out);
int64_t pancov_stream_n_records(void* h);
void pancov_stream_close(void* h);

void* pancov_bam_load(const char* path, int n_threads,
                      uint32_t flags_mask, int32_t min_mapq,
                      int64_t pad, const int64_t* ext_offsets,
                      const int64_t* ext_limits, int64_t n_ext,
                      const int64_t* reg_off, const int64_t* reg_start,
                      const int64_t* reg_end, int64_t n_regions,
                      int region_mode, const int64_t* vr_start,
                      const int64_t* vr_end, int64_t n_vr, char* err,
                      int err_len);
int64_t pancov_load_n_events(void* h);
void pancov_load_close(void* h);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s file.bam\n", argv[0]);
    return 2;
  }
  char err[256] = {0};

  // streaming path: producer + 4 inflate workers + this consumer,
  // tiny windows to force many handoffs and seam carries
  void* h = pancov_stream_open(argv[1], 4, 1796, -1, 512, nullptr,
                               nullptr, 0, nullptr, nullptr, nullptr,
                               0, 0, 1 << 20, err, sizeof(err));
  if (!h) {
    std::fprintf(stderr, "stream_open: %s\n", err);
    return 1;
  }
  const int64_t cap = 1 << 14, ce = 1 << 8;
  std::vector<uint8_t> d8(cap), l8(cap);
  std::vector<int32_t> excd(ce), excl(ce);
  int32_t base;
  int64_t nd, nl, total = 0;
  for (;;) {
    int64_t n = pancov_stream_take_enc_acc(h, d8.data(), l8.data(),
                                           excd.data(), excl.data(),
                                           cap, ce, &base, &nd, &nl);
    if (n == -2) {
      std::fprintf(stderr, "stream error\n");
      return 1;
    }
    if (n == 0) break;
    total += n;
  }
  int64_t recs = pancov_stream_n_records(h);
  pancov_stream_close(h);

  // one-shot loader: block-parallel inflate + work-stealing chaser
  void* lb = pancov_bam_load(argv[1], 4, 1796, -1, 512, nullptr,
                             nullptr, 0, nullptr, nullptr, nullptr, 0,
                             0, nullptr, nullptr, 0, err, sizeof(err));
  if (!lb) {
    std::fprintf(stderr, "bam_load: %s\n", err);
    return 1;
  }
  int64_t ev = pancov_load_n_events(lb);
  pancov_load_close(lb);

  if (total != ev) {  // both count (start,end) pairs
    std::fprintf(stderr, "pair/event mismatch: %lld vs %lld\n",
                 (long long)total, (long long)ev);
    return 1;
  }
  std::printf("TSAN_DRIVER_OK pairs=%lld recs=%lld\n",
              (long long)total, (long long)recs);
  return 0;
}
