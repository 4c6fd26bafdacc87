// Fused batch assembly for the data loader.
//
// The Python path materializes, per image: a float32 copy (/255), a
// normalize pass ((x - 0.5) / 0.5), and a stack copy — three passes over
// every byte on the host, right on the training loop's critical path when
// feeding large TPU batches. This kernel fuses decode-output (uint8 HWC)
// -> scale/offset -> the preallocated contiguous NHWC float32 batch in one
// pass, parallelized across images with a simple thread pool.
//
// The reference framework is pure Python (SURVEY.md §2: no native code
// anywhere); this is the one host-side hot loop worth making native here.
//
// Exposed C ABI (ctypes, no pybind11 needed):
//   assemble_batch(srcs, n, hwc_elems, scale, offset, out, n_threads)
//     srcs:      array of n pointers to uint8 buffers of hwc_elems each
//     out:       float32 buffer of n * hwc_elems
//     out[i][j] = srcs[i][j] * scale + offset

#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

void assemble_batch(const uint8_t** srcs, int64_t n, int64_t hwc_elems,
                    float scale, float offset, float* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* src = srcs[i];
      float* dst = out + i * hwc_elems;
      int64_t j = 0;
      // simple 8x unroll; the compiler vectorizes the u8->f32 converts
      for (; j + 8 <= hwc_elems; j += 8) {
        dst[j + 0] = static_cast<float>(src[j + 0]) * scale + offset;
        dst[j + 1] = static_cast<float>(src[j + 1]) * scale + offset;
        dst[j + 2] = static_cast<float>(src[j + 2]) * scale + offset;
        dst[j + 3] = static_cast<float>(src[j + 3]) * scale + offset;
        dst[j + 4] = static_cast<float>(src[j + 4]) * scale + offset;
        dst[j + 5] = static_cast<float>(src[j + 5]) * scale + offset;
        dst[j + 6] = static_cast<float>(src[j + 6]) * scale + offset;
        dst[j + 7] = static_cast<float>(src[j + 7]) * scale + offset;
      }
      for (; j < hwc_elems; ++j) {
        dst[j] = static_cast<float>(src[j]) * scale + offset;
      }
    }
  };

  if (n_threads == 1 || n < 2) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * per;
    int64_t e = b + per < n ? b + per : n;
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
