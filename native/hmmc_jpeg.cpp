// Batched JPEG decode + geometry for the input pipeline.
//
// The reference framework's per-sample CPU hot loop is
// cv2.imdecode -> PIL -> torchvision resize/crop per frame
// (dataloader_msrvtt_retrieval.py:319-335). This module replaces it with a
// single native call per BATCH:
//
//   decode (libjpeg-turbo, with DCT-domain prescaling to land near the
//   target size) -> bilinear short-side resize -> center crop -> tightly
//   packed uint8 [n, out, out, 3] RGB
//
// parallelized across frames with a std::thread pool. Exposed as a plain C
// ABI consumed from Python via ctypes (no pybind11 dependency).
//
// Build: make -C native   (or python -m hmmc_tpu.data.jpeg_native --build)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize HxWx3 -> nh x nw x 3 (uint8).
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int nh,
                     int nw) {
  const float sy = static_cast<float>(h) / nh;
  const float sx = static_cast<float>(w) / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float tl = src[(y0 * w + x0) * 3 + c];
        const float tr = src[(y0 * w + x1) * 3 + c];
        const float bl = src[(y1 * w + x0) * 3 + c];
        const float br = src[(y1 * w + x1) * 3 + c];
        const float top = tl + (tr - tl) * wx;
        const float bot = bl + (br - bl) * wx;
        dst[(y * nw + x) * 3 + c] =
            static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

// Decode one JPEG into RGB, short-side resize to `target`, center crop to
// target x target, write into out (target*target*3). Returns 0 on success.
int decode_one(const uint8_t* blob, size_t size, int target, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, blob, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT prescale: pick the smallest M/8 (M in 1..8) whose short side still
  // covers `target` — decodes ~ (M/8)^2 of the pixels.
  const int short_side = std::min(cinfo.image_width, cinfo.image_height);
  int m = 8;
  while (m > 1 && (short_side * (m - 1)) / 8 >= target) --m;
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  std::vector<uint8_t> pixels(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // short-side resize
  int nh, nw;
  if (w <= h) {
    nw = target;
    nh = std::max(target, static_cast<int>(
        static_cast<int64_t>(h) * target / w));
  } else {
    nh = target;
    nw = std::max(target, static_cast<int>(
        static_cast<int64_t>(w) * target / h));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear(pixels.data(), h, w, resized.data(), nh, nw);

  // center crop
  const int top = (nh - target) / 2;
  const int left = (nw - target) / 2;
  for (int y = 0; y < target; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                resized.data() + (static_cast<size_t>(y + top) * nw + left) * 3,
                static_cast<size_t>(target) * 3);
  }
  return 0;
}

}  // namespace

extern "C" {

// blobs: n pointers; sizes: n blob lengths; out: [n, target, target, 3]
// uint8, caller-allocated. Returns the number of FAILED decodes (their
// output slots are zero-filled).
int hmmc_decode_batch(const uint8_t* const* blobs, const size_t* sizes,
                      int n, int target, uint8_t* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min(num_threads, n > 0 ? n : 1);
  std::atomic<int> next(0), failures(0);
  const size_t stride = static_cast<size_t>(target) * target * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + stride * i;
      if (decode_one(blobs[i], sizes[i], target, dst) != 0) {
        std::memset(dst, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

int hmmc_jpeg_abi_version() { return 1; }

}  // extern "C"
