// hgr_native — native host runtime for the TPU input pipeline.
//
// Replaces the C++ the reference leans on from third parties (OpenCV's
// cv2.imread JPEG decode, libs/load.py:54) with a first-party library:
//   * libjpeg decode straight into BGR (the reference trains on BGR),
//   * central-window crop + bilinear downscale + pad into the fixed
//     square staging canvas the device pipeline consumes
//     (mirrors hgr_tpu/data/pipeline.py:stage_image),
//   * a persistent thread pool that stages whole batches concurrently,
//     writing directly into the caller's pinned numpy buffers (zero
//     Python-side copies; the GIL is released for the entire batch).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG (from an open file or an in-memory buffer — exactly one
// source is non-null) into a BGR uint8 buffer. Returns true on success.
bool DecodeJpeg(FILE* f, const uint8_t* mem, size_t mem_len,
                std::vector<uint8_t>* out, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  if (f != nullptr) {
    jpeg_stdio_src(&cinfo, f);
  } else {
    jpeg_mem_src(&cinfo, mem, mem_len);
  }
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_EXT_BGR;  // BGR directly (libjpeg-turbo ext)
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;  // 3 for JCS_EXT_BGR
  out->resize(static_cast<size_t>(w) * h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return ch == 3;
}

bool DecodeJpegFile(const char* path, std::vector<uint8_t>* out, int* width,
                    int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  bool ok = DecodeJpeg(f, nullptr, 0, out, width, height);
  fclose(f);
  return ok;
}

// Bilinear resize (half-pixel centers, matching cv2.INTER_LINEAR) of a
// BGR window into dst (dw x dh).
void ResizeBilinear(const uint8_t* src, int sw, int sh, int src_stride,
                    uint8_t* dst, int dw, int dh, int dst_stride) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[y0c * src_stride + x0c * 3 + c];
        float v01 = src[y0c * src_stride + x1c * 3 + c];
        float v10 = src[y1c * src_stride + x0c * 3 + c];
        float v11 = src[y1c * src_stride + x1c * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        dst[y * dst_stride + x * 3 + c] =
            static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Stage one decoded image into the canvas; mirrors
// hgr_tpu/data/pipeline.py:stage_image (window = central
// window_frac*max(h,w) — derived from the augment config by
// pipeline.staging_window_fraction; downscale only when the window
// exceeds the canvas; affine maps original -> canvas coords).
void StageImage(const uint8_t* img, int w, int h, uint8_t* canvas,
                int canvas_size, float window_frac,
                float* affine /*6 floats*/, float* size_hw /*2 floats*/) {
  const int maxhw = h > w ? h : w;
  int win = static_cast<int>(window_frac * maxhw + 0.999999);
  float cx = w / 2.0f, cy = h / 2.0f;
  int x0 = static_cast<int>(cx - win / 2.0f);
  if (x0 < 0) x0 = 0;
  int y0 = static_cast<int>(cy - win / 2.0f);
  if (y0 < 0) y0 = 0;
  int x1 = x0 + win < w ? x0 + win : w;
  int y1 = y0 + win < h ? y0 + win : h;
  int ww = x1 - x0, wh = y1 - y0;

  std::memset(canvas, 0, static_cast<size_t>(canvas_size) * canvas_size * 3);
  float scale = 1.0f;
  const int src_stride = w * 3;
  const uint8_t* window = img + static_cast<size_t>(y0) * src_stride + x0 * 3;
  const int canvas_stride = canvas_size * 3;

  int whmax = wh > ww ? wh : ww;
  if (whmax > canvas_size) {
    scale = static_cast<float>(canvas_size) / whmax;
    int nw = static_cast<int>(ww * scale + 0.5f);
    int nh = static_cast<int>(wh * scale + 0.5f);
    if (nw < 1) nw = 1;
    if (nh < 1) nh = 1;
    ResizeBilinear(window, ww, wh, src_stride, canvas, nw, nh,
                   canvas_stride);
  } else {
    for (int y = 0; y < wh; ++y) {
      std::memcpy(canvas + static_cast<size_t>(y) * canvas_stride,
                  window + static_cast<size_t>(y) * src_stride, ww * 3);
    }
  }
  affine[0] = scale; affine[1] = 0.0f; affine[2] = -x0 * scale;
  affine[3] = 0.0f; affine[4] = scale; affine[5] = -y0 * scale;
  size_hw[0] = static_cast<float>(h);
  size_hw[1] = static_cast<float>(w);
}

// ---- Thread pool ----

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* GetPool(int n) {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (g_pool == nullptr || g_pool_size != n) {
    delete g_pool;
    g_pool = new ThreadPool(n);
    g_pool_size = n;
  }
  return g_pool;
}

}  // namespace

extern "C" {

// Decode one JPEG into caller buffer (cap bytes). Returns 0 on success.
// On success *width/*height are set; buffer holds BGR rows tightly packed.
int hgr_decode_jpeg(const char* path, uint8_t* out, int64_t cap, int* width,
                    int* height) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!DecodeJpegFile(path, &buf, &w, &h)) return 1;
  if (static_cast<int64_t>(buf.size()) > cap) return 2;
  std::memcpy(out, buf.data(), buf.size());
  *width = w;
  *height = h;
  return 0;
}

// Decode one in-memory JPEG (e.g. an HTTP request body) into the caller
// buffer (cap bytes). Same contract as hgr_decode_jpeg otherwise.
int hgr_decode_jpeg_mem(const uint8_t* data, int64_t len, uint8_t* out,
                        int64_t cap, int* width, int* height) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!DecodeJpeg(nullptr, data, static_cast<size_t>(len), &buf, &w, &h))
    return 1;
  if (static_cast<int64_t>(buf.size()) > cap) return 2;
  std::memcpy(out, buf.data(), buf.size());
  *width = w;
  *height = h;
  return 0;
}

// Decode + stage a batch of JPEGs concurrently.
//   paths:       array of n C strings
//   canvases:    n * canvas_size * canvas_size * 3 uint8 (out)
//   window_frac: central-window fraction of max(h, w) to stage
//   affines:     n * 6 float32 (out, row-major 2x3)
//   sizes_hw:    n * 2 float32 (out)
//   ok:          n uint8 (out, 1 = decoded fine)
// Returns number of failures.
int hgr_stage_batch2(const char** paths, int n, uint8_t* canvases,
                     int canvas_size, float window_frac, float* affines,
                     float* sizes_hw, uint8_t* ok, int num_threads) {
  ThreadPool* pool = GetPool(num_threads > 0 ? num_threads : 4);
  std::atomic<int> failures{0};
  // Completion is tracked under done_mu (not an atomic): the counter may
  // only become observable as == n while the worker still holds the
  // mutex, so the waiter can never destroy done_mu/done_cv (stack
  // locals) while a worker is between "count" and "notify".
  int done = 0;
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t canvas_bytes =
      static_cast<size_t>(canvas_size) * canvas_size * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      std::vector<uint8_t> img;
      int w = 0, h = 0;
      bool success = DecodeJpegFile(paths[i], &img, &w, &h);
      if (success) {
        StageImage(img.data(), w, h, canvases + i * canvas_bytes,
                   canvas_size, window_frac, affines + i * 6,
                   sizes_hw + i * 2);
        ok[i] = 1;
      } else {
        std::memset(canvases + i * canvas_bytes, 0, canvas_bytes);
        affines[i * 6 + 0] = 1.0f; affines[i * 6 + 1] = 0.0f;
        affines[i * 6 + 2] = 0.0f; affines[i * 6 + 3] = 0.0f;
        affines[i * 6 + 4] = 1.0f; affines[i * 6 + 5] = 0.0f;
        sizes_hw[i * 2] = static_cast<float>(canvas_size);
        sizes_hw[i * 2 + 1] = static_cast<float>(canvas_size);
        ok[i] = 0;
        failures.fetch_add(1);
      }
      {
        std::lock_guard<std::mutex> lock(done_mu);
        ++done;
        if (done == n) done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return done == n; });
  return failures.load();
}

}  // extern "C"
