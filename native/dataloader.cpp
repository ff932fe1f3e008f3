// Native host-side data pipeline: threaded JPEG decode + bilinear resize +
// ImageNet normalize + fixed-shape caption batch assembly.
//
// This is the TPU-native equivalent of the role the reference delegates to
// PyTorch DataLoader worker processes (reference training.py:28-32 spawning
// 4 workers whose whole job is PIL decode + transforms, tasks.py:92-100,
// 114-136).  Instead of Python processes + pickle IPC, a C++ thread pool
// fills caller-provided numpy buffers in place (zero copies across the
// boundary; ctypes binding in gan_image_captioning_tpu/data/native.py).
//
// Exposed C ABI:
//   gic_decode_image(path, out_size, out_chw)            -> 0 | errno-style
//   gic_decode_batch(paths, n, out_size, out, n_threads) -> #failures
//   gic_assemble_captions(flat_tokens, offsets, n, seq_len,
//                         out_captions, out_lengths, out_weights)
//
// Normalization constants are the reference's exact ImageNet stats
// (tasks.py:97-98).  Resize is a box/bilinear hybrid matching PIL's
// BILINEAR filter closely (PIL applies support scaling when downsizing).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};  // tasks.py:97
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};   // tasks.py:98

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file into an RGB8 buffer (grayscale expanded to 3 channels,
// mirroring the reference's repeat transform, tasks.py:96).
bool decode_jpeg(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg expands grayscale for us
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = *w * cinfo.output_components;
  rgb->resize(static_cast<size_t>(stride) * *h);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Triangle-filter (bilinear with downscale support widening — PIL semantics)
// separable resize of one channel-interleaved RGB image, then normalize into
// CHW float32.
void resize_normalize(const std::vector<uint8_t>& rgb, int w, int h,
                      int out_size, float* out_chw) {
  const int S = out_size;
  const float sx = static_cast<float>(w) / S;
  const float sy = static_cast<float>(h) / S;
  const float support_x = std::max(1.0f, sx);
  const float support_y = std::max(1.0f, sy);

  // Horizontal pass into an intermediate [h, S, 3] float buffer.
  std::vector<float> tmp(static_cast<size_t>(h) * S * 3);
  std::vector<float> weights;
  std::vector<int> starts(S), counts(S);
  std::vector<float> all_w;
  for (int ox = 0; ox < S; ++ox) {
    const float center = (ox + 0.5f) * sx;
    int lo = static_cast<int>(std::floor(center - support_x));
    int hi = static_cast<int>(std::ceil(center + support_x));
    lo = std::max(lo, 0);
    hi = std::min(hi, w);
    starts[ox] = lo;
    counts[ox] = hi - lo;
    float total = 0.0f;
    size_t base = all_w.size();
    for (int x = lo; x < hi; ++x) {
      float d = std::abs((x + 0.5f - center) / support_x);
      float wt = std::max(0.0f, 1.0f - d);
      all_w.push_back(wt);
      total += wt;
    }
    if (total > 0)
      for (int i = 0; i < counts[ox]; ++i) all_w[base + i] /= total;
  }
  {
    size_t wofs = 0;
    std::vector<size_t> wofs_per(S);
    for (int ox = 0; ox < S; ++ox) { wofs_per[ox] = wofs; wofs += counts[ox]; }
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = rgb.data() + static_cast<size_t>(y) * w * 3;
      float* trow = tmp.data() + static_cast<size_t>(y) * S * 3;
      for (int ox = 0; ox < S; ++ox) {
        float acc[3] = {0, 0, 0};
        const float* wt = all_w.data() + wofs_per[ox];
        const uint8_t* px = row + starts[ox] * 3;
        for (int i = 0; i < counts[ox]; ++i, px += 3) {
          acc[0] += wt[i] * px[0];
          acc[1] += wt[i] * px[1];
          acc[2] += wt[i] * px[2];
        }
        trow[ox * 3 + 0] = acc[0];
        trow[ox * 3 + 1] = acc[1];
        trow[ox * 3 + 2] = acc[2];
      }
    }
  }

  // Vertical pass + normalize, writing CHW.
  const float inv255 = 1.0f / 255.0f;
  for (int oy = 0; oy < S; ++oy) {
    const float center = (oy + 0.5f) * sy;
    int lo = static_cast<int>(std::floor(center - support_y));
    int hi = static_cast<int>(std::ceil(center + support_y));
    lo = std::max(lo, 0);
    hi = std::min(hi, h);
    weights.clear();
    float total = 0.0f;
    for (int y = lo; y < hi; ++y) {
      float d = std::abs((y + 0.5f - center) / support_y);
      float wt = std::max(0.0f, 1.0f - d);
      weights.push_back(wt);
      total += wt;
    }
    if (total > 0) for (float& wt : weights) wt /= total;
    for (int ox = 0; ox < S; ++ox) {
      float acc[3] = {0, 0, 0};
      for (int i = 0; i < hi - lo; ++i) {
        const float* px = tmp.data()
            + (static_cast<size_t>(lo + i) * S + ox) * 3;
        acc[0] += weights[i] * px[0];
        acc[1] += weights[i] * px[1];
        acc[2] += weights[i] * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        out_chw[(static_cast<size_t>(c) * S + oy) * S + ox] =
            (acc[c] * inv255 - kMean[c]) / kStd[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image into out_chw [3, out_size, out_size] float32.
int gic_decode_image(const char* path, int out_size, float* out_chw) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &rgb, &w, &h)) return 1;
  resize_normalize(rgb, w, h, out_size, out_chw);
  return 0;
}

// Decode + resize to CHW uint8 (normalization deferred to the device —
// uint8 transfers are 4x smaller than float32).  Matches PIL semantics:
// resize produces uint8, normalization is a separate stage (tasks.py:92-99).
int gic_decode_image_u8(const char* path, int out_size, uint8_t* out_chw) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &rgb, &w, &h)) return 1;
  // reuse the float pipeline then undo the normalize into rounded uint8
  std::vector<float> tmp(static_cast<size_t>(3) * out_size * out_size);
  resize_normalize(rgb, w, h, out_size, tmp.data());
  const size_t plane = static_cast<size_t>(out_size) * out_size;
  for (int c = 0; c < 3; ++c) {
    for (size_t i = 0; i < plane; ++i) {
      float v = (tmp[c * plane + i] * kStd[c] + kMean[c]) * 255.0f;
      v = std::min(std::max(v + 0.5f, 0.0f), 255.0f);
      out_chw[c * plane + i] = static_cast<uint8_t>(v);
    }
  }
  return 0;
}

// Threaded uint8 batch decode: out [n, 3, S, S] uint8.
int gic_decode_batch_u8(const char** paths, int n, int out_size,
                        uint8_t* out, int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t per = static_cast<size_t>(3) * out_size * out_size;
  num_threads = std::max(1, num_threads);
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        if (gic_decode_image_u8(paths[i], out_size, out + per * i) != 0) {
          std::memset(out + per * i, 0, per);
          failures.fetch_add(1);
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

// Threaded batch decode. paths: n C strings; out: [n, 3, S, S] float32.
// Returns the number of failed images (their slots are zero-filled).
int gic_decode_batch(const char** paths, int n, int out_size, float* out,
                     int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t per = static_cast<size_t>(3) * out_size * out_size;
  num_threads = std::max(1, num_threads);
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        if (gic_decode_image(paths[i], out_size, out + per * i) != 0) {
          std::memset(out + per * i, 0, per * sizeof(float));
          failures.fetch_add(1);
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

// Fixed-shape caption batch assembly (the collate_fn equivalent,
// tasks.py:138-158, at fixed width): wraps each caption <S> tokens <E>,
// pads with <PAD>=0, truncates tokens at seq_len-2.
// flat_tokens: concatenated int32 token ids; offsets: n+1 prefix offsets.
void gic_assemble_captions(const int32_t* flat_tokens, const int64_t* offsets,
                           int n, int seq_len, int32_t* out_captions,
                           int32_t* out_lengths, float* out_weights) {
  constexpr int32_t kPad = 0, kStart = 1, kEnd = 2;  // tasks.py:42-44
  for (int i = 0; i < n; ++i) {
    int32_t* row = out_captions + static_cast<size_t>(i) * seq_len;
    std::fill(row, row + seq_len, kPad);
    int64_t lo = offsets[i], hi = offsets[i + 1];
    int len = static_cast<int>(std::min<int64_t>(hi - lo, seq_len - 2));
    row[0] = kStart;
    std::memcpy(row + 1, flat_tokens + lo, len * sizeof(int32_t));
    row[1 + len] = kEnd;
    out_lengths[i] = len + 2;  // tasks.py:156
    out_weights[i] = 1.0f;
  }
}

}  // extern "C"
