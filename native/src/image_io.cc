// Native host-side image pipeline for pytracking_tpu.
//
// The reference framework leans on native code for its host hot paths: libjpeg-turbo
// via jpeg4py for decoding (install.sh:37) and the PrRoIPooling CUDA extension for
// pooling. On TPU VMs the device computes everything, but the per-frame host work —
// JPEG decode and the training pipeline's crop+resize — still gates throughput. This
// library provides:
//
//   ptt_decode_jpeg      libjpeg decode -> RGB uint8
//   ptt_decode_jpeg_info header-only size probe
//   ptt_crop_resize      bilinear crop+resize with replicate borders (the
//                        processing_utils.sample_target hot path)
//   ptt_batch_crop_resize  OpenMP-parallel batched variant for loader workers
//
// Exposed as a plain C ABI, loaded from Python with ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <csetjmp>

extern "C" {

struct PttError {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void ptt_error_exit(j_common_ptr cinfo) {
  PttError* err = reinterpret_cast<PttError*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Probe JPEG dimensions. Returns 0 on success.
int ptt_decode_jpeg_info(const uint8_t* data, long size, int* width, int* height,
                         int* channels) {
  jpeg_decompress_struct cinfo;
  PttError jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = ptt_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  *channels = 3;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode a JPEG buffer into a caller-allocated RGB uint8 buffer (h*w*3).
// Returns 0 on success.
int ptt_decode_jpeg(const uint8_t* data, long size, uint8_t* out, int out_h,
                    int out_w) {
  jpeg_decompress_struct cinfo;
  PttError jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = ptt_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != out_h ||
      static_cast<int>(cinfo.output_width) != out_w) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const int stride = out_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear crop+resize with replicate borders. The crop is [y0, y0+crop_h) x
// [x0, x0+crop_w) in continuous source coordinates (pixel centers at integers),
// resampled to (out_h, out_w). Matches ops/patch.sample_patch's convention:
// out pixel j samples y = y0 + (j + 0.5) / out_h * crop_h - 0.5.
void ptt_crop_resize(const uint8_t* src, int src_h, int src_w, int channels,
                     float y0, float x0, float crop_h, float crop_w, uint8_t* dst,
                     int out_h, int out_w) {
  for (int oy = 0; oy < out_h; ++oy) {
    const float sy = y0 + (oy + 0.5f) / out_h * crop_h - 0.5f;
    const int iy0 = static_cast<int>(std::floor(sy));
    const float fy = sy - iy0;
    const int y_lo = std::clamp(iy0, 0, src_h - 1);
    const int y_hi = std::clamp(iy0 + 1, 0, src_h - 1);
    for (int ox = 0; ox < out_w; ++ox) {
      const float sx = x0 + (ox + 0.5f) / out_w * crop_w - 0.5f;
      const int ix0 = static_cast<int>(std::floor(sx));
      const float fx = sx - ix0;
      const int x_lo = std::clamp(ix0, 0, src_w - 1);
      const int x_hi = std::clamp(ix0 + 1, 0, src_w - 1);
      const uint8_t* p00 = src + (y_lo * src_w + x_lo) * channels;
      const uint8_t* p01 = src + (y_lo * src_w + x_hi) * channels;
      const uint8_t* p10 = src + (y_hi * src_w + x_lo) * channels;
      const uint8_t* p11 = src + (y_hi * src_w + x_hi) * channels;
      uint8_t* o = dst + (oy * out_w + ox) * channels;
      for (int c = 0; c < channels; ++c) {
        const float v = (1 - fy) * ((1 - fx) * p00[c] + fx * p01[c]) +
                        fy * ((1 - fx) * p10[c] + fx * p11[c]);
        o[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Batched variant: N independent crops from N source images (pointers packed in
// `srcs`). OpenMP-parallel when built with -fopenmp.
void ptt_batch_crop_resize(const uint8_t** srcs, const int* src_hw, int channels,
                           const float* boxes /* N x 4: y0 x0 crop_h crop_w */,
                           uint8_t* dst, int n, int out_h, int out_w) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    ptt_crop_resize(srcs[i], src_hw[2 * i], src_hw[2 * i + 1], channels,
                    boxes[4 * i], boxes[4 * i + 1], boxes[4 * i + 2],
                    boxes[4 * i + 3], dst + i * out_h * out_w * channels, out_h,
                    out_w);
  }
}

}  // extern "C"
