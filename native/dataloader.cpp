// cadepth_tpu native data pipeline.
//
// C++ counterpart of the reference's SunRGBDLoader hot path
// (src/data/sunrgbd_loader.cpp): per-sample JPEG/PNG decode -> BGR->RGB
// float [0,1] -> 16-bit depth mm->m -> intrinsics load + rescale ->
// camera-consistent augmentation (crop shifts cx/cy, hflip mirrors +
// negates ray-x + reflects cx, brightness/contrast jitter) -> packed
// NHWC float32 batch buffers, with an internal thread pool so the
// Python GIL is never involved in the decode path.
//
// Exposed as a plain C ABI consumed via ctypes
// (cadepth_tpu/data/native.py). Semantics must match the Python loader
// in cadepth_tpu/data/sunrgbd.py exactly on the non-augmented path
// (both use OpenCV decode/resize); the augmented path matches in
// distribution (the RNG streams differ: std::mt19937_64 here vs numpy
// PCG64 there), with identical camera-consistency rules.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace fs = std::filesystem;

namespace {

struct AugmentParams {
  int enable_crop = 0;
  float crop_scale_min = 0.7f;
  float crop_scale_max = 1.0f;
  int enable_flip = 0;
  float flip_prob = 0.5f;
  int enable_jitter = 0;
  float brightness_delta = 0.2f;
  float contrast_delta = 0.2f;
};

std::string find_first(const fs::path& dir,
                       const std::vector<std::string>& exts) {
  if (!fs::is_directory(dir)) return "";
  std::vector<std::string> names;
  for (const auto& entry : fs::directory_iterator(dir)) {
    std::string ext = entry.path().extension().string();
    std::transform(ext.begin(), ext.end(), ext.begin(), ::tolower);
    for (const auto& want : exts) {
      if (ext == want) names.push_back(entry.path().string());
    }
  }
  if (names.empty()) return "";
  std::sort(names.begin(), names.end());
  return names.front();
}

bool load_intrinsics(const fs::path& path, float k[9]) {
  std::ifstream file(path);
  if (!file.is_open()) return false;
  for (int i = 0; i < 9; ++i) {
    if (!(file >> k[i])) return false;
  }
  return true;
}

// One sample's full pipeline. Writes into the batch-offset slices of the
// output buffers. Returns empty string on success, error message on failure.
std::string load_sample(const std::string& image_dir, int target_h,
                        int target_w, const AugmentParams* aug,
                        uint64_t seed, int compute_rays, float* rgb_out,
                        float* depth_out, float* rays_out, float* k_out) {
  const fs::path dir(image_dir);

  std::string rgb_path = find_first(dir / "image", {".jpg", ".jpeg", ".png"});
  if (rgb_path.empty()) return "RGB image not found: " + image_dir;
  std::string depth_path = find_first(dir / "depth", {".png"});
  if (depth_path.empty()) return "Depth image not found: " + image_dir;

  cv::Mat bgr = cv::imread(rgb_path, cv::IMREAD_COLOR);
  if (bgr.empty()) return "Cannot decode RGB: " + rgb_path;
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
  rgb.convertTo(rgb, CV_32FC3, 1.0 / 255.0);

  cv::Mat depth_raw = cv::imread(depth_path, cv::IMREAD_UNCHANGED);
  if (depth_raw.empty()) return "Cannot decode depth: " + depth_path;
  cv::Mat depth;
  if (depth_raw.type() == CV_16UC1) {
    depth_raw.convertTo(depth, CV_32F, 1.0 / 1000.0);  // mm -> m
  } else {
    depth_raw.convertTo(depth, CV_32F);
  }

  float k[9];
  if (!load_intrinsics(dir / "intrinsics.txt", k)) {
    return "Cannot load intrinsics: " + image_dir;
  }

  auto resize_to_target = [&](cv::Mat& rgb_m, cv::Mat& depth_m, float* km) {
    int h = rgb_m.rows, w = rgb_m.cols;
    if (h == target_h && w == target_w) return;
    cv::resize(rgb_m, rgb_m, cv::Size(target_w, target_h), 0, 0,
               cv::INTER_LINEAR);
    cv::resize(depth_m, depth_m, cv::Size(target_w, target_h), 0, 0,
               cv::INTER_NEAREST);
    const float sx = static_cast<float>(target_w) / w;
    const float sy = static_cast<float>(target_h) / h;
    km[0] *= sx;  // fx
    km[4] *= sy;  // fy
    km[2] *= sx;  // cx
    km[5] *= sy;  // cy
  };

  resize_to_target(rgb, depth, k);

  bool flipped = false;
  if (aug != nullptr) {
    std::mt19937_64 rng(seed);
    if (aug->enable_crop) {
      std::uniform_real_distribution<float> scale_dist(aug->crop_scale_min,
                                                       aug->crop_scale_max);
      const float scale = scale_dist(rng);
      const int h = rgb.rows, w = rgb.cols;
      const int crop_h = static_cast<int>(h * scale);
      const int crop_w = static_cast<int>(w * scale);
      std::uniform_int_distribution<int> x_dist(0, std::max(1, w - crop_w));
      std::uniform_int_distribution<int> y_dist(0, std::max(1, h - crop_h));
      const int cx_off = x_dist(rng);
      const int cy_off = y_dist(rng);
      rgb = rgb(cv::Rect(cx_off, cy_off, crop_w, crop_h)).clone();
      depth = depth(cv::Rect(cx_off, cy_off, crop_w, crop_h)).clone();
      k[2] -= cx_off;  // cx
      k[5] -= cy_off;  // cy
    }
    if (aug->enable_flip) {
      std::uniform_real_distribution<float> flip_dist(0.0f, 1.0f);
      if (flip_dist(rng) < aug->flip_prob) {
        cv::flip(rgb, rgb, 1);
        cv::flip(depth, depth, 1);
        k[2] = rgb.cols - k[2] - 1.0f;  // cx reflect
        flipped = true;
      }
    }
    if (aug->enable_jitter) {
      std::uniform_real_distribution<float> b_dist(1.0f - aug->brightness_delta,
                                                   1.0f + aug->brightness_delta);
      std::uniform_real_distribution<float> c_dist(1.0f - aug->contrast_delta,
                                                   1.0f + aug->contrast_delta);
      const float brightness = b_dist(rng);
      const float contrast = c_dist(rng);
      rgb = rgb * contrast + cv::Scalar::all(brightness - 1.0f);
      cv::min(rgb, 1.0f, rgb);
      cv::max(rgb, 0.0f, rgb);
    }
    resize_to_target(rgb, depth, k);
  }
  (void)flipped;  // ray-x flip handled below via the post-aug K

  // Pack outputs. RGB is already contiguous CV_32FC3 HWC.
  std::memcpy(rgb_out, rgb.ptr<float>(),
              sizeof(float) * target_h * target_w * 3);
  std::memcpy(depth_out, depth.ptr<float>(),
              sizeof(float) * target_h * target_w);
  std::memcpy(k_out, k, sizeof(float) * 9);

  if (compute_rays && rays_out != nullptr) {
    // Unit rays from the final (post-resize/augment) K — the on-host
    // equivalent of the fused on-device path; matches
    // SunRGBDLoader._compute_rays in sunrgbd.py.
    const float fx = k[0], fy = k[4], cx = k[2], cy = k[5];
    for (int v = 0; v < target_h; ++v) {
      for (int u = 0; u < target_w; ++u) {
        const float x = (u - cx) / fx;
        const float y = (v - cy) / fy;
        const float inv_norm = 1.0f / std::sqrt(x * x + y * y + 1.0f);
        float* out = rays_out + (static_cast<size_t>(v) * target_w + u) * 3;
        out[0] = x * inv_norm;
        out[1] = y * inv_norm;
        out[2] = inv_norm;
      }
    }
  }
  return "";
}

}  // namespace

extern "C" {

// Returns 0 on success; on failure returns 1 and writes the first error
// into `err` (truncated to err_len).
int cadepth_load_batch(const char** image_dirs, int batch, int target_h,
                       int target_w,
                       // augmentation (null aug_seeds disables)
                       int enable_crop, float crop_scale_min,
                       float crop_scale_max, int enable_flip, float flip_prob,
                       int enable_jitter, float brightness_delta,
                       float contrast_delta, const uint64_t* aug_seeds,
                       int compute_rays, int num_threads,
                       // outputs (caller-allocated, NHWC float32)
                       float* rgb_out,    // B*H*W*3
                       float* depth_out,  // B*H*W*1
                       float* rays_out,   // B*H*W*3 (may be null)
                       float* k_out,      // B*9
                       char* err, int err_len) {
  AugmentParams aug;
  aug.enable_crop = enable_crop;
  aug.crop_scale_min = crop_scale_min;
  aug.crop_scale_max = crop_scale_max;
  aug.enable_flip = enable_flip;
  aug.flip_prob = flip_prob;
  aug.enable_jitter = enable_jitter;
  aug.brightness_delta = brightness_delta;
  aug.contrast_delta = contrast_delta;

  const size_t px = static_cast<size_t>(target_h) * target_w;
  std::atomic<int> next(0);
  std::vector<std::string> errors(batch);

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < batch; i = next.fetch_add(1)) {
      errors[i] = load_sample(
          image_dirs[i], target_h, target_w,
          aug_seeds != nullptr ? &aug : nullptr,
          aug_seeds != nullptr ? aug_seeds[i] : 0, compute_rays,
          rgb_out + i * px * 3, depth_out + i * px,
          rays_out != nullptr ? rays_out + i * px * 3 : nullptr,
          k_out + i * 9);
    }
  };

  const int n_threads =
      std::max(1, std::min(num_threads > 0
                               ? num_threads
                               : static_cast<int>(
                                     std::thread::hardware_concurrency()),
                           batch));
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  for (int i = 0; i < batch; ++i) {
    if (!errors[i].empty()) {
      std::strncpy(err, errors[i].c_str(), err_len - 1);
      err[err_len - 1] = '\0';
      return 1;
    }
  }
  return 0;
}

// Standalone ray-grid computation (reference ray_direction_computer.cpp
// closed form), kept for the preprocess CLI and format tests.
void cadepth_ray_grid(const float* k9, int height, int width,
                      float* rays_out) {
  const float fx = k9[0], fy = k9[4], cx = k9[2], cy = k9[5];
  for (int v = 0; v < height; ++v) {
    for (int u = 0; u < width; ++u) {
      const float x = (u - cx) / fx;
      const float y = (v - cy) / fy;
      const float inv_norm = 1.0f / std::sqrt(x * x + y * y + 1.0f);
      float* out = rays_out + (static_cast<size_t>(v) * width + u) * 3;
      out[0] = x * inv_norm;
      out[1] = y * inv_norm;
      out[2] = inv_norm;
    }
  }
}

const char* cadepth_version() { return "cadepth_native 0.1.0"; }

}  // extern "C"
