// episode_codec: native host-side codecs for the episode data path.
//
// The reference's host runtime spends its time in Python image plumbing:
// 10 writer threads PNG-encoding episodes (data_generation/
// data_generator.py:199-213) and 8 dataloader workers PIL-decoding +
// normalizing them back (dataset/dataloader.py:30-43,
// dataset/carla_dataset.py:494-515). This library provides the same
// transforms as tight multithreaded C++ loops, exposed over a C ABI and
// loaded from Python with ctypes (e2e_parking_carla_tpu/native.py):
//
//   * CARLA 24-bit RGB depth encode/decode  (carla_dataset.py:114-131)
//   * 15-channel BEV bit-pack/unpack        (data_generation/tools.py:9-24)
//   * uint8 RGB -> ImageNet-normalized f32 with center crop
//     (carla_dataset.py:47-63, 494-515)
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

constexpr float kImagenetMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kImagenetStd[3] = {0.229f, 0.224f, 0.225f};

// Run fn(begin, end) over [0, n) on up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  threads = (int)std::max<int64_t>(1, std::min<int64_t>(threads, n));
  if (threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min<int64_t>(begin + chunk, n);
    if (begin >= end) break;
    pool.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// depth meters (n floats) -> interleaved RGB uint8 (n*3), CARLA encoding.
void depth_encode(const float* depth_m, uint8_t* rgb, int64_t n, int threads) {
  parallel_for(n, threads, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      float norm = depth_m[i] / 1000.0f;
      norm = std::min(1.0f, std::max(0.0f, norm));
      uint32_t code =
          (uint32_t)std::lround((double)norm * (double)(256u * 256u * 256u - 1u));
      rgb[i * 3 + 0] = (uint8_t)(code & 0xFFu);
      rgb[i * 3 + 1] = (uint8_t)((code >> 8) & 0xFFu);
      rgb[i * 3 + 2] = (uint8_t)((code >> 16) & 0xFFu);
    }
  });
}

// interleaved RGB uint8 (n*3) -> depth meters (n floats).
void depth_decode(const uint8_t* rgb, float* depth_m, int64_t n, int threads) {
  constexpr double kScale = 1000.0 / (256.0 * 256.0 * 256.0 - 1.0);
  parallel_for(n, threads, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t code = (uint32_t)rgb[i * 3 + 0] |
                      ((uint32_t)rgb[i * 3 + 1] << 8) |
                      ((uint32_t)rgb[i * 3 + 2] << 16);
      depth_m[i] = (float)(code * kScale);
    }
  });
}

// 15-channel {0,1} BEV (C,H,W uint8) -> 3-channel bit-packed (3,H,W uint8)
// (tools.py:9-24: channels 0-4 -> R bits 7..3, 5-9 -> G, 10-14 -> B).
void bev_pack(const uint8_t* bev, uint8_t* packed, int64_t hw, int threads) {
  parallel_for(hw, threads, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint8_t out[3] = {0, 0, 0};
      for (int c = 0; c < 15; ++c) {
        uint8_t bit = bev[(int64_t)c * hw + i] ? 1 : 0;
        out[c / 5] |= (uint8_t)(bit << (8 - (c % 5) - 1));
      }
      packed[i] = out[0];
      packed[hw + i] = out[1];
      packed[2 * hw + i] = out[2];
    }
  });
}

// inverse of bev_pack.
void bev_unpack(const uint8_t* packed, uint8_t* bev, int64_t hw, int threads) {
  parallel_for(hw, threads, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint8_t in[3] = {packed[i], packed[hw + i], packed[2 * hw + i]};
      for (int c = 0; c < 15; ++c) {
        bev[(int64_t)c * hw + i] =
            (uint8_t)((in[c / 5] >> (8 - (c % 5) - 1)) & 1u);
      }
    }
  });
}

// uint8 HWC RGB (h,w) -> center-cropped (crop,crop) CHW-free float32 HWC,
// ImageNet-normalized.
void normalize_crop(const uint8_t* rgb, float* out, int h, int w, int crop,
                    int threads) {
  int y0 = h / 2 - crop / 2;
  int x0 = w / 2 - crop / 2;
  parallel_for(crop, threads, [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* src = rgb + ((y0 + r) * (int64_t)w + x0) * 3;
      float* dst = out + r * (int64_t)crop * 3;
      for (int c = 0; c < crop; ++c) {
        for (int k = 0; k < 3; ++k) {
          float v = (float)src[c * 3 + k] / 255.0f;
          dst[c * 3 + k] = (v - kImagenetMean[k]) / kImagenetStd[k];
        }
      }
    }
  });
}

int episode_codec_abi_version() { return 1; }

}  // extern "C"
