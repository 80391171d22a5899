// fastwav: multithreaded WAV batch decoder for the training data pipeline.
//
// Native-runtime replacement for the reference's torch DataLoader worker
// processes (dataloaders/__init__.py:21-28, num_workers=4): decodes a batch
// of RIFF/WAVE files in parallel into a caller-provided float32 buffer,
// with pad-or-trim to a fixed segment length (the SC09 fix_length contract,
// dataloaders/sc.py:25-33) or random-crop (the Mel2Samp segment sampler,
// dataloaders/mel2samp.py:96-103).
//
// Supported encodings: PCM 16-bit and IEEE float32, mono or first-channel-
// of-interleaved.  Returns per-file status so Python can fall back to scipy
// for exotic files.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = -1;
  uint32_t data_bytes = 0;
};

// Parse the RIFF chunk list. Returns false on malformed files.
bool parse_header(FILE* f, WavInfo* info) {
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  uint8_t chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      uint8_t fmt[16];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) return false;
      memcpy(&info->format, fmt + 0, 2);
      memcpy(&info->channels, fmt + 2, 2);
      memcpy(&info->sample_rate, fmt + 4, 4);
      memcpy(&info->bits, fmt + 14, 2);
      if (size > 16 && fseek(f, size - 16, SEEK_CUR) != 0) return false;
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return info->format != 0;
    } else {
      // chunks are word-aligned
      if (fseek(f, size + (size & 1), SEEK_CUR) != 0) return false;
    }
  }
  return false;
}

// xorshift PRNG for crop offsets: deterministic given (seed, index).
uint64_t mix(uint64_t x) {
  x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

// Decode one file into out[0..target_len), scaled by `scale`.
// crop_mode: 0 = pad-or-trim from the start; 1 = random crop (seeded).
// Returns 0 on success, negative error codes otherwise.
int decode_one(const char* path, int target_len, float scale, int crop_mode,
               uint64_t crop_seed, float* out, int32_t* sample_rate,
               int32_t* orig_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info) || info.channels == 0 || info.bits == 0) {
    fclose(f);
    return -2;
  }
  const int bytes_per_sample = info.bits / 8;
  const long frame_bytes = (long)bytes_per_sample * info.channels;
  const long n_frames = info.data_bytes / frame_bytes;
  *sample_rate = (int32_t)info.sample_rate;
  *orig_len = (int32_t)n_frames;

  long start = 0;
  long want = n_frames < target_len ? n_frames : target_len;
  if (crop_mode == 1 && n_frames > target_len) {
    start = (long)(mix(crop_seed) % (uint64_t)(n_frames - target_len + 1));
  }
  if (fseek(f, info.data_offset + start * frame_bytes, SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }

  std::vector<uint8_t> raw((size_t)want * frame_bytes);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -4;
  }
  fclose(f);

  if (info.format == 1 && info.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(raw.data());
    for (long i = 0; i < want; ++i) out[i] = scale * (float)s[i * info.channels];
  } else if (info.format == 3 && info.bits == 32) {
    const float* s = reinterpret_cast<const float*>(raw.data());
    for (long i = 0; i < want; ++i) out[i] = scale * s[i * info.channels];
  } else {
    return -5;  // unsupported encoding -> python fallback
  }
  for (long i = want; i < target_len; ++i) out[i] = 0.0f;
  return 0;
}

}  // namespace

extern "C" {

// Decode n files in parallel. out is (n, target_len) float32 row-major.
// status, sample_rates, orig_lens are length-n int32 arrays.
// Returns the number of failures (status[i] != 0).
int fastwav_decode_batch(const char** paths, int n, int target_len,
                         float scale, int crop_mode, uint64_t crop_seed,
                         float* out, int32_t* sample_rates,
                         int32_t* orig_lens, int32_t* status, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;

  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int rc = decode_one(paths[i], target_len, scale, crop_mode,
                          mix(crop_seed + (uint64_t)i), out + (size_t)i * target_len,
                          sample_rates + i, orig_lens + i);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Probe a single file's (sample_rate, n_frames) without decoding.
int fastwav_probe(const char* path, int32_t* sample_rate, int32_t* n_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = (int32_t)info.sample_rate;
  const long frame_bytes = (long)(info.bits / 8) * info.channels;
  *n_frames = frame_bytes > 0 ? (int32_t)(info.data_bytes / frame_bytes) : 0;
  return 0;
}

}  // extern "C"
