// Native WAV decode + batched chunk loader for the host input pipeline.
//
// Replaces the reference's torchaudio/sox decode path
// (/root/reference/pase/dataset.py:240) with a dependency-free RIFF
// parser plus a multithreaded batch-cropper: given a file list, worker
// threads decode wavs and cut random fixed-size chunks directly into a
// caller-provided [B, T] float buffer (zero Python per-sample work).
//
// Exposed C ABI (ctypes):
//   long wav_num_samples(const char* path);
//   long read_wav_pcm16(const char* path, float* out, long max_samples);
//   long load_chunk_batch(const char** paths, long n_paths,
//                         float* out, long batch, long chunk,
//                         unsigned long long seed, int n_threads);

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = -1;
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4)) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4)) return false;
  // chunk walk
  for (;;) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) return false;
      memcpy(&info->format, buf + 0, 2);
      memcpy(&info->channels, buf + 2, 2);
      memcpy(&info->sample_rate, buf + 4, 4);
      memcpy(&info->bits, buf + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return info->format != 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  return false;
}

long decode(const char* path, float* out, long max_samples) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info) || info.data_offset < 0) {
    fclose(f);
    return -1;
  }
  const int bytes_per = info.bits / 8;
  long frames = info.data_bytes / (bytes_per * info.channels);
  if (max_samples >= 0 && frames > max_samples) frames = max_samples;
  fseek(f, info.data_offset, SEEK_SET);
  std::vector<uint8_t> raw(static_cast<size_t>(frames) * bytes_per *
                           info.channels);
  long got = static_cast<long>(fread(raw.data(), 1, raw.size(), f)) /
             (bytes_per * info.channels);
  fclose(f);
  // first channel only (matches reference stereo handling,
  // dataset.py:243-247)
  for (long i = 0; i < got; ++i) {
    const uint8_t* p = raw.data() +
        static_cast<size_t>(i) * bytes_per * info.channels;
    float v = 0.f;
    if (info.format == 3 && info.bits == 32) {        // IEEE float
      memcpy(&v, p, 4);
    } else if (info.bits == 16) {
      int16_t s;
      memcpy(&s, p, 2);
      v = s / 32768.f;
    } else if (info.bits == 32) {
      int32_t s;
      memcpy(&s, p, 4);
      v = s / 2147483648.f;
    } else if (info.bits == 8) {
      v = (p[0] - 128) / 128.f;
    }
    out[i] = v;
  }
  return got;
}

}  // namespace

extern "C" {

long wav_num_samples(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok) return -1;
  return info.data_bytes / ((info.bits / 8) * info.channels);
}

long read_wav_pcm16(const char* path, float* out, long max_samples) {
  return decode(path, out, max_samples);
}

// Decode n_paths wavs with n_threads workers, random-crop a chunk of
// `chunk` samples from each (reflect-style tiling when short) into
// out[b*chunk ...]. Returns number of rows filled.
long load_chunk_batch(const char** paths, long n_paths, float* out,
                      long batch, long chunk, unsigned long long seed,
                      int n_threads) {
  if (n_paths < batch) return -1;
  std::atomic<long> next(0);
  auto worker = [&](int tid) {
    std::mt19937_64 rng(seed + tid * 7919);
    std::vector<float> buf;
    for (;;) {
      long b = next.fetch_add(1);
      if (b >= batch) break;
      long n = wav_num_samples(paths[b]);
      if (n <= 0) {
        memset(out + b * chunk, 0, sizeof(float) * chunk);
        continue;
      }
      buf.resize(n);
      long got = decode(paths[b], buf.data(), n);
      if (got <= 0) {
        memset(out + b * chunk, 0, sizeof(float) * chunk);
        continue;
      }
      float* dst = out + b * chunk;
      if (got > chunk) {
        std::uniform_int_distribution<long> d(0, got - chunk - 1);
        long off = d(rng);
        memcpy(dst, buf.data() + off, sizeof(float) * chunk);
      } else {
        // tile (short-utterance pad)
        long pos = 0;
        while (pos < chunk) {
          long cnt = std::min(got, chunk - pos);
          memcpy(dst + pos, buf.data(), sizeof(float) * cnt);
          pos += cnt;
        }
      }
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads > 0 ? n_threads : 4;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  return batch;
}

}  // extern "C"
