// Native IO runtime: multi-threaded RIFF/WAVE batch decoder.
//
// The reference's data loader is librosa.load fanned out over
// multiprocessing.Pool worker processes (utils.py:174-215) — process spawn +
// pickle transport per batch. Here: one shared library, a std::thread pool
// decoding PCM16/PCM32/float32 wavs directly into contiguous buffers that
// Python reads zero-copy via ctypes. No Python in the decode path.
//
// C ABI (see exemplars_vc_tpu/io/native.py):
//   evc_load_batch(paths, n, n_threads) -> handle (NULL on alloc failure)
//   evc_batch_length/sr/copy/error_msg  -> per-file access
//   evc_batch_free(handle)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  std::vector<double> samples;  // mono, normalized to [-1, 1)
  int sample_rate = 0;
  std::string error;
};

struct Batch {
  std::vector<Decoded> files;
};

bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(&(*out)[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

uint32_t rd_u32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

void decode_one(const char* path, Decoded* out) {
  std::string data;
  if (!read_file(path, &data)) {
    out->error = "cannot read file";
    return;
  }
  if (data.size() < 12 || std::memcmp(data.data(), "RIFF", 4) != 0 ||
      std::memcmp(data.data() + 8, "WAVE", 4) != 0) {
    out->error = "not a RIFF/WAVE file";
    return;
  }
  const unsigned char* bytes = reinterpret_cast<const unsigned char*>(data.data());
  size_t pos = 12;
  uint16_t audio_format = 0, n_channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const unsigned char* raw = nullptr;
  size_t raw_size = 0;

  while (pos + 8 <= data.size()) {
    uint32_t size = rd_u32(bytes + pos + 4);
    const unsigned char* body = bytes + pos + 8;
    size_t body_size = std::min(static_cast<size_t>(size), data.size() - pos - 8);
    if (std::memcmp(bytes + pos, "fmt ", 4) == 0 && body_size >= 16) {
      audio_format = rd_u16(body);
      n_channels = rd_u16(body + 2);
      sample_rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (audio_format == 0xFFFE && body_size >= 26) {
        // WAVE_FORMAT_EXTENSIBLE: real format = first 2 bytes of SubFormat
        // GUID (1 = PCM, 3 = IEEE float) — matches io/wav.py
        audio_format = rd_u16(body + 24);
      }
    } else if (std::memcmp(bytes + pos, "data", 4) == 0) {
      raw = body;
      raw_size = body_size;
    }
    pos += 8 + size + (size & 1);  // chunks are word-aligned
  }
  if (!raw || !sample_rate || !n_channels) {
    out->error = "missing fmt/data chunk";
    return;
  }

  size_t bytes_per = bits / 8;
  if (!bytes_per) {
    out->error = "bad bit depth";
    return;
  }
  size_t n_total = raw_size / (bytes_per * n_channels);
  out->samples.resize(n_total);
  out->sample_rate = static_cast<int>(sample_rate);

  const double inv_ch = 1.0 / n_channels;
  if (audio_format == 1 && bits == 16) {
    const int16_t* pcm = reinterpret_cast<const int16_t*>(raw);
    for (size_t i = 0; i < n_total; ++i) {
      double acc = 0.0;
      for (int c = 0; c < n_channels; ++c) acc += pcm[i * n_channels + c];
      out->samples[i] = acc * inv_ch / 32768.0;
    }
  } else if (audio_format == 1 && bits == 32) {
    const int32_t* pcm = reinterpret_cast<const int32_t*>(raw);
    for (size_t i = 0; i < n_total; ++i) {
      double acc = 0.0;
      for (int c = 0; c < n_channels; ++c) acc += pcm[i * n_channels + c];
      out->samples[i] = acc * inv_ch / 2147483648.0;
    }
  } else if (audio_format == 3 && bits == 32) {
    const float* pcm = reinterpret_cast<const float*>(raw);
    for (size_t i = 0; i < n_total; ++i) {
      double acc = 0.0;
      for (int c = 0; c < n_channels; ++c) acc += pcm[i * n_channels + c];
      out->samples[i] = acc * inv_ch;
    }
  } else {
    out->error = "unsupported format " + std::to_string(audio_format) + "/" +
                 std::to_string(bits) + "bit";
    out->samples.clear();
  }
}

}  // namespace

extern "C" {

void* evc_load_batch(const char** paths, int n_paths, int n_threads) {
  Batch* batch = new (std::nothrow) Batch();
  if (!batch) return nullptr;
  batch->files.resize(static_cast<size_t>(n_paths));
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_paths) break;
      decode_one(paths[i], &batch->files[static_cast<size_t>(i)]);
    }
  };
  std::vector<std::thread> pool;
  int n = std::min(n_threads, n_paths);
  pool.reserve(static_cast<size_t>(n));
  for (int t = 0; t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return batch;
}

long evc_batch_length(void* h, int i) {
  return static_cast<long>(static_cast<Batch*>(h)->files[static_cast<size_t>(i)].samples.size());
}

int evc_batch_sr(void* h, int i) {
  return static_cast<Batch*>(h)->files[static_cast<size_t>(i)].sample_rate;
}

const char* evc_batch_error_msg(void* h, int i) {
  const std::string& e = static_cast<Batch*>(h)->files[static_cast<size_t>(i)].error;
  return e.empty() ? nullptr : e.c_str();
}

void evc_batch_copy(void* h, int i, double* dst) {
  const std::vector<double>& s = static_cast<Batch*>(h)->files[static_cast<size_t>(i)].samples;
  std::memcpy(dst, s.data(), s.size() * sizeof(double));
}

void evc_batch_free(void* h) { delete static_cast<Batch*>(h); }

}  // extern "C"
