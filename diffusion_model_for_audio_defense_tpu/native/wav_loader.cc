// Native batched WAV loader — the framework's C++ data-plane hot path.
//
// Replaces the reference's torch DataLoader worker *processes*
// (DiffWave_Unconditional/distributed_util.py + num_workers=8 loaders) with
// an in-process thread pool: the GIL is released for the whole batch while
// k threads decode RIFF/WAVE files straight into the caller's output buffer.
// Decode semantics are bit-identical to data/wav_io.py::read_wav followed by
// transforms_wav.py::FixAudioLength (head-truncate / tail-zero-pad):
//   - PCM 8/16/32-bit and IEEE float32/float64 (incl. WAVE_FORMAT_EXTENSIBLE)
//   - multi-channel mean-mix in float32
//   - linear resample via double-precision interp on a linspace grid
//     (numpy.interp parity; the SC corpus is natively 16 kHz so this is
//     a fallback path)
//
// Exposed as a plain C ABI consumed via ctypes (pybind11 is not in the
// image); see data/native_loader.py.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread wav_loader.cc -o libdmad_wav.so

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Error {
  std::string msg;
  bool ok() const { return msg.empty(); }
};

bool read_file(const char* path, std::vector<uint8_t>& buf, Error& err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    err.msg = std::string("cannot open ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) {
    std::fclose(f);
    err.msg = std::string("cannot stat ") + path;
    return false;
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(buf.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) {
    err.msg = std::string("short read on ") + path;
    return false;
  }
  return true;
}

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

// Mirrors wav_io._parse_riff: scan chunks for fmt/data, resolve
// WAVE_FORMAT_EXTENSIBLE (0xFFFE) via the SubFormat GUID's leading tag.
bool parse_riff(const std::vector<uint8_t>& d, const char* path, uint16_t& tag,
                uint16_t& ch, uint32_t& sr, uint16_t& bits, const uint8_t*& payload,
                size_t& payload_len, Error& err) {
  if (d.size() < 12 || std::memcmp(d.data(), "RIFF", 4) != 0 ||
      std::memcmp(d.data() + 8, "WAVE", 4) != 0) {
    err.msg = std::string("not a RIFF/WAVE file: ") + path;
    return false;
  }
  size_t pos = 12;
  const uint8_t* fmt = nullptr;
  size_t fmt_len = 0;
  payload = nullptr;
  payload_len = 0;
  while (pos + 8 <= d.size()) {
    const uint8_t* cid = d.data() + pos;
    size_t size = rd32(d.data() + pos + 4);
    size_t body_avail = d.size() - (pos + 8);
    size_t body_len = size < body_avail ? size : body_avail;  // tolerate truncated tail
    if (std::memcmp(cid, "fmt ", 4) == 0) {
      fmt = d.data() + pos + 8;
      fmt_len = body_len;
    } else if (std::memcmp(cid, "data", 4) == 0) {
      payload = d.data() + pos + 8;
      payload_len = body_len;
    }
    pos += 8 + size + (size & 1);
  }
  if (!fmt || fmt_len < 16 || !payload) {
    err.msg = std::string("missing fmt/data chunk in ") + path;
    return false;
  }
  tag = rd16(fmt);
  ch = rd16(fmt + 2);
  sr = rd32(fmt + 4);
  bits = rd16(fmt + 14);
  if (tag == 0xFFFE && fmt_len >= 26) tag = rd16(fmt + 24);
  return true;
}

// Decode payload to mono float32 (wav_io.read_wav parity).
bool decode(const uint8_t* raw, size_t raw_len, uint16_t tag, uint16_t ch,
            uint16_t bits, const char* path, std::vector<float>& mono, Error& err) {
  if (ch == 0) {
    err.msg = std::string("zero channels in ") + path;
    return false;
  }
  std::vector<float> x;
  if (tag == 3) {  // IEEE float
    if (bits == 32) {
      size_t n = raw_len / 4;
      x.resize(n);
      std::memcpy(x.data(), raw, n * 4);
    } else if (bits == 64) {
      size_t n = raw_len / 8;
      x.resize(n);
      for (size_t i = 0; i < n; ++i) {
        double v;
        std::memcpy(&v, raw + 8 * i, 8);
        x[i] = static_cast<float>(v);
      }
    } else {
      err.msg = "unsupported float bit depth " + std::to_string(bits) + " in " + path;
      return false;
    }
  } else if (tag == 1) {  // integer PCM
    if (bits == 16) {
      size_t n = raw_len / 2;
      x.resize(n);
      for (size_t i = 0; i < n; ++i) {
        int16_t v;
        std::memcpy(&v, raw + 2 * i, 2);
        x[i] = static_cast<float>(v) / 32768.0f;
      }
    } else if (bits == 32) {
      size_t n = raw_len / 4;
      x.resize(n);
      for (size_t i = 0; i < n; ++i) {
        int32_t v;
        std::memcpy(&v, raw + 4 * i, 4);
        x[i] = static_cast<float>(static_cast<double>(v) / 2147483648.0);
      }
    } else if (bits == 8) {
      x.resize(raw_len);
      for (size_t i = 0; i < raw_len; ++i)
        x[i] = (static_cast<float>(raw[i]) - 128.0f) / 128.0f;
    } else {
      err.msg = "unsupported PCM bit depth " + std::to_string(bits) + " in " + path;
      return false;
    }
  } else {
    err.msg = "unsupported WAV format tag " + std::to_string(tag) + " in " + path;
    return false;
  }
  size_t frames = x.size() / ch;
  if (ch == 1) {
    x.resize(frames);
    mono = std::move(x);
  } else {
    mono.resize(frames);
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.0f;  // numpy f32 mean parity (sequential f32 accumulate)
      for (uint16_t c = 0; c < ch; ++c) acc += x[i * ch + c];
      mono[i] = acc / static_cast<float>(ch);
    }
  }
  return true;
}

// numpy.interp over a linspace grid, double precision (read_wav parity).
void resample_linear(const std::vector<float>& x, uint32_t sr, int target_sr,
                     std::vector<float>& out) {
  size_t n = x.size();
  size_t m = static_cast<size_t>(
      std::llround(static_cast<double>(n) * target_sr / static_cast<double>(sr)));
  out.resize(m);
  if (n == 0) {
    std::fill(out.begin(), out.end(), 0.0f);
    return;
  }
  // numpy.linspace parity: one rounded step, multiplied (endpoint exact)
  double step = (m > 1) ? static_cast<double>(n - 1) / static_cast<double>(m - 1) : 0.0;
  for (size_t i = 0; i < m; ++i) {
    double t = (i + 1 == m && m > 1) ? static_cast<double>(n - 1)
                                     : step * static_cast<double>(i);
    size_t lo = static_cast<size_t>(t);
    if (lo >= n - 1) {
      out[i] = x[n - 1];
    } else {
      double frac = t - static_cast<double>(lo);
      out[i] = static_cast<float>(static_cast<double>(x[lo]) +
                                  frac * (static_cast<double>(x[lo + 1]) -
                                          static_cast<double>(x[lo])));
    }
  }
}

bool load_one(const char* path, int sample_rate, int64_t target_len, float* out,
              int64_t* len_out, Error& err) {
  std::memset(out, 0, static_cast<size_t>(target_len) * sizeof(float));
  std::vector<float> mono;
  if (path == nullptr || path[0] == '\0') {
    // LoadAudio silence path: one second of zeros at the requested rate
    int64_t n = sample_rate > 0 ? sample_rate : target_len;
    *len_out = n;
    return true;  // buffer already zeroed
  }
  std::vector<uint8_t> buf;
  if (!read_file(path, buf, err)) return false;
  uint16_t tag, ch, bits;
  uint32_t sr;
  const uint8_t* payload;
  size_t payload_len;
  if (!parse_riff(buf, path, tag, ch, sr, bits, payload, payload_len, err)) return false;
  if (!decode(payload, payload_len, tag, ch, bits, path, mono, err)) return false;
  if (sample_rate > 0 && sr != static_cast<uint32_t>(sample_rate)) {
    std::vector<float> rs;
    resample_linear(mono, sr, sample_rate, rs);
    mono = std::move(rs);
  }
  *len_out = static_cast<int64_t>(mono.size());
  size_t ncopy = mono.size() < static_cast<size_t>(target_len)
                     ? mono.size()
                     : static_cast<size_t>(target_len);
  std::memcpy(out, mono.data(), ncopy * sizeof(float));
  return true;
}

}  // namespace

extern "C" {

// Decode a batch of wav files into out[(n, target_len)] float32
// (zero-padded / head-truncated, FixAudioLength parity) with a thread pool.
// lens[i] receives the decoded (post-resample, pre-fix) length. Returns the
// number of failed files; the first error message lands in errbuf.
int64_t dmad_load_wav_batch(const char* const* paths, int64_t n, int sample_rate,
                            int64_t target_len, int n_threads, float* out,
                            int64_t* lens, char* errbuf, int64_t errcap) {
  if (n <= 0) return 0;
  if (target_len <= 0) {
    if (errbuf && errcap > 0) std::snprintf(errbuf, errcap, "target_len must be > 0");
    return n;
  }
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int k = n_threads > 0 ? n_threads : hw;
  if (static_cast<int64_t>(k) > n) k = static_cast<int>(n);

  std::atomic<int64_t> next{0};
  std::atomic<int64_t> failures{0};
  std::vector<std::string> first_err(static_cast<size_t>(k));

  auto worker = [&](int wid) {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      Error err;
      if (!load_one(paths[i], sample_rate, target_len,
                    out + i * target_len, lens + i, err)) {
        failures.fetch_add(1);
        if (first_err[wid].empty()) first_err[wid] = err.msg;
        lens[i] = 0;
      }
    }
  };

  if (k == 1) {
    worker(0);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(k));
    for (int w = 0; w < k; ++w) pool.emplace_back(worker, w);
    for (auto& t : pool) t.join();
  }

  if (failures.load() > 0 && errbuf && errcap > 0) {
    for (auto& m : first_err) {
      if (!m.empty()) {
        std::snprintf(errbuf, static_cast<size_t>(errcap), "%s", m.c_str());
        break;
      }
    }
  }
  return failures.load();
}

// Single-file variant (LoadAudio parity without length fixing): caller
// provides capacity; returns decoded length or -1 on error/overflow.
int64_t dmad_load_wav(const char* path, int sample_rate, float* out,
                      int64_t capacity, char* errbuf, int64_t errcap) {
  Error err;
  std::vector<float> mono;
  std::vector<uint8_t> buf;
  uint16_t tag, ch, bits;
  uint32_t sr;
  const uint8_t* payload;
  size_t payload_len;
  if (!read_file(path, buf, err) ||
      !parse_riff(buf, path, tag, ch, sr, bits, payload, payload_len, err) ||
      !decode(payload, payload_len, tag, ch, bits, path, mono, err)) {
    if (errbuf && errcap > 0) std::snprintf(errbuf, errcap, "%s", err.msg.c_str());
    return -1;
  }
  if (sample_rate > 0 && sr != static_cast<uint32_t>(sample_rate)) {
    std::vector<float> rs;
    resample_linear(mono, sr, sample_rate, rs);
    mono = std::move(rs);
  }
  if (static_cast<int64_t>(mono.size()) > capacity) {
    if (errbuf && errcap > 0)
      std::snprintf(errbuf, static_cast<size_t>(errcap),
                    "buffer too small: need %lld", (long long)mono.size());
    return -1;
  }
  std::memcpy(out, mono.data(), mono.size() * sizeof(float));
  return static_cast<int64_t>(mono.size());
}

}  // extern "C"
