// Native host data path: WAV decode + polyphase resample + normalization.
//
// The reference's data layer leans on libsndfile (soundfile) and julius for
// per-item decode/resample (reference: src/dataset.py:100-122). This library
// is the framework's native equivalent: a dependency-free RIFF/WAVE decoder
// (PCM 8/16/24/32 and IEEE float32) plus a windowed-sinc polyphase
// resampler, exposed over a C ABI for ctypes
// (speech_enhancement_tpu/data/native.py). Everything returns float32
// channel-first [C, T] buffers ready for the segment loader.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavInfo {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = -1;    // byte offset of data payload
  long data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  // Walk chunks until both fmt and data are found.
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    long payload = ftell(f);
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t format, channels, block_align, bits;
      uint32_t sample_rate, byte_rate;
      if (fread(&format, 2, 1, f) != 1) return false;
      if (fread(&channels, 2, 1, f) != 1) return false;
      if (fread(&sample_rate, 4, 1, f) != 1) return false;
      if (fread(&byte_rate, 4, 1, f) != 1) return false;
      if (fread(&block_align, 2, 1, f) != 1) return false;
      if (fread(&bits, 2, 1, f) != 1) return false;
      if (format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fseek(f, payload + 24, SEEK_SET);
        uint16_t sub;
        if (fread(&sub, 2, 1, f) == 1) format = sub;  // first GUID bytes
      }
      info->format = format;
      info->channels = channels;
      info->sample_rate = sample_rate;
      info->bits = bits;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = payload;
      info->data_bytes = size;
    }
    fseek(f, payload + size + (size & 1), SEEK_SET);
    if (info->data_offset >= 0 && info->format != 0) break;
  }
  // Reject malformed / unsupported headers up front: bits outside
  // {8,16,24,32} would make bytes_per_sample 0 (division by zero in
  // wav_read_f32) or decode as silent zeros; only PCM (1) and IEEE float
  // (3, 32-bit) format codes are decodable.
  if (info->bits != 8 && info->bits != 16 && info->bits != 24 &&
      info->bits != 32)
    return false;
  if (info->format != 1 && info->format != 3) return false;
  if (info->format == 3 && info->bits != 32) return false;
  return info->data_offset >= 0 && info->channels > 0 && info->bits > 0;
}

inline float decode_sample(const uint8_t* p, uint16_t bits, uint16_t format) {
  if (format == 3) {  // IEEE float
    float v;
    memcpy(&v, p, 4);
    return v;
  }
  switch (bits) {
    case 8:
      return (static_cast<int>(p[0]) - 128) / 128.0f;
    case 16: {
      int16_t v;
      memcpy(&v, p, 2);
      return v / 32768.0f;
    }
    case 24: {
      int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      return v / 8388608.0f;
    }
    case 32: {
      int32_t v;
      memcpy(&v, p, 4);
      return v / 2147483648.0f;
    }
    default:
      return 0.0f;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success; fills channels, sample_rate, frames.
int wav_info(const char* path, int* channels, int* sample_rate, long* frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *channels = info.channels;
  *sample_rate = info.sample_rate;
  *frames = info.data_bytes / (info.channels * (info.bits / 8));
  return 0;
}

// Decode into caller-allocated float32 buffer, channel-first [C, frames].
// Returns frames decoded, or <0 on error.
long wav_read_f32(const char* path, float* out, long max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  const int bytes_per_sample = info.bits / 8;
  const long frames_in_file = info.data_bytes / (info.channels * bytes_per_sample);
  const long frames = frames_in_file < max_frames ? frames_in_file : max_frames;

  fseek(f, info.data_offset, SEEK_SET);
  std::vector<uint8_t> raw(static_cast<size_t>(frames) * info.channels * bytes_per_sample);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  const long got_frames = static_cast<long>(got) / (info.channels * bytes_per_sample);

  // interleaved -> channel-first
  for (long t = 0; t < got_frames; ++t) {
    const uint8_t* frame = raw.data() + static_cast<size_t>(t) * info.channels * bytes_per_sample;
    for (int c = 0; c < info.channels; ++c) {
      out[static_cast<size_t>(c) * frames + t] =
          decode_sample(frame + c * bytes_per_sample, info.bits, info.format);
    }
  }
  return got_frames;
}

// Windowed-sinc polyphase resampler, channel-first in/out.
// out must hold ceil(in_frames * up / down) samples per channel.
// Matches the framework's device resampler (ops/resample.py): Hann-windowed
// sinc with `zeros` crossings and the given rolloff.
long resample_f32(const float* in, long in_frames, int channels,
                  float* out, int up, int down, int zeros, float rolloff) {
  if (up == down) {
    memcpy(out, in, sizeof(float) * static_cast<size_t>(in_frames) * channels);
    return in_frames;
  }
  const double fc = 0.5 * rolloff * (up < down ? static_cast<double>(up) / down : 1.0);
  const int half_width = static_cast<int>(std::ceil(zeros / (2.0 * fc)));
  const long out_frames = (static_cast<long>(in_frames) * up + down - 1) / down;

  // Precompute the phase bank: kernel[p][k], k in [-half_width, half_width].
  const int taps = 2 * half_width + 1;
  std::vector<float> bank(static_cast<size_t>(up) * taps);
  for (int p = 0; p < up; ++p) {
    const double offset = static_cast<double>(p) * down / up;
    for (int k = 0; k < taps; ++k) {
      const double t = offset - (k - half_width);
      double w = std::cos(kPi * t * fc / zeros / 2.0);
      w *= w;
      if (std::abs(t) > half_width + 1e-9) w = 0.0;
      const double x = 2.0 * fc * t;
      const double s = (x == 0.0) ? 1.0 : std::sin(kPi * x) / (kPi * x);
      bank[static_cast<size_t>(p) * taps + k] = static_cast<float>(2.0 * fc * s * w);
    }
  }

  for (int c = 0; c < channels; ++c) {
    const float* src = in + static_cast<size_t>(c) * in_frames;
    float* dst = out + static_cast<size_t>(c) * out_frames;
    for (long n = 0; n < out_frames; ++n) {
      const long q = n / up;
      const int p = static_cast<int>(n % up);
      const float* kern = bank.data() + static_cast<size_t>(p) * taps;
      double acc = 0.0;
      const long center = q * down;
      for (int k = 0; k < taps; ++k) {
        const long j = center + (k - half_width);
        if (j >= 0 && j < in_frames) acc += static_cast<double>(src[j]) * kern[k];
      }
      dst[n] = static_cast<float>(acc);
    }
  }
  return out_frames;
}

// Per-channel z-score normalization in place; writes mean/std per channel.
void normalize_zscore_f32(float* data, int channels, long frames,
                          float* means, float* stds) {
  for (int c = 0; c < channels; ++c) {
    float* x = data + static_cast<size_t>(c) * frames;
    double sum = 0.0;
    for (long t = 0; t < frames; ++t) sum += x[t];
    const double mean = sum / frames;
    double var = 0.0;
    for (long t = 0; t < frames; ++t) {
      const double d = x[t] - mean;
      var += d * d;
    }
    // sample std (ddof=1) to match the host numpy path (data/dataset.py)
    const double std = std::sqrt(var / (frames > 1 ? frames - 1 : 1));
    const float denom = static_cast<float>(std) + 1e-6f;
    for (long t = 0; t < frames; ++t) x[t] = (x[t] - static_cast<float>(mean)) / denom;
    means[c] = static_cast<float>(mean);
    stds[c] = static_cast<float>(std);
  }
}

}  // extern "C"
