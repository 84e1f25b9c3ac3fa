// Independent implementation of the ITU-T P.862 (PESQ) perceptual model —
// wideband P.862.2 mode primary, narrow-band P.862.1 mapping secondary.
//
// Counterpart of the reference's `pesq` wheel usage (reference
// src/metric.py:3,147-175), which compiles the ITU P.862 C release. That
// source is not distributable into this repo, so this file is a from-spec
// re-implementation of the published algorithm (ITU-T Rec. P.862 02/2001,
// P.862.2 11/2007):
//   level alignment to the nominal active-speech power, the wideband input
//   high-pass, envelope-correlation time alignment, Hann|FFT|^2 frames,
//   Bark-band grouping, partial frequency-response compensation, short-term
//   gain compensation, Zwicker-law loudness, center-clipped (deadzone)
//   disturbance, asymmetry factor ((P_deg+50)/(P_ref+50))^1.2 in [3..12],
//   weighted L3/L1 band norms, L6-over-split-second / L2-over-time
//   aggregation, and the logistic MOS-LQO maps.
// Deviations from the ITU release (documented in PARITY.md): Bark bands are
// computed analytically (uniform in Bark via the Zwicker/Terhardt formulas)
// instead of the ITU lookup tables — the Rec's numeric band tables are not
// reproducible in this offline image without risking corrupted constants —
// and the threshold-in-quiet uses Terhardt's analytic approximation. Time
// alignment is the Rec's full three-stage structure: crude whole-file
// envelope alignment, per-utterance split + realign with piecewise-constant
// delays (find_utterances/realign_utterances below), and the bad-interval
// re-split — frames whose disturbance stays pathological after alignment
// get their span re-delayed and re-scored, keeping the per-frame minimum
// (the re-split block in pesq_mos). Scores are P.862-class, not
// certified-conformant; when the conformant `pesq` wheel is installed it
// takes precedence (train/metrics.py).

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kTargetPower = 1e7;   // nominal active-speech power
constexpr double kSl = 1.866055e-1;    // Zwicker loudness scale (P.862 §10.2.5)
constexpr double kZwicker = 0.23;      // Zwicker power-law exponent

// ---------------------------------------------------------------------------
// radix-2 iterative complex FFT (n = power of two)
// ---------------------------------------------------------------------------
void fft(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  for (size_t i = 1, j = 0; i < n; ++i) {  // bit-reverse permutation
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / (double)len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double tr = re[b] * cr - im[b] * ci;
        const double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr; im[b] = im[a] - ti;
        re[a] += tr;        im[a] += ti;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr; cr = ncr;
      }
    }
  }
}

double bark_of_hz(double f) {
  return 13.0 * std::atan(0.00076 * f) +
         3.5 * std::atan((f / 7500.0) * (f / 7500.0));
}

// P.862 §10.2.4 bad-interval re-split constants: a frame is "bad" when its
// symmetric frame disturbance exceeds kBadFrameThresh; runs of at least
// kMinBadRun consecutive bad frames form a bad interval whose span is
// re-aligned (new delay search) and re-scored, keeping the per-frame
// minimum of original vs re-aligned disturbance.
constexpr double kBadFrameThresh = 30.0;
constexpr int kMinBadRun = 5;

// Terhardt's analytic threshold in quiet, dB SPL
double thresh_quiet_db(double f_hz) {
  double khz = std::max(f_hz, 20.0) / 1000.0;
  return 3.64 * std::pow(khz, -0.8) -
         6.5 * std::exp(-0.6 * (khz - 3.3) * (khz - 3.3)) +
         1e-3 * std::pow(khz, 4.0);
}

struct Bands {
  int nb = 0;
  std::vector<int> lo, hi;          // FFT power-bin ranges [lo, hi)
  std::vector<double> width;        // Bark widths (~0.42 bark each)
  std::vector<double> absthr;       // threshold in quiet, internal power
  double wtot = 0.0;                // total Bark width
};

// Uniform-in-Bark band layout over [50 Hz, fs/2], nb bands; each FFT bin
// joins the band containing its center frequency.
Bands make_bands(int fs, int nfft, int nb) {
  Bands b;
  b.nb = nb;
  const double z0 = bark_of_hz(50.0);
  const double z1 = bark_of_hz(fs / 2.0);
  const double dz = (z1 - z0) / nb;
  const double df = (double)fs / nfft;
  b.lo.assign(nb, -1); b.hi.assign(nb, -1);
  b.width.assign(nb, dz); b.absthr.assign(nb, 0.0);
  for (int k = 1; k <= nfft / 2; ++k) {
    const double z = bark_of_hz(k * df);
    int idx = (int)((z - z0) / dz);
    if (idx < 0 || idx >= nb) continue;
    if (b.lo[idx] < 0) b.lo[idx] = k;
    b.hi[idx] = k + 1;
  }
  // fill empty low bands by borrowing the neighbour's bin so every band is
  // non-degenerate, and set thresholds at the band-center frequency.
  // Internal calibration: total active power 1e7 <-> 79 dB SPL, so
  // internal = 10^((Tq_dB + 37)/10) (matches the ITU table's order of
  // magnitude at both spectrum ends).
  int last_lo = 1, last_hi = 2;
  double wsum = 0.0;
  for (int i = 0; i < nb; ++i) {
    if (b.lo[i] < 0) { b.lo[i] = last_lo; b.hi[i] = last_hi; }
    last_lo = b.lo[i]; last_hi = b.hi[i];
    const double fc_bark = z0 + (i + 0.5) * dz;
    // invert bark(f) by bisection for the band-center frequency
    double flo = 0.0, fhi2 = fs / 2.0;
    for (int it = 0; it < 50; ++it) {
      const double mid = 0.5 * (flo + fhi2);
      if (bark_of_hz(mid) < fc_bark) flo = mid; else fhi2 = mid;
    }
    b.absthr[i] = std::pow(10.0, (thresh_quiet_db(0.5 * (flo + fhi2)) + 37.0) / 10.0);
    wsum += b.width[i];
  }
  b.wtot = wsum;
  return b;
}

// 2nd-order Butterworth high-pass (bilinear transform), forward IIR —
// the P.862.2 wideband input filter role (100 Hz cutoff).
void highpass(std::vector<double>& x, double fc, int fs) {
  const double w = std::tan(M_PI * fc / fs);
  const double k = 1.0 / (1.0 + std::sqrt(2.0) * w + w * w);
  const double b0 = k, b1 = -2.0 * k, b2 = k;
  const double a1 = 2.0 * (w * w - 1.0) * k;
  const double a2 = (1.0 - std::sqrt(2.0) * w + w * w) * k;
  double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
  for (double& v : x) {
    const double y = b0 * v + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2;
    x2 = x1; x1 = v; y2 = y1; y1 = y; v = y;
  }
}

// framed power spectra: hop = nfft/2, Hann window, power normalized by the
// window's mean-square so frame power tracks signal power
void power_frames(const std::vector<double>& x, int nfft,
                  std::vector<std::vector<double>>& out) {
  const int hop = nfft / 2;
  const int n_frames = (int)((x.size() >= (size_t)nfft)
                                 ? (x.size() - nfft) / hop + 1 : 0);
  std::vector<double> win(nfft);
  double wss = 0.0;
  for (int i = 0; i < nfft; ++i) {
    win[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / nfft);
    wss += win[i] * win[i];
  }
  wss /= nfft;
  out.assign(n_frames, std::vector<double>(nfft / 2 + 1, 0.0));
  std::vector<double> re(nfft), im(nfft);
  for (int f = 0; f < n_frames; ++f) {
    for (int i = 0; i < nfft; ++i) {
      re[i] = x[(size_t)f * hop + i] * win[i];
      im[i] = 0.0;
    }
    fft(re, im);
    for (int k = 0; k <= nfft / 2; ++k)
      out[f][k] = (re[k] * re[k] + im[k] * im[k]) / ((double)nfft * wss);
  }
}

double band_power(const std::vector<double>& spec, const Bands& b, int i) {
  double s = 0.0;
  for (int k = b.lo[i]; k < b.hi[i]; ++k) s += spec[k];
  return s;
}

// total power of bands whose power exceeds factor * threshold-in-quiet
double total_audible(const std::vector<double>& pitch, const Bands& b,
                     double factor) {
  double s = 0.0;
  for (int i = 0; i < b.nb; ++i)
    if (pitch[i] > factor * b.absthr[i]) s += pitch[i];
  return s;
}

// scale the signal so its 350-3250 Hz framed power averages the nominal
// active-speech power (P.862 fix_power_level role)
void fix_level(std::vector<double>& x, int fs, int nfft) {
  std::vector<std::vector<double>> frames;
  power_frames(x, nfft, frames);
  if (frames.empty()) return;
  const double df = (double)fs / nfft;
  const int klo = std::max(1, (int)(350.0 / df));
  const int khi = std::min(nfft / 2, (int)(3250.0 / df));
  double acc = 0.0;
  for (const auto& sp : frames)
    for (int k = klo; k <= khi; ++k) acc += sp[k];
  acc /= frames.size();
  if (acc < 1e-20) return;
  const double g = std::sqrt(kTargetPower / acc);
  for (double& v : x) v *= g;
}

// global integer delay via cross-correlation of 4 ms log-energy envelopes
long envelope_delay(const std::vector<double>& ref,
                    const std::vector<double>& deg, int fs) {
  const int sub = fs / 250;  // 4 ms
  const size_t n = std::min(ref.size(), deg.size()) / sub;
  if (n < 8) return 0;
  std::vector<double> er(n), ed(n);
  for (size_t i = 0; i < n; ++i) {
    double sr = 0, sd = 0;
    for (int j = 0; j < sub; ++j) {
      sr += ref[i * sub + j] * ref[i * sub + j];
      sd += deg[i * sub + j] * deg[i * sub + j];
    }
    er[i] = std::log10(sr + 1e-6);
    ed[i] = std::log10(sd + 1e-6);
  }
  const long max_lag = std::min<long>((long)n / 2, fs / 2 / sub);  // <= 0.5 s
  double best = -1e300;
  long best_lag = 0;
  for (long lag = -max_lag; lag <= max_lag; ++lag) {
    double acc = 0.0;
    for (size_t i = 0; i < n; ++i) {
      const long j = (long)i + lag;
      if (j < 0 || j >= (long)n) continue;
      acc += er[i] * ed[j];
    }
    if (acc > best) { best = acc; best_lag = lag; }
  }
  return best_lag * sub;  // samples by which deg lags ref
}

// -------------------------------------------------------------------------
// Per-utterance split + realign (P.862 §10.2.2-10.2.3 structure): after the
// crude whole-file alignment, active-speech utterances in the reference are
// located from the 4 ms energy envelope (gaps < 200 ms merged, runs
// >= 300 ms kept), each gets its own residual delay — envelope correlation
// within the utterance, refined to sample accuracy by bounded time-domain
// cross-correlation — and the degraded signal is rebuilt with that
// piecewise-constant delay. This handles the Rec's variable-delay model;
// spans it still mis-aligns are caught by the bad-interval re-split stage
// in pesq_mos (frames with pathological disturbance re-delayed+re-scored).
// -------------------------------------------------------------------------
struct Utterance { size_t begin, end; };  // sample span in the reference

std::vector<Utterance> find_utterances(const std::vector<double>& ref,
                                       int fs) {
  const int sub = fs / 250;  // 4 ms
  const size_t n = ref.size() / sub;
  std::vector<char> active(n, 0);
  // fix_level() normalized active-speech power to kTargetPower; a sub-frame
  // is speech-active when its mean power clears -30 dB of that nominal
  const double thr = kTargetPower / 1000.0;
  for (size_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int j = 0; j < sub; ++j) acc += ref[i * sub + j] * ref[i * sub + j];
    active[i] = (acc / sub) > thr;
  }
  const size_t merge_gap = (size_t)(0.200 * 250);  // 200 ms in sub-frames
  const size_t min_len = (size_t)(0.300 * 250);    // 300 ms
  std::vector<Utterance> utts;
  size_t i = 0;
  while (i < n) {
    if (!active[i]) { ++i; continue; }
    size_t begin = i, end = i + 1, gap = 0;
    for (size_t j = i + 1; j < n; ++j) {
      if (active[j]) { end = j + 1; gap = 0; }
      else if (++gap > merge_gap) break;
    }
    if (end - begin >= min_len)
      utts.push_back({begin * (size_t)sub, end * (size_t)sub});
    i = end + 1;
  }
  return utts;
}

// residual delay of one utterance: envelope correlation over the utterance
// span (lags up to +-125 ms) refined by time-domain cross-correlation in a
// +-1.5 sub-frame window around the envelope estimate
long utterance_delay(const std::vector<double>& ref,
                     const std::vector<double>& deg,
                     const Utterance& u, int fs) {
  const int sub = fs / 250;
  const size_t s0 = u.begin / sub, s1 = u.end / sub;
  const size_t nsub = deg.size() / sub;
  if (s1 <= s0 + 4 || nsub == 0) return 0;
  std::vector<double> er, ed(nsub);
  for (size_t i = s0; i < s1; ++i) {
    double acc = 0.0;
    for (int j = 0; j < sub; ++j) acc += ref[i * sub + j] * ref[i * sub + j];
    er.push_back(std::log10(acc + 1e-6));
  }
  for (size_t i = 0; i < nsub; ++i) {
    double acc = 0.0;
    for (int j = 0; j < sub; ++j) acc += deg[i * sub + j] * deg[i * sub + j];
    ed[i] = std::log10(acc + 1e-6);
  }
  const long max_lag = (long)(0.125 * 250);  // 125 ms
  double best = -1e300;
  long best_lag = 0;
  for (long lag = -max_lag; lag <= max_lag; ++lag) {
    double acc = 0.0;
    int cnt = 0;
    for (size_t i = 0; i < er.size(); ++i) {
      const long j = (long)(s0 + i) + lag;
      if (j < 0 || j >= (long)nsub) continue;
      acc += er[i] * ed[j];
      ++cnt;
    }
    if (cnt > (long)er.size() / 2 && acc > best) { best = acc; best_lag = lag; }
  }
  // sample-accurate refinement around the envelope estimate
  const long center = best_lag * sub;
  const long fine = sub + sub / 2;
  double best_xc = -1e300;
  long best_d = center;
  for (long d = center - fine; d <= center + fine; ++d) {
    double acc = 0.0;
    for (size_t t = u.begin; t < u.end; ++t) {
      const long j = (long)t + d;
      if (j < 0 || j >= (long)deg.size()) continue;
      acc += ref[t] * deg[j];
    }
    if (acc > best_xc) { best_xc = acc; best_d = d; }
  }
  return best_d;
}

// rebuild deg with each utterance's own delay (piecewise-constant delay)
void realign_utterances(const std::vector<double>& ref,
                        const std::vector<double>& deg,
                        std::vector<double>* out, int fs) {
  *out = deg;
  out->resize(ref.size(), 0.0);
  for (const Utterance& u : find_utterances(ref, fs)) {
    const long d = utterance_delay(ref, deg, u, fs);
    if (d == 0) continue;
    for (size_t t = u.begin; t < u.end && t < out->size(); ++t) {
      const long j = (long)t + d;
      (*out)[t] = (j >= 0 && j < (long)deg.size()) ? deg[j] : 0.0;
    }
  }
}

double zwicker_loudness(double p, double thr) {
  if (p <= thr) return 0.0;
  return kSl * std::pow(thr / 0.5, kZwicker) *
         (std::pow(0.5 + 0.5 * p / thr, kZwicker) - 1.0);
}

double lp_norm(const std::vector<double>& v, double p) {
  double acc = 0.0;
  for (double x : v) acc += std::pow(std::fabs(x), p);
  return v.empty() ? 0.0 : std::pow(acc / v.size(), 1.0 / p);
}

}  // namespace

extern "C" {

// MOS-LQO for (ref, deg) at sampling rate fs (8000 or 16000). wb != 0
// selects the P.862.2 wideband input filter + mapping; wb == 0 the
// narrow-band P.862.1 mapping. Returns a value in [~1, 4.64], or < 0 on
// error (-1 bad args, -2 too short).
double pesq_mos(const float* ref_in, const float* deg_in, long n, int fs,
                int wb) {
  if (!ref_in || !deg_in || n <= 0 || (fs != 8000 && fs != 16000)) return -1.0;
  const int nfft = (fs == 16000) ? 512 : 256;  // 32 ms frames
  const int nb = (fs == 16000) ? 49 : 42;      // ITU band counts
  if (n < 2 * nfft) return -2.0;

  std::vector<double> ref(ref_in, ref_in + n), deg(deg_in, deg_in + n);

  fix_level(ref, fs, nfft);
  fix_level(deg, fs, nfft);
  if (wb) {  // P.862.2 wideband input high-pass
    highpass(ref, 100.0, fs);
    highpass(deg, 100.0, fs);
  } else {   // IRS-receive stand-in: band-limit to telephone band
    highpass(ref, 300.0, fs);
    highpass(deg, 300.0, fs);
  }

  // crude whole-file alignment (envelope-correlation delay) ...
  const long delay = envelope_delay(ref, deg, fs);
  if (delay > 0) deg.erase(deg.begin(), deg.begin() + delay);
  else if (delay < 0) ref.erase(ref.begin(), ref.begin() - delay);
  const size_t nn = std::min(ref.size(), deg.size());
  ref.resize(nn); deg.resize(nn);
  if ((long)nn < 2 * nfft) return -2.0;
  // ... then per-utterance split + realign (piecewise-constant delay)
  {
    std::vector<double> aligned;
    realign_utterances(ref, deg, &aligned, fs);
    deg.swap(aligned);
  }

  const Bands bands = make_bands(fs, nfft, nb);
  std::vector<std::vector<double>> sref, sdeg;
  power_frames(ref, nfft, sref);
  power_frames(deg, nfft, sdeg);
  const int nf = (int)std::min(sref.size(), sdeg.size());

  // Bark pitch powers per frame
  std::vector<std::vector<double>> pref(nf, std::vector<double>(nb)),
      pdeg(nf, std::vector<double>(nb));
  std::vector<double> tot_ref(nf), tot_deg(nf);
  for (int f = 0; f < nf; ++f) {
    for (int i = 0; i < nb; ++i) {
      pref[f][i] = band_power(sref[f], bands, i);
      pdeg[f][i] = band_power(sdeg[f], bands, i);
    }
    tot_ref[f] = total_audible(pref[f], bands, 1.0);
    tot_deg[f] = total_audible(pdeg[f], bands, 1.0);
  }

  // partial frequency-response compensation of the reference: per band,
  // the active-frame mean deg/ref ratio bounded to [1/100, 100]
  std::vector<double> mean_ref(nb, 0.0), mean_deg(nb, 0.0);
  int n_active = 0;
  for (int f = 0; f < nf; ++f) {
    if (tot_ref[f] < kTargetPower * 1e-3) continue;  // speech-active only
    ++n_active;
    for (int i = 0; i < nb; ++i) {
      mean_ref[i] += pref[f][i];
      mean_deg[i] += pdeg[f][i];
    }
  }
  if (n_active > 0) {
    for (int i = 0; i < nb; ++i) {
      const double ratio = (mean_deg[i] + 1000.0) / (mean_ref[i] + 1000.0);
      const double r = std::min(100.0, std::max(0.01, ratio));
      for (int f = 0; f < nf; ++f) pref[f][i] *= r;
    }
    for (int f = 0; f < nf; ++f) tot_ref[f] = total_audible(pref[f], bands, 1.0);
  }

  // per-frame disturbance from (compensated) reference and degraded Bark
  // rows under a given short-term gain (P.862 §10.2.5-10.3.4)
  auto disturbance_of = [&](const std::vector<double>& pr_row,
                            const std::vector<double>& pd_row, double gain,
                            double tref, double* dsym_out,
                            double* dasym_out) {
    double s3 = 0.0, s1 = 0.0;
    for (int i = 0; i < nb; ++i) {
      const double pr = pr_row[i];
      const double pd = pd_row[i] * gain;
      const double lr = zwicker_loudness(pr, bands.absthr[i]);
      const double ld = zwicker_loudness(pd, bands.absthr[i]);
      double diff = ld - lr;
      const double dead = 0.25 * std::min(ld, lr);  // masking deadzone
      if (diff > dead) diff -= dead;
      else if (diff < -dead) diff += dead;
      else diff = 0.0;
      double asym = std::pow((pd + 50.0) / (pr + 50.0), 1.2);
      if (asym < 3.0) asym = 0.0;
      asym = std::min(asym, 12.0);
      // band aggregation (P.862 §10.3.4): pseudo-Lp with Bark-width
      // weights, D = Wtot * (Σ (w_b*|d_b|)^p / Wtot)^(1/p); L3 symmetric,
      // L1 asymmetric (weight factors cancel at p = 1)
      s3 += std::pow(bands.width[i] * std::fabs(diff), 3.0);
      s1 += bands.width[i] * std::fabs(diff) * asym;
    }
    double dsym = bands.wtot * std::pow(s3 / bands.wtot, 1.0 / 3.0);
    double dasym = s1;
    // emphasis of disturbances in quiet reference frames
    const double h = std::pow((tref + 1e5) / 1e7, 0.04);
    *dsym_out = std::min(dsym / h, 45.0);
    *dasym_out = std::min(dasym / h, 45.0);
  };

  // short-term gain compensation of the degraded signal + disturbances;
  // the smoothed gain is kept per frame so the bad-interval re-score below
  // re-uses the first pass's gain track (re-alignment changes the frames'
  // spectra, not the long-term gain condition)
  std::vector<double> d_frame(nf), da_frame(nf), gain_frame(nf);
  double gain = 1.0;
  for (int f = 0; f < nf; ++f) {
    const double cond = (tot_ref[f] + 5e3) / (tot_deg[f] + 5e3);
    gain = (f == 0) ? cond : 0.2 * gain + 0.8 * cond;
    gain = std::min(5.0, std::max(3e-4, gain));
    gain_frame[f] = gain;
    disturbance_of(pref[f], pdeg[f], gain, tot_ref[f], &d_frame[f],
                   &da_frame[f]);
  }

  // -----------------------------------------------------------------------
  // Bad-interval re-split (P.862 §10.2.4): runs of >= kMinBadRun frames
  // with symmetric disturbance > kBadFrameThresh mark a span where the
  // crude+utterance alignment likely failed. Each bad interval gets an
  // independent delay search (4 ms envelope correlation over the span,
  // refined by bounded time-domain cross-correlation), its frames are
  // re-scored against the re-delayed degraded signal, and each frame keeps
  // the minimum of original vs re-aligned disturbance — the Rec's rule, so
  // a spurious re-alignment can never worsen the score.
  // -----------------------------------------------------------------------
  const int hop = nfft / 2;
  std::vector<double> win_fn(nfft);
  double wss = 0.0;
  for (int i = 0; i < nfft; ++i) {
    win_fn[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / nfft);
    wss += win_fn[i] * win_fn[i];
  }
  wss /= nfft;
  // PESQ_NATIVE_NO_RESPLIT=1 disables the stage (A/B tooling + tests
  // asserting the re-split only ever helps)
  int f0 = getenv("PESQ_NATIVE_NO_RESPLIT") ? nf : 0;
  while (f0 < nf) {
    if (d_frame[f0] <= kBadFrameThresh) { ++f0; continue; }
    int f1 = f0;
    while (f1 < nf && d_frame[f1] > kBadFrameThresh) ++f1;
    if (f1 - f0 >= kMinBadRun) {
      const size_t s_begin = (size_t)f0 * hop;
      const size_t s_end = std::min(ref.size(), (size_t)(f1 - 1) * hop + nfft);
      // delay search for this interval against the (aligned) degraded
      // signal: reuse the utterance machinery on the interval span
      const Utterance span{s_begin, s_end};
      const long d = utterance_delay(ref, deg, span, fs);
      if (d != 0) {
        std::vector<double> re(nfft), im(nfft), spec(nfft / 2 + 1);
        std::vector<double> pd_row(nb);
        for (int f = f0; f < f1; ++f) {
          // re-framed degraded power spectrum at the new delay
          for (int i = 0; i < nfft; ++i) {
            const long t = (long)f * hop + i + d;
            re[i] = (t >= 0 && t < (long)deg.size()) ? deg[t] * win_fn[i] : 0.0;
            im[i] = 0.0;
          }
          fft(re, im);
          for (int k = 0; k <= nfft / 2; ++k)
            spec[k] = (re[k] * re[k] + im[k] * im[k]) / ((double)nfft * wss);
          for (int i = 0; i < nb; ++i) pd_row[i] = band_power(spec, bands, i);
          double dsym, dasym;
          disturbance_of(pref[f], pd_row, gain_frame[f], tot_ref[f], &dsym,
                         &dasym);
          if (dsym < d_frame[f]) {  // keep the better alignment per frame
            d_frame[f] = dsym;
            da_frame[f] = dasym;
          }
        }
      }
    }
    f0 = f1;
  }

  // time aggregation: L6 over 20-frame split-second intervals (stride 10),
  // then L2 over intervals
  const int win = 20, stride = 10;
  std::vector<double> agg_sym, agg_asym;
  for (int start = 0; start < (int)d_frame.size(); start += stride) {
    const int end = std::min<int>(start + win, (int)d_frame.size());
    std::vector<double> cs(d_frame.begin() + start, d_frame.begin() + end);
    std::vector<double> ca(da_frame.begin() + start, da_frame.begin() + end);
    agg_sym.push_back(lp_norm(cs, 6.0));
    agg_asym.push_back(lp_norm(ca, 6.0));
    if (end == (int)d_frame.size()) break;
  }
  const double d_total = lp_norm(agg_sym, 2.0);
  const double da_total = lp_norm(agg_asym, 2.0);

  if (getenv("PESQ_NATIVE_DEBUG")) {
    fprintf(stderr, "pesq-dbg: d=%g da=%g frames=%zu active=%d\n",
            d_total, da_total, d_frame.size(), n_active);
  }
  const double raw = 4.5 - 0.1 * d_total - 0.0309 * da_total;
  if (wb)  // P.862.2 wideband mapping
    return 0.999 + 4.0 / (1.0 + std::exp(-1.3669 * raw + 3.8224));
  // P.862.1 narrow-band mapping
  return 0.999 + 4.0 / (1.0 + std::exp(-1.4945 * raw + 4.6607));
}

int pesq_native_version() { return 1; }

}  // extern "C"
