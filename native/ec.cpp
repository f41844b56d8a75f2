// Native range coder core — the serialization hot loop.
//
// Implements the same multisymbol range coder as
// daala_tpu/entropy/coder.py (16-bit range, 32-bit window, Q15 CDFs,
// reduced-overhead partition; behavioral spec entenc.c/entdec.c) as a
// small C++ library loaded through ctypes.  The Python implementation
// remains the oracle; tests assert bit-exact equality on random
// traces.  This is the host-side native runtime component that packs
// the device-generated symbol streams at speed-of-light while the TPU
// computes the next frame.
//
// Build: make -C native   (produces libdtpu_ec.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <array>
#include <vector>
#include <cmath>
#include <algorithm>

namespace {

struct Encoder {
  std::vector<uint16_t> precarry;
  std::vector<uint8_t> end_flushed;
  uint32_t low = 0;
  uint32_t rng = 0x8000;
  int cnt = -9;
  uint64_t end_window = 0;
  int nend_bits = 0;
};

struct Decoder {
  const uint8_t* buf;
  size_t size;
  size_t bpos = 0;
  long epos = 0;
  uint32_t dif = 0;
  uint32_t rng = 0x8000;
  int cnt = -15;
  uint64_t end_window = 0;
  int nend_bits = 0;
  int error = 0;
};

inline int ilog(uint32_t x) {
  int r = 0;
  while (x) { r++; x >>= 1; }
  return r;
}

inline uint32_t part(uint32_t x, uint32_t d, uint32_t e) {
  uint32_t xe = x > e ? x - e : 0;
  uint32_t m1 = x < e ? x : e;
  uint32_t h = xe >> 1;
  uint32_t m2 = h < d ? h : d;
  return x + m1 + m2;
}

void enc_normalize(Encoder* enc, uint32_t low, uint32_t rng) {
  int c = enc->cnt;
  int d = 16 - ilog(rng);
  int s = c + d;
  if (s >= 0) {
    c += 16;
    uint32_t m = (1u << c) - 1;
    if (s >= 8) {
      enc->precarry.push_back((uint16_t)(low >> c));
      low &= m;
      c -= 8;
      m >>= 8;
    }
    enc->precarry.push_back((uint16_t)(low >> c));
    s = c + d - 24;
    low &= m;
  }
  enc->low = low << d;
  enc->rng = rng << d;
  enc->cnt = s;
}

void enc_symbol(Encoder* enc, uint32_t fl, uint32_t fh, uint32_t ft) {
  uint32_t l = enc->low;
  uint32_t r = enc->rng;
  int s = (r - ft >= ft) ? 1 : 0;
  ft <<= s;
  fl <<= s;
  fh <<= s;
  uint32_t d = r - ft;
  uint32_t e = 2 * d > ft ? 2 * d - ft : 0;
  uint32_t u = part(fl, d, e);
  uint32_t v = part(fh, d, e);
  enc_normalize(enc, l + u, v - u);
}

void enc_bits(Encoder* enc, uint32_t fl, int ftb) {
  uint64_t w = enc->end_window;
  int nb = enc->nend_bits;
  if (nb + ftb > 32) {
    while (nb >= 8) {
      enc->end_flushed.push_back((uint8_t)(w & 0xFF));
      w >>= 8;
      nb -= 8;
    }
  }
  enc->end_window = w | ((uint64_t)fl << nb);
  enc->nend_bits = nb + ftb;
}

void dec_refill(Decoder* dec) {
  int s = 32 - 9 - (dec->cnt + 15);
  while (s >= 0 && dec->bpos < dec->size) {
    dec->dif |= (uint32_t)dec->buf[dec->bpos] << s;
    dec->cnt += 8;
    dec->bpos++;
    s -= 8;
  }
  if (dec->bpos >= dec->size) dec->cnt = 0x4000;
}

void dec_normalize(Decoder* dec, uint32_t dif, uint32_t rng) {
  int d = 16 - ilog(rng);
  dec->cnt -= d;
  dec->dif = dif << d;
  dec->rng = rng << d;
  if (dec->cnt < 0) dec_refill(dec);
}

int dec_symbol(Decoder* dec, const uint16_t* cdf, int n, uint32_t ft,
               int sh) {
  uint32_t dif = dec->dif;
  uint32_t r = dec->rng;
  uint32_t fts = ft << sh;
  if (r - fts >= fts) {
    fts <<= 1;
    sh++;
  }
  uint32_t d = r - fts;
  uint32_t c = dif >> 16;
  int64_t q = c >> 1;
  if ((int64_t)c - (int64_t)d > q) q = (int64_t)c - (int64_t)d;
  uint32_t e = 2 * d > fts ? 2 * d - fts : 0;
  int64_t q2 = (2 * (int64_t)c + 1 - (int64_t)e) / 3;
  if (q2 > q) q = q2;
  uint32_t qq = (uint32_t)q >> sh;
  uint32_t fl = 0;
  int ret = 0;
  uint32_t fh = cdf[0];
  while (fh <= qq && ret + 1 < n) {
    fl = fh;
    ret++;
    fh = cdf[ret];
  }
  if (fh <= qq) dec->error = 1;
  fl <<= sh;
  fh <<= sh;
  uint32_t u = part(fl, d, e);
  uint32_t v = part(fh, d, e);
  dec_normalize(dec, dif - (u << 16), v - u);
  return ret;
}

}  // namespace

extern "C" {

void* dtpu_enc_create() { return new Encoder(); }
void dtpu_enc_destroy(void* h) { delete (Encoder*)h; }

void dtpu_enc_symbol(void* h, uint32_t fl, uint32_t fh, uint32_t ft) {
  enc_symbol((Encoder*)h, fl, fh, ft);
}

// Encode a batch of pre-scaled symbols: (fl, fh, ft) triples.
void dtpu_enc_symbols(void* h, const uint32_t* fl, const uint32_t* fh,
                      const uint32_t* ft, int n) {
  Encoder* enc = (Encoder*)h;
  for (int i = 0; i < n; i++) enc_symbol(enc, fl[i], fh[i], ft[i]);
}

void dtpu_enc_bits(void* h, uint32_t fl, int ftb) {
  enc_bits((Encoder*)h, fl, ftb);
}

int dtpu_enc_tell(void* h) {
  Encoder* enc = (Encoder*)h;
  return (int)((enc->precarry.size() + enc->end_flushed.size()) * 8)
      + enc->cnt + enc->nend_bits + 10;
}

// Returns required buffer size; call with out == nullptr to query.
int dtpu_enc_done(void* h, uint8_t* out, int cap) {
  Encoder* enc = (Encoder*)h;
  uint32_t l = enc->low;
  uint32_t r = enc->rng;
  int c = enc->cnt;
  int s = 9;
  uint32_t m = 0x7FFF;
  uint64_t e = ((uint64_t)l + m) & ~(uint64_t)m;
  while ((e | m) >= (uint64_t)l + r) {
    s++;
    m >>= 1;
    e = ((uint64_t)l + m) & ~(uint64_t)m;
  }
  s += c;
  std::vector<uint16_t> pre = enc->precarry;
  if (s > 0) {
    uint64_t n = (1u << (c + 16)) - 1;
    do {
      pre.push_back((uint16_t)((e >> (c + 16)) & 0xFFFF));
      e &= n;
      s -= 8;
      c -= 8;
      n >>= 8;
    } while (s > 0);
  }
  std::vector<uint8_t> endf = enc->end_flushed;
  uint64_t ew = enc->end_window;
  int nb = enc->nend_bits;
  s = -s;
  while (nb > s) {
    endf.push_back((uint8_t)(ew & 0xFF));
    ew >>= 8;
    nb -= 8;
  }
  int total = (int)(pre.size() + endf.size());
  if (!out) return total;
  if (cap < total) return -1;
  uint32_t carry = 0;
  for (int i = (int)pre.size() - 1; i >= 0; i--) {
    uint32_t v = pre[i] + carry;
    out[i] = (uint8_t)(v & 0xFF);
    carry = v >> 8;
  }
  if (nb > 0 && !pre.empty()) out[pre.size() - 1] |= (uint8_t)(ew & 0xFF);
  for (size_t i = 0; i < endf.size(); i++) {
    out[pre.size() + i] = endf[endf.size() - 1 - i];
  }
  return total;
}

void* dtpu_dec_create(const uint8_t* buf, int size) {
  Decoder* dec = new Decoder();
  dec->buf = buf;
  dec->size = (size_t)size;
  dec->epos = size;
  dec_refill(dec);
  return dec;
}
void dtpu_dec_destroy(void* h) { delete (Decoder*)h; }

int dtpu_dec_symbol(void* h, const uint16_t* cdf, int n, uint32_t ft,
                    int sh) {
  return dec_symbol((Decoder*)h, cdf, n, ft, sh);
}

// Same scan over an int32 CDF (numpy adaptation arrays are int32/64;
// skipping the per-call uint16 copy is most of the symbol cost).
int dtpu_dec_symbol32(void* h, const int32_t* cdf, int n, uint32_t ft,
                      int sh) {
  Decoder* dec = (Decoder*)h;
  uint32_t dif = dec->dif;
  uint32_t r = dec->rng;
  uint32_t fts = ft << sh;
  if (r - fts >= fts) {
    fts <<= 1;
    sh++;
  }
  uint32_t d = r - fts;
  uint32_t c = dif >> 16;
  int64_t q = c >> 1;
  if ((int64_t)c - (int64_t)d > q) q = (int64_t)c - (int64_t)d;
  uint32_t e = 2 * d > fts ? 2 * d - fts : 0;
  int64_t q2 = (2 * (int64_t)c + 1 - (int64_t)e) / 3;
  if (q2 > q) q = q2;
  uint32_t qq = (uint32_t)q >> sh;
  uint32_t fl = 0;
  int ret = 0;
  uint32_t fh = (uint32_t)cdf[0];
  while (fh <= qq && ret + 1 < n) {
    fl = fh;
    ret++;
    fh = (uint32_t)cdf[ret];
  }
  if (fh <= qq) dec->error = 1;
  fl <<= sh;
  fh <<= sh;
  uint32_t u = part(fl, d, e);
  uint32_t v = part(fh, d, e);
  dec_normalize(dec, dif - (u << 16), v - u);
  return ret;
}

int dtpu_dec_symbol64(void* h, const int64_t* cdf, int n, uint32_t ft,
                      int sh) {
  Decoder* dec = (Decoder*)h;
  uint32_t dif = dec->dif;
  uint32_t r = dec->rng;
  uint32_t fts = ft << sh;
  if (r - fts >= fts) {
    fts <<= 1;
    sh++;
  }
  uint32_t d = r - fts;
  uint32_t c = dif >> 16;
  int64_t q = c >> 1;
  if ((int64_t)c - (int64_t)d > q) q = (int64_t)c - (int64_t)d;
  uint32_t e = 2 * d > fts ? 2 * d - fts : 0;
  int64_t q2 = (2 * (int64_t)c + 1 - (int64_t)e) / 3;
  if (q2 > q) q = q2;
  uint32_t qq = (uint32_t)q >> sh;
  uint32_t fl = 0;
  int ret = 0;
  uint32_t fh = (uint32_t)cdf[0];
  while (fh <= qq && ret + 1 < n) {
    fl = fh;
    ret++;
    fh = (uint32_t)cdf[ret];
  }
  if (fh <= qq) dec->error = 1;
  fl <<= sh;
  fh <<= sh;
  uint32_t u = part(fl, d, e);
  uint32_t v = part(fh, d, e);
  dec_normalize(dec, dif - (u << 16), v - u);
  return ret;
}

uint32_t dtpu_dec_bits(void* h, int ftb) {
  Decoder* dec = (Decoder*)h;
  uint64_t w = dec->end_window;
  int avail = dec->nend_bits;
  if (avail < ftb) {
    while (avail <= 32 - 8) {
      if (dec->epos <= 0) {
        avail = 0x4000;
        break;
      }
      dec->epos--;
      w |= (uint64_t)dec->buf[dec->epos] << avail;
      avail += 8;
    }
  }
  uint32_t ret = (uint32_t)(w & ((1u << ftb) - 1));
  w >>= ftb;
  avail -= ftb;
  dec->end_window = w;
  dec->nend_bits = avail;
  return ret;
}

int dtpu_dec_error(void* h) { return ((Decoder*)h)->error; }

// -- checkpoint / rollback (od_ec_enc_checkpoint semantics: O(1)
// snapshot, rollback truncates the buffers to a causal ancestor) -----

void dtpu_enc_checkpoint(void* h, int64_t* out7) {
  Encoder* e = (Encoder*)h;
  out7[0] = (int64_t)e->precarry.size();
  out7[1] = e->low;
  out7[2] = e->rng;
  out7[3] = e->cnt;
  out7[4] = (int64_t)e->end_flushed.size();
  out7[5] = (int64_t)e->end_window;
  out7[6] = e->nend_bits;
}

void dtpu_enc_rollback(void* h, const int64_t* s7) {
  Encoder* e = (Encoder*)h;
  e->precarry.resize((size_t)s7[0]);
  e->low = (uint32_t)s7[1];
  e->rng = (uint32_t)s7[2];
  e->cnt = (int)s7[3];
  e->end_flushed.resize((size_t)s7[4]);
  e->end_window = (uint64_t)s7[5];
  e->nend_bits = (int)s7[6];
}

int dtpu_enc_tell_frac(void* h) {
  Encoder* e = (Encoder*)h;
  int nbits = ((int)((e->precarry.size() + e->end_flushed.size()) * 8)
               + e->cnt + e->nend_bits + 10) << 3;
  uint32_t rng = e->rng;
  int l = 0;
  for (int i = 0; i < 3; i++) {
    rng = (rng * rng) >> 15;
    int b = (int)(rng >> 16);
    l = (l << 1) | b;
    rng >>= b;
  }
  return nbits - l;
}

// -- pickle support (tile workers fork and ship coders back) ---------

int dtpu_enc_serialize(void* h, uint8_t* out, int cap) {
  Encoder* e = (Encoder*)h;
  int need = (int)(sizeof(int64_t) * 7 + e->precarry.size() * 2
                   + e->end_flushed.size());
  if (!out) return need;
  if (cap < need) return -1;
  int64_t hdr[7] = {(int64_t)e->precarry.size(),
                    (int64_t)e->end_flushed.size(), e->low, e->rng,
                    e->cnt, (int64_t)e->end_window, e->nend_bits};
  memcpy(out, hdr, sizeof(hdr));
  uint8_t* p = out + sizeof(hdr);
  memcpy(p, e->precarry.data(), e->precarry.size() * 2);
  p += e->precarry.size() * 2;
  memcpy(p, e->end_flushed.data(), e->end_flushed.size());
  return need;
}

void* dtpu_enc_deserialize(const uint8_t* buf, int len) {
  if (len < (int)(sizeof(int64_t) * 7)) return nullptr;
  int64_t hdr[7];
  memcpy(hdr, buf, sizeof(hdr));
  Encoder* e = new Encoder();
  e->precarry.resize((size_t)hdr[0]);
  e->end_flushed.resize((size_t)hdr[1]);
  e->low = (uint32_t)hdr[2];
  e->rng = (uint32_t)hdr[3];
  e->cnt = (int)hdr[4];
  e->end_window = (uint64_t)hdr[5];
  e->nend_bits = (int)hdr[6];
  const uint8_t* p = buf + sizeof(hdr);
  memcpy(e->precarry.data(), p, e->precarry.size() * 2);
  p += e->precarry.size() * 2;
  memcpy(e->end_flushed.data(), p, e->end_flushed.size());
  return e;
}

int dtpu_dec_serialize(void* h, int64_t* out8) {
  Decoder* d = (Decoder*)h;
  out8[0] = (int64_t)d->bpos;
  out8[1] = d->epos;
  out8[2] = d->dif;
  out8[3] = d->rng;
  out8[4] = d->cnt;
  out8[5] = (int64_t)d->end_window;
  out8[6] = d->nend_bits;
  out8[7] = d->error;
  return 0;
}

void* dtpu_dec_deserialize(const uint8_t* buf, int size,
                           const int64_t* s8) {
  Decoder* d = new Decoder();
  d->buf = buf;
  d->size = (size_t)size;
  d->bpos = (size_t)s8[0];
  d->epos = (long)s8[1];
  d->dif = (uint32_t)s8[2];
  d->rng = (uint32_t)s8[3];
  d->cnt = (int)s8[4];
  d->end_window = (uint64_t)s8[5];
  d->nend_bits = (int)s8[6];
  d->error = (int)s8[7];
  return d;
}

}  // extern "C"

// -- PVQ pulse search (pvq_search_rdo_double behavioral spec,
// pvq_encoder.c:121-225): greedy allocation + RDO tail. ---------------

extern "C" int dtpu_pvq_search(const double* x, int n, int k, double g2,
                               double lambda, int32_t* y_out,
                               double* cos_dist_out) {
  double xx = 0, xy = 0, yy = 0;
  std::vector<double> ax(n);
  std::vector<int32_t> y(n, 0);
  for (int j = 0; j < n; j++) {
    ax[j] = x[j] < 0 ? -x[j] : x[j];
    xx += ax[j] * ax[j];
  }
  double norm_1 = 1.0 / std::sqrt(1e-30 + xx);
  double lam = lambda / (1e-30 + g2);
  int i = 0;
  if (k > 2) {
    double l1 = 0;
    for (int j = 0; j < n; j++) l1 += ax[j];
    double l1i = 1.0 / (l1 > 1e-100 ? l1 : 1e-100);
    for (int j = 0; j < n; j++) {
      int32_t p = (int32_t)std::floor(k * ax[j] * l1i);
      if (p < 0) p = 0;
      y[j] = p;
      xy += ax[j] * p;
      yy += (double)p * p;
      i += p;
    }
  }
  int rdo_pulses = 1 + k / 4;
  double delta_rate = 3.0 / n;
  for (; i < k - rdo_pulses; i++) {
    int pos = 0;
    double best_num = -1e30, best_den = 1;
    for (int j = 0; j < n; j++) {
      double txy = xy + ax[j];
      double tyy = yy + 2.0 * y[j] + 1;
      txy *= txy;
      if (j == 0 || txy * best_den > best_num * tyy) {
        best_num = txy;
        best_den = tyy;
        pos = j;
      }
    }
    xy += ax[pos];
    yy += 2.0 * y[pos] + 1;
    y[pos]++;
  }
  for (; i < k; i++) {
    int pos = 0;
    double best = -1e30;
    for (int j = 0; j < n; j++) {
      double cost = 2.0 * (xy + ax[j]) * norm_1
          / std::sqrt(yy + 2.0 * y[j] + 1) - lam * j * delta_rate;
      if (j == 0 || cost > best) {
        best = cost;
        pos = j;
      }
    }
    xy += ax[pos];
    yy += 2.0 * y[pos] + 1;
    y[pos]++;
  }
  for (int j = 0; j < n; j++) y_out[j] = x[j] < 0 ? -y[j] : y[j];
  *cos_dist_out = xy / (1e-100 + std::sqrt(xx * yy));
  return 0;
}

// -- PVQ band RDO search (pvq_theta behavioral spec,
// pvq_encoder.c:311-533) with the analytic rate model.  Returns the
// CHOICES only (qg, itheta, max_theta, k, noref, y); the Python caller
// recomputes synthesis exactly as the decoder does, so float paths
// cannot diverge between encoder and decoder. --------------------------

namespace {

// Defined in a later anonymous-namespace block (same namespace).
void laplace_encode_vector_c(Encoder* e, const int64_t* y, int n, int k,
                             int64_t* curr, const int64_t* means);

// Reset-state codeword adaptation means (PvqAdapt.pvq_adapt rows —
// identical for every (bs, noref) row at frame start, the
// od_adapt_pvq_ctx_reset values).
const int64_t CW_MEANS[4] = {384, 256, 104, 128};

// Actual K-tokens codeword bits of a candidate pulse vector,
// trial-encoded through the real coder at the reset adaptation state
// — the od_pvq_rate role with OD_PVQ_RATE_APPROX=0
// (pvq_encoder.c:248-284).  The round-3 matched-input proof showed the
// coder itself is bit-equal to the reference; charging its true cost
// in the search (instead of the n*log2(1+ln(2n)k/n) curve) is what
// closes the high-rate gain/theta/pulse choice gap.
double cw_rate(const int32_t* y, int nred, int k) {
  if (k <= 0 || nred <= 0) return 0;
  if (nred > 256)
    return nred * std::log2(1.0 + std::log(nred * 2.0) * k / nred);
  Encoder e;
  int64_t yy[256];
  for (int i = 0; i < nred; i++) yy[i] = y[i];
  int64_t curr[4] = {0, 0, 0, 0};
  int t0 = dtpu_enc_tell_frac(&e);
  laplace_encode_vector_c(&e, yy, nred, k, curr, CW_MEANS);
  return (dtpu_enc_tell_frac(&e) - t0) / 8.0;
}

int cw_exact_mode() {
  static int mode = -1;
  if (mode < 0) {
    const char* v = std::getenv("DTPU_APPROX_CW_RATE");
    mode = (v && v[0] && v[0] != '0') ? 0 : 1;
  }
  return mode;
}

double rate_approx(int qg, int icgr, int theta, int ts, int k, int n,
                   int is_keyframe, int pli,
                   const int32_t* ycand = nullptr) {
  double rate = 0;
  if (k > 0) {
    if (ycand == nullptr || !cw_exact_mode()) {
      rate = n * std::log2(1.0 + std::log(n * 2.0) * k / n);
    } else if (k == 1 && n < 16) {
      // k1 position CDF (flat at reset) + sign bit.
      rate = std::log2((double)(n - (theta >= 0 ? 1 : 0))) + 1.0;
    } else {
      rate = cw_rate(ycand, n - (theta >= 0 ? 1 : 0), k);
    }
  }
  if (qg > 0 && theta >= 0) {
    rate += 0.9 * std::log2(ts > 1 ? ts : 1);
    if (is_keyframe && pli == 0) rate += 6;
    if (qg == icgr) rate -= 0.5;
  }
  return rate;
}

int compute_max_theta(double qcg, double beta) {
  int ts = (int)std::floor(.5 + qcg * M_PI / (2 * beta));
  return qcg < 1.4 ? 1 : ts;
}

double compute_theta_v(int t, int ts) {
  if (ts != 0) return (t < ts - 1 ? t : ts - 1) * .5 * M_PI / ts;
  return 0;
}

int compute_k_v(double qcg, int itheta, double theta, int noref, int n,
                double beta, int nodesync) {
  if (noref) {
    if (qcg == 0) return 0;
    if (n == 15 && qcg == 1 && beta > 1.25) return 1;
    int v = (int)std::floor(.5 + (qcg - .2) * std::sqrt((double)((n + 3) / 2))
                            / beta);
    return v > 1 ? v : 1;
  }
  if (itheta == 0) return 0;
  int v;
  if (nodesync) {
    v = (int)std::floor(.5 + (itheta - .2) * std::sqrt((double)((n + 2) / 2)));
  } else {
    v = (int)std::floor(.5 + (qcg * std::sin(theta) - .2)
                        * std::sqrt((double)((n + 2) / 2)) / beta);
  }
  return v > 1 ? v : 1;
}

extern "C" int dtpu_pvq_search(const double*, int, int, double, double,
                               int32_t*, double*);

}  // namespace

extern "C" int dtpu_pvq_theta(
    const int32_t* x0, const int32_t* r0, int n, int q0, double beta,
    int nodesync, int is_keyframe, int pli, const int32_t* qm,
    double lambda,
    // outputs:
    int32_t* y_out, int* qg_out, int* itheta_out, int* max_theta_out,
    int* k_out, int* noref_out, double* skip_diff_out,
    double* m_sign_out /* [m, s, cg, cgr, gain_offset, corr] */) {
  const double QM1 = 1.0 / 32767.0;
  std::vector<double> x(n), r(n);
  double corr = 0;
  for (int i = 0; i < n; i++) {
    x[i] = (double)x0[i] * qm[i] * QM1;
    r[i] = (double)r0[i] * qm[i] * QM1;
    corr += x[i] * r[i];
  }
  int cfl_enabled = is_keyframe && pli != 0;
  double g = 0, gr = 0;
  for (int i = 0; i < n; i++) g += x[i] * x[i];
  g = std::sqrt(g);
  for (int i = 0; i < n; i++) gr += r[i] * r[i];
  gr = std::sqrt(gr);
  // beta == 1 fast path matches gain_compand for the shipped betas of
  // 1.0; masking betas (1.5) take the pow() path.
  double cg, cgr;
  const double CS = 256 * 16, CS1 = 1.0 / (256 * 16);
  if (beta == 1) cg = g / q0;
  else cg = CS * std::pow(g * CS1, 1.0 / beta) / q0;
  if (beta == 1) cgr = gr / q0;
  else cgr = CS * std::pow(gr * CS1, 1.0 / beta) / q0;
  if (cfl_enabled) cgr = 1.0;
  int icgr = (int)std::floor(.5 + cgr);
  double gain_offset = cgr - icgr;
  int qg = 0;
  double gain_weight = 1.4;
  double best_dist = gain_weight * cg * cg;
  double best_cost = best_dist
      + lambda * rate_approx(0, 0, -1, 0, 0, n, is_keyframe, pli);
  int noref = 1, best_k = 0, itheta = -1, max_theta = 0;
  std::vector<int32_t> y(n, 0), y_tmp(n, 0);
  double best_qtheta = 0;
  int m = 0, s = 1;
  corr = corr / (1e-100 + g * gr);
  corr = corr > 1 ? 1 : (corr < -1 ? -1 : corr);
  double skip_dist;
  if (is_keyframe) skip_dist = gain_weight * cg * cg;
  else {
    skip_dist = gain_weight * (cg - cgr) * (cg - cgr)
        + cgr * cg * (2 - 2 * corr);
    double scgr = gain_offset > 0 ? gain_offset : 0;
    if (icgr == 0) {
      best_dist = gain_weight * (cg - scgr) * (cg - scgr)
          + scgr * cg * (2 - 2 * corr);
    }
    best_cost = best_dist
        + lambda * rate_approx(0, icgr, 0, 0, 0, n, is_keyframe, pli);
    best_qtheta = 0;
    itheta = 0;
    max_theta = 0;
    noref = 0;
  }
  bool r_nonzero = false;
  for (int i = 0; i < n; i++) if (r0[i]) { r_nonzero = true; break; }
  std::vector<double> xh;
  if (n <= 128 && r_nonzero && corr > 0) {
    double theta = std::acos(corr);
    // Householder on a copy of r.
    std::vector<double> rh(r);
    m = 0;
    double maxr = 0;
    for (int i = 0; i < n; i++) {
      double a = std::fabs(rh[i]);
      if (a > maxr) { maxr = a; m = i; }
    }
    s = rh[m] > 0 ? 1 : -1;
    rh[m] += gr * s;
    double l2r = 0, proj = 0;
    for (int i = 0; i < n; i++) l2r += rh[i] * rh[i];
    for (int i = 0; i < n; i++) proj += rh[i] * x[i];
    double p2 = proj * 2.0 / (1e-100 + l2r);
    xh.resize(n - 1);
    for (int i = 0, j = 0; i < n; i++) {
      if (i == m) continue;
      xh[j++] = x[i] - rh[i] * p2;
    }
    // NOTE: reference deletes index m AFTER reflection; x[m] position
    // reflected then removed — our loop does the same.
    int ilo = (int)std::floor(cg - gain_offset) - 1;
    if (ilo < 1) ilo = 1;
    int ihi = (int)std::ceil(cg - gain_offset);
    for (int i = ilo; i <= ihi; i++) {
      double qcg = i + gain_offset;
      int ts = compute_max_theta(qcg, beta);
      int jlo = (int)std::floor(.5 + std::acos(corr) * 2 / M_PI * ts) - 2;
      if (jlo < 0) jlo = 0;
      int jhi = (int)std::ceil(std::acos(corr) * 2 / M_PI * ts);
      if (jhi > ts - 1) jhi = ts - 1;
      for (int j = jlo; j <= jhi; j++) {
        double qtheta = compute_theta_v(j, ts);
        int k = compute_k_v(qcg, j, qtheta, 0, n, beta, nodesync);
        double cos_dist;
        dtpu_pvq_search(xh.data(), n - 1, k,
                        qcg * cg * std::sin(theta) * std::sin(qtheta),
                        lambda, y_tmp.data(), &cos_dist);
        double dist_theta = 2 - 2 * std::cos(theta - qtheta)
            + std::sin(theta) * std::sin(qtheta) * (2 - 2 * cos_dist);
        double dist = gain_weight * (qcg - cg) * (qcg - cg)
            + qcg * cg * dist_theta;
        double cost = dist + lambda * rate_approx(i, icgr, j, ts, k, n,
                                                  is_keyframe, pli,
                                                  y_tmp.data());
        if (cost < best_cost) {
          best_cost = cost;
          best_dist = dist;
          qg = i;
          best_k = k;
          best_qtheta = qtheta;
          itheta = j;
          max_theta = ts;
          noref = 0;
          for (int t = 0; t < n - 1; t++) y[t] = y_tmp[t];
          y[n - 1] = 0;
        }
      }
    }
  }
  if (n <= 128 && ((is_keyframe && pli == 0) || corr < .5 || cg < 2.)) {
    int ilo = (int)std::floor(cg);
    if (ilo < 1) ilo = 1;
    int ihi = (int)std::ceil(cg);
    for (int i = ilo; i <= ihi; i++) {
      double qcg = i;
      int k = compute_k_v(qcg, -1, -1, 1, n, beta, nodesync);
      double cos_dist;
      dtpu_pvq_search(x.data(), n, k, qcg * cg, lambda, y_tmp.data(),
                      &cos_dist);
      double dist = gain_weight * (qcg - cg) * (qcg - cg)
          + qcg * cg * (2 - 2 * cos_dist);
      double cost = dist + lambda * rate_approx(i, 0, -1, 0, k, n,
                                                is_keyframe, pli,
                                                y_tmp.data());
      if (cost <= best_cost) {
        best_cost = cost;
        best_dist = dist;
        qg = i;
        noref = 1;
        best_k = k;
        itheta = -1;
        max_theta = 0;
        for (int t = 0; t < n; t++) y[t] = y_tmp[t];
      }
    }
  }
  for (int t = 0; t < n; t++) y_out[t] = y[t];
  *qg_out = qg;
  *itheta_out = itheta;
  *max_theta_out = max_theta;
  *k_out = best_k;
  *noref_out = noref;
  *skip_diff_out = skip_dist - best_dist;
  m_sign_out[0] = m;
  m_sign_out[1] = s;
  m_sign_out[2] = cg;
  m_sign_out[3] = cgr;
  m_sign_out[4] = gain_offset;
  m_sign_out[5] = corr;
  return 0;
}

// Batched band search: run dtpu_pvq_theta over many bands in one call
// (kills per-band FFI overhead; bands are independent given the
// analytic rate model).  Arrays are concatenated per band with an
// offsets table.
extern "C" int dtpu_pvq_theta_batch(
    int nbands, const int32_t* offsets /* nbands+1 */,
    const int32_t* x0s, const int32_t* r0s, const int32_t* qms,
    const int32_t* q0s, const double* betas, int nodesync,
    int is_keyframe, const int32_t* plis, double lambda,
    int32_t* y_out, int32_t* qg_out, int32_t* itheta_out,
    int32_t* max_theta_out, int32_t* k_out, int32_t* noref_out,
    double* skip_diff_out, double* extras_out /* nbands*6 */) {
  // Bands are independent (analytic rate model, no shared state):
  // split across cores with per-call std::threads (fork-safe: no
  // persistent pool to deadlock in forked tile/GOP workers).
  int nthreads = 1;
  {
    unsigned hw = std::thread::hardware_concurrency();
    if (nbands >= 64 && hw > 1) nthreads = hw < 4 ? (int)hw : 4;
  }
  if (nthreads > 1) {
    std::vector<std::thread> ts;
    std::atomic<int> next(0);
    auto work = [&]() {
      for (;;) {
        int b = next.fetch_add(8);
        if (b >= nbands) break;
        int hi = b + 8 < nbands ? b + 8 : nbands;
        for (; b < hi; b++) {
          int lo = offsets[b];
          int n = offsets[b + 1] - lo;
          int qg, itheta, max_theta, k, noref;
          double sd;
          dtpu_pvq_theta(x0s + lo, r0s + lo, n, q0s[b], betas[b],
                         nodesync, is_keyframe, plis[b], qms + lo,
                         lambda, y_out + lo, &qg, &itheta, &max_theta,
                         &k, &noref, &sd, extras_out + 6 * b);
          qg_out[b] = qg;
          itheta_out[b] = itheta;
          max_theta_out[b] = max_theta;
          k_out[b] = k;
          noref_out[b] = noref;
          skip_diff_out[b] = sd;
        }
      }
    };
    for (int t = 0; t < nthreads; t++) ts.emplace_back(work);
    for (auto& t : ts) t.join();
    return 0;
  }
  for (int b = 0; b < nbands; b++) {
    int lo = offsets[b];
    int n = offsets[b + 1] - lo;
    int qg, itheta, max_theta, k, noref;
    double sd;
    dtpu_pvq_theta(x0s + lo, r0s + lo, n, q0s[b], betas[b], nodesync,
                   is_keyframe, plis[b], qms + lo, lambda, y_out + lo,
                   &qg, &itheta, &max_theta, &k, &noref, &sd,
                   extras_out + 6 * b);
    qg_out[b] = qg;
    itheta_out[b] = itheta;
    max_theta_out[b] = max_theta;
    k_out[b] = k;
    noref_out[b] = noref;
    skip_diff_out[b] = sd;
  }
  return 0;
}

extern "C" uint32_t dtpu_dec_bits(void* h, int ftb);

// ====================================================================
// Adaptive symbol models + the PVQ band partition coder — C++ twins of
// entropy/adapt.py and pvq/coding.py's _encode/_decode_partition symbol
// work, operating in place on the SAME numpy adaptation arrays the
// Python path uses (pointers passed per call).  Floating-point work
// (gain/householder/synthesis) stays in Python per the consistency
// contract; only integer symbol coding and adaptation live here.
// ====================================================================

namespace {

struct Tables {
  const int32_t* exp_cdf = nullptr;   // (128, 16), rows end at 32768
  const int32_t* lap_off = nullptr;   // (128,)
};
Tables g_tab;

const int64_t OD_ADAPT_NO_VALUE = -((int64_t)1 << 31);

inline void adapt_cdf32(int32_t* cdf, int n, int val, int inc) {
  if (cdf[n - 1] + inc > 32767) {
    for (int i = 0; i < n; i++) cdf[i] = (cdf[i] >> 1) + i + 1;
  }
  for (int i = val; i < n; i++) cdf[i] += inc;
}

inline void enc_cdf_unscaled32(Encoder* e, int s, const int32_t* cdf,
                               int n) {
  uint32_t ft = (uint32_t)cdf[n - 1];
  int sh = 15 - ilog(ft - 1);
  uint32_t fl = s > 0 ? ((uint32_t)cdf[s - 1] << sh) : 0;
  enc_symbol(e, fl, (uint32_t)cdf[s] << sh, ft << sh);
}

inline void enc_cdf_adapt32(Encoder* e, int val, int32_t* cdf, int n,
                            int inc) {
  enc_cdf_unscaled32(e, val, cdf, n);
  adapt_cdf32(cdf, n, val, inc);
}

inline int dec_cdf_unscaled32(Decoder* d, const int32_t* cdf, int n) {
  uint32_t ft = (uint32_t)cdf[n - 1];
  int sh = 15 - ilog(ft - 1);
  uint32_t fts = ft << sh;
  uint32_t dif = d->dif;
  uint32_t r = d->rng;
  if (r - fts >= fts) { fts <<= 1; sh++; }
  uint32_t dd = r - fts;
  uint32_t c = dif >> 16;
  int64_t q = c >> 1;
  if ((int64_t)c - (int64_t)dd > q) q = (int64_t)c - (int64_t)dd;
  uint32_t ee = 2 * dd > fts ? 2 * dd - fts : 0;
  int64_t q2 = (2 * (int64_t)c + 1 - (int64_t)ee) / 3;
  if (q2 > q) q = q2;
  uint32_t qq = (uint32_t)q >> sh;
  uint32_t fl = 0;
  int ret = 0;
  uint32_t fh = (uint32_t)cdf[0];
  while (fh <= qq && ret + 1 < n) { fl = fh; ret++; fh = (uint32_t)cdf[ret]; }
  if (fh <= qq) d->error = 1;
  fl <<= sh;
  fh <<= sh;
  uint32_t u = part(fl, dd, ee);
  uint32_t v = part(fh, dd, ee);
  dec_normalize(d, dif - (u << 16), v - u);
  return ret;
}

inline int dec_cdf_adapt32(Decoder* d, int32_t* cdf, int n, int inc) {
  int val = dec_cdf_unscaled32(d, cdf, n);
  adapt_cdf32(cdf, n, val, inc);
  return val;
}

// Offset CDF variant: encode with (cdf[i] - off) as the effective CDF
// (laplace_encode's "cdf = EXP_CDF_TABLE[idx] - offset").
inline void enc_cdf_unscaled_off(Encoder* e, int s, const int32_t* cdf,
                                 int off, int n) {
  uint32_t ft = (uint32_t)(cdf[n - 1] - off);
  int sh = 15 - ilog(ft - 1);
  uint32_t fl = s > 0 ? ((uint32_t)(cdf[s - 1] - off) << sh) : 0;
  enc_symbol(e, fl, (uint32_t)(cdf[s] - off) << sh, ft << sh);
}

inline int dec_cdf_unscaled_off(Decoder* d, const int32_t* cdf, int off,
                                int n) {
  // Mirror of enc_cdf_unscaled_off via a small stack copy (n <= 16).
  int32_t tmp[16];
  for (int i = 0; i < n; i++) tmp[i] = cdf[i] - off;
  return dec_cdf_unscaled32(d, tmp, n);
}

inline void enc_cdf_q15_32(Encoder* e, int s, const int32_t* cdf, int n) {
  uint32_t fl = s > 0 ? (uint32_t)cdf[s - 1] : 0;
  enc_symbol(e, fl, (uint32_t)cdf[s], (uint32_t)cdf[n - 1]);
}

inline int dec_cdf_q15_32(Decoder* d, const int32_t* cdf, int n) {
  return dec_cdf_unscaled32(d, cdf, n);  // ft=32768 -> sh==0 path
}

inline int log_ex_c(int64_t ex_q16) {
  int lg = 0;
  { int64_t v = ex_q16; while (v) { lg++; v >>= 1; } }
  int odd;
  if (lg < 15) {
    odd = ex_q16 * ex_q16 > ((int64_t)2 << (2 * lg)) ? 1 : 0;
  } else {
    int64_t tmp = ex_q16 >> (lg - 8);
    odd = tmp * tmp > ((int64_t)1 << 15) ? 1 : 0;
  }
  int r = 2 * lg - 33 + odd;
  return r > 0 ? r : 0;
}

void laplace_encode_special_c(Encoder* e, int x, int decay, int maxval) {
  int shift = 0;
  if (maxval == 0) return;
  while (((maxval >> shift) >= 15 || maxval == -1) && decay > 235) {
    decay = (decay * decay + 128) >> 8;
    shift++;
  }
  decay = decay < 2 ? 2 : (decay > 254 ? 254 : decay);
  int xs = x >> shift;
  int ms = maxval >> shift;
  const int32_t* cdf = g_tab.exp_cdf + 16 * ((decay + 1) >> 1);
  for (;;) {
    int sym = xs < 15 ? xs : 15;
    if (0 < ms && ms < 15) {
      enc_cdf_unscaled32(e, sym, cdf, ms + 1);
    } else {
      enc_cdf_q15_32(e, sym, cdf, 16);
    }
    xs -= 15;
    ms -= 15;
    if (!(sym >= 15 && ms != 0)) break;
  }
  if (shift) enc_bits(e, (uint32_t)(x & ((1 << shift) - 1)), shift);
}

int laplace_decode_special_c(Decoder* d, int decay, int maxval) {
  int shift = 0;
  if (maxval == 0) return 0;
  while (((maxval >> shift) >= 15 || maxval == -1) && decay > 235) {
    decay = (decay * decay + 128) >> 8;
    shift++;
  }
  decay = decay < 2 ? 2 : (decay > 254 ? 254 : decay);
  int ms = maxval >> shift;
  const int32_t* cdf = g_tab.exp_cdf + 16 * ((decay + 1) >> 1);
  int xs = 0;
  for (;;) {
    int sym;
    if (0 < ms && ms < 15) {
      sym = dec_cdf_unscaled32(d, cdf, ms + 1);
    } else {
      sym = dec_cdf_q15_32(d, cdf, 16);
    }
    xs += sym;
    ms -= 15;
    if (!(sym >= 15 && ms != 0)) break;
  }
  int pos = xs;
  if (shift) {
    pos = (xs << shift) + (int)dtpu_dec_bits((void*)d, shift);
  }
  if (maxval != -1 && pos > maxval) { pos = maxval; d->error = 1; }
  return pos;
}

int64_t generic_encode_c(Encoder* e, int32_t* model_cdf, int model_inc,
                         int x, int maxval, int64_t ex_q16, int integ) {
  if (maxval == 0) return ex_q16;
  int lg = log_ex_c(ex_q16);
  int shift = (lg - 5) >> 1;
  if (shift < 0) shift = 0;
  int mid = lg < 11 ? lg : 11;
  int32_t* cdf = model_cdf + 16 * mid;
  int xs = (x + ((1 << shift) >> 1)) >> shift;
  int ms = (maxval + ((1 << shift) >> 1)) >> shift;
  if (maxval == -1) {
    enc_cdf_unscaled32(e, xs < 15 ? xs : 15, cdf, 16);
  } else {
    int nn = ms + 1 < 16 ? ms + 1 : 16;
    enc_cdf_unscaled32(e, xs < 15 ? xs : 15, cdf, nn);
  }
  if (xs >= 15) {
    int64_t ee = (((2 * ex_q16) >> 8) + ((1 << shift) >> 1)) >> shift;
    int decay = (int)(256 * ee / (ee + 256));
    decay = decay < 2 ? 2 : (decay > 254 ? 254 : decay);
    laplace_encode_special_c(e, xs - 15, decay,
                             maxval == -1 ? -1 : ms - 15);
  }
  if (shift != 0) {
    int special = xs == 0 ? 1 : 0;
    if (shift - special > 0) {
      enc_bits(e, (uint32_t)(x - (xs << shift)
                             + ((1 - special) << (shift - 1))),
               shift - special);
    }
  }
  // model update
  if (cdf[15] + model_inc > 32767) {
    for (int i = 0; i < 16; i++) cdf[i] = (cdf[i] >> 1) + i + 1;
  }
  for (int i = xs < 15 ? xs : 15; i < 16; i++) cdf[i] += model_inc;
  int64_t xc = x < 32767 ? x : 32767;
  return ex_q16 + (((xc << 16) - ex_q16) >> integ);
}

int64_t generic_decode_c(Decoder* d, int32_t* model_cdf, int model_inc,
                         int maxval, int64_t ex_q16, int integ,
                         int* out_x) {
  if (maxval == 0) { *out_x = 0; return ex_q16; }
  int lg = log_ex_c(ex_q16);
  int shift = (lg - 5) >> 1;
  if (shift < 0) shift = 0;
  int mid = lg < 11 ? lg : 11;
  int32_t* cdf = model_cdf + 16 * mid;
  int ms = (maxval + ((1 << shift) >> 1)) >> shift;
  int xs;
  if (maxval == -1) {
    xs = dec_cdf_unscaled32(d, cdf, 16);
  } else {
    int nn = ms + 1 < 16 ? ms + 1 : 16;
    xs = dec_cdf_unscaled32(d, cdf, nn);
  }
  if (xs == 15) {
    int64_t ee = (((2 * ex_q16) >> 8) + ((1 << shift) >> 1)) >> shift;
    int decay = (int)(256 * ee / (ee + 256));
    decay = decay < 2 ? 2 : (decay > 254 ? 254 : decay);
    xs += laplace_decode_special_c(d, decay,
                                   maxval == -1 ? -1 : ms - 15);
  }
  int lsb = 0;
  if (shift != 0) {
    int special = xs == 0 ? 1 : 0;
    if (shift - special > 0) {
      lsb = (int)dtpu_dec_bits((void*)d, shift - special);
    }
    lsb -= (1 - special) << (shift - 1);
  }
  int x = (xs << shift) + lsb;
  if (cdf[15] + model_inc > 32767) {
    for (int i = 0; i < 16; i++) cdf[i] = (cdf[i] >> 1) + i + 1;
  }
  for (int i = xs < 15 ? xs : 15; i < 16; i++) cdf[i] += model_inc;
  *out_x = x;
  int64_t xc = x < 32767 ? x : 32767;
  return ex_q16 + (((xc << 16) - ex_q16) >> integ);
}

void laplace_encode_c(Encoder* e, int x, int ex_q8, int k) {
  int shift = ilog((uint32_t)ex_q8) - 11;
  if (shift < 0) shift = 0;
  ex_q8 = (ex_q8 + ((1 << shift) >> 1)) >> shift;
  k = (k + ((1 << shift) >> 1)) >> shift;
  int xs = (x + ((1 << shift) >> 1)) >> shift;
  int decay = 256 * ex_q8 / (ex_q8 + 256);
  if (decay > 254) decay = 254;
  int idx = (decay + 1) >> 1;
  int off = g_tab.lap_off[idx];
  const int32_t* cdf = g_tab.exp_cdf + 16 * idx;
  int sym = xs < 15 ? xs : 15;
  if (k != 0) {
    int nn = k + 1 < 16 ? k + 1 : 16;
    enc_cdf_unscaled_off(e, sym, cdf, off, nn);
  }
  if (shift) {
    int special = xs == 0 ? 1 : 0;
    if (shift - special > 0) {
      enc_bits(e, (uint32_t)(x - (xs << shift)
                             + ((1 - special) << (shift - 1))),
               shift - special);
    }
  }
  if (xs >= 15) laplace_encode_special_c(e, xs - 15, decay, k - 15);
}

int laplace_decode_c(Decoder* d, int ex_q8, int k) {
  int shift = ilog((uint32_t)ex_q8) - 11;
  if (shift < 0) shift = 0;
  ex_q8 = (ex_q8 + ((1 << shift) >> 1)) >> shift;
  k = (k + ((1 << shift) >> 1)) >> shift;
  int decay = 256 * ex_q8 / (ex_q8 + 256);
  if (decay > 254) decay = 254;
  int idx = (decay + 1) >> 1;
  int off = g_tab.lap_off[idx];
  const int32_t* cdf = g_tab.exp_cdf + 16 * idx;
  int sym = 0;
  if (k != 0) {
    int nn = k + 1 < 16 ? k + 1 : 16;
    sym = dec_cdf_unscaled_off(d, cdf, off, nn);
  }
  int lsb = 0;
  if (shift) {
    int special = sym == 0 ? 1 : 0;
    if (shift - special > 0) {
      lsb = (int)dtpu_dec_bits((void*)d, shift - special);
    }
    lsb -= (1 - special) << (shift - 1);
  }
  if (sym == 15) sym += laplace_decode_special_c(d, decay, k - 15);
  return (sym << shift) + lsb;
}

inline int delta_decay_c(int64_t coef, int n, int prev, int k_left) {
  int64_t ex = coef * (n - prev) / k_left;
  if (ex > 65280) return 255;
  int64_t v = 256 * ex / (ex + 256)
      + (ex >> 5) * ex / ((int64_t)(n + 1) * (n - 1) * (n - 1));
  return v < 255 ? (int)v : 255;
}

void encode_vector_delta_c(Encoder* e, const int64_t* y, int n, int k,
                           int64_t* curr, const int64_t* means) {
  int prev = 0;
  int64_t sum_ex = 0, sum_c = 0;
  int first = 1;
  int k_left = k;
  int64_t coef = 256 * means[2] / (1 + means[3]);
  if (coef < 1) coef = 1;
  for (int i = 0; i < n; i++) {
    if (y[i] != 0) {
      int mag = (int)(y[i] < 0 ? -y[i] : y[i]);
      int count = i - prev;
      if (first) {
        int decay = delta_decay_c(coef, n, prev, k_left);
        laplace_encode_special_c(e, count, decay, n - 1);
        first = 0;
      } else {
        laplace_encode_c(e, count, (int)(coef * (n - prev) / k_left),
                         n - prev - 1);
      }
      sum_ex += 256 * (int64_t)(n - prev);
      sum_c += (int64_t)count * k_left;
      enc_bits(e, y[i] < 0 ? 1u : 0u, 1);
      for (int j = 0; j < mag - 1; j++) {
        laplace_encode_c(e, 0, (int)(coef * (n - i) / (k_left - 1 - j)),
                         n - i - 1);
        sum_ex += 256 * (int64_t)(n - i);
      }
      k_left -= mag;
      prev = i;
      if (k_left == 0) break;
    }
  }
  if (k > 0) {
    curr[2] = 256 * sum_c;
    curr[3] = sum_ex;
  } else {
    curr[2] = OD_ADAPT_NO_VALUE;
    curr[3] = OD_ADAPT_NO_VALUE;
  }
  curr[0] = 0;
  curr[1] = 0;
}

void laplace_encode_vector_c(Encoder* e, const int64_t* y, int n, int k,
                             int64_t* curr, const int64_t* means) {
  if (k <= 1) {
    encode_vector_delta_c(e, y, n, k, curr, means);
    return;
  }
  int64_t sum_ex = 0;
  int kn = k;
  int64_t mean_k = means[0], mean_sum_ex = means[1];
  int64_t exp_q8 = mean_k < ((int64_t)1 << 23)
      ? 256 * mean_k / (1 + mean_sum_ex)
      : mean_k / (1 + (mean_sum_ex >> 8));
  int ran_delta = 0;
  for (int i = 0; i < n; i++) {
    if (kn == 0) break;
    if (kn <= 1 && i != n - 1) {
      encode_vector_delta_c(e, y + i, n - i, kn, curr, means);
      ran_delta = 1;
      break;
    }
    int x = (int)(y[i] < 0 ? -y[i] : y[i]);
    int64_t ex = (2 * exp_q8 * kn + (n - i)) / (2 * (int64_t)(n - i));
    if (ex > kn * 256) ex = kn * 256;
    sum_ex += (2 * 256 * (int64_t)kn + (n - i)) / (2 * (int64_t)(n - i));
    if (i != n - 1) laplace_encode_c(e, x, (int)ex, kn);
    if (x != 0) enc_bits(e, y[i] < 0 ? 1u : 0u, 1);
    kn -= x;
  }
  if (!ran_delta) {
    curr[2] = OD_ADAPT_NO_VALUE;
    curr[3] = OD_ADAPT_NO_VALUE;
  }
  curr[0] = k - kn;
  curr[1] = sum_ex;
}

void decode_vector_delta_c(Decoder* d, int64_t* y, int n, int k,
                           int64_t* curr, const int64_t* means) {
  int prev = 0;
  int64_t sum_ex = 0, sum_c = 0;
  int64_t coef = 256 * means[2] / (1 + means[3]);
  if (coef < 1) coef = 1;
  int pos = 0, sign = 0, first = 1, k_left = k;
  for (int i = 0; i < n; i++) y[i] = 0;
  for (int iter = 0; iter < k; iter++) {
    int count;
    if (first) {
      int decay = delta_decay_c(coef, n, prev, k_left);
      count = laplace_decode_special_c(d, decay, n - 1);
      first = 0;
    } else {
      count = laplace_decode_c(d, (int)(coef * (n - prev) / k_left),
                               n - prev - 1);
    }
    sum_ex += 256 * (int64_t)(n - prev);
    sum_c += (int64_t)count * k_left;
    pos += count;
    if (pos < 0 || pos >= n) { d->error = 1; pos = n - 1; }
    if (y[pos] == 0) sign = (int)dtpu_dec_bits((void*)d, 1);
    y[pos] += sign ? -1 : 1;
    prev = pos;
    k_left -= 1;
    if (k_left == 0) break;
  }
  if (k > 0) {
    curr[2] = 256 * sum_c;
    curr[3] = sum_ex;
  } else {
    curr[2] = OD_ADAPT_NO_VALUE;
    curr[3] = OD_ADAPT_NO_VALUE;
  }
  curr[0] = 0;
  curr[1] = 0;
}

void laplace_decode_vector_c(Decoder* d, int64_t* y, int n, int k,
                             int64_t* curr, const int64_t* means) {
  if (k <= 1) {
    decode_vector_delta_c(d, y, n, k, curr, means);
    return;
  }
  int64_t sum_ex = 0;
  int kn = k;
  int64_t mean_k = means[0], mean_sum_ex = means[1];
  int64_t exp_q8 = mean_k < ((int64_t)1 << 23)
      ? 256 * mean_k / (1 + mean_sum_ex)
      : mean_k / (1 + (mean_sum_ex >> 8));
  int ran_delta = 0;
  int i = 0;
  while (i < n) {
    if (kn == 0) break;
    if (kn <= 1 && i != n - 1) {
      decode_vector_delta_c(d, y + i, n - i, kn, curr, means);
      ran_delta = 1;
      i = n;
      break;
    }
    int64_t ex = (2 * exp_q8 * kn + (n - i)) / (2 * (int64_t)(n - i));
    if (ex > kn * 256) ex = kn * 256;
    sum_ex += (2 * 256 * (int64_t)kn + (n - i)) / (2 * (int64_t)(n - i));
    int x;
    if (i != n - 1) x = laplace_decode_c(d, (int)ex, kn);
    else x = kn;
    if (x != 0 && dtpu_dec_bits((void*)d, 1)) x = -x;
    y[i] = x;
    kn -= x < 0 ? -x : x;
    i++;
  }
  if (!ran_delta) {
    curr[2] = OD_ADAPT_NO_VALUE;
    curr[3] = OD_ADAPT_NO_VALUE;
  }
  curr[0] = k - kn;
  curr[1] = sum_ex;
  for (; i < n; i++) y[i] = 0;
}

inline void merge_adapt_c(int64_t* row, const int64_t* curr, int speed) {
  if (curr[0] > 0) {
    row[0] += (256 * curr[0] - row[0]) >> speed;
    row[1] += (curr[1] - row[1]) >> speed;
  }
  if (curr[2] > 0) {
    row[2] += (curr[2] - row[2]) >> speed;
    row[3] += (curr[3] - row[3]) >> speed;
  }
}

}  // namespace

extern "C" {

void dtpu_set_tables(const int32_t* exp_cdf, const int32_t* lap_off) {
  g_tab.exp_cdf = exp_cdf;
  g_tab.lap_off = lap_off;
}

// One PVQ band's symbols, encoder side (pvq/coding.py
// _encode_partition + _encode_codeword + _merge_adapt).
void dtpu_encode_partition(
    void* h,
    int32_t* gaintheta_row, int gt_len, int gt_inc,
    int32_t* model_cdf, int model_inc,       // param model (12x16)
    int64_t* exg_cell, int64_t* ext_cell,    // leaky expectations
    int32_t* theta_model_cdf,                // param model 2
    int32_t* k1_cdf_row, int k1_inc,
    int64_t* pvq_adapt_row,
    const int64_t* y, int n, int k,
    int qg, int theta, int max_theta,
    int nodesync, int is_keyframe, int code_skip, int skip_rest,
    int bs) {
  Encoder* e = (Encoder*)h;
  int noref = theta == -1;
  int pid = (qg > 0 ? 1 : 0)
      + 2 * (theta + 1 < 3 ? theta + 1 : 3)
      + 8 * code_skip * skip_rest;
  if (is_keyframe) {
    if (pid >= 8) pid -= 1;
  } else {
    if (pid >= 10) pid -= 1;
  }
  enc_cdf_adapt32(e, pid, gaintheta_row, gt_len, gt_inc);
  if (qg > 0) {
    int64_t ex = *exg_cell;
    generic_encode_c(e, model_cdf, model_inc, qg - 1, -1, ex, 2);
    *exg_cell += (((int64_t)qg << 16) - *exg_cell) >> 2;
  }
  if (theta > 1 && (nodesync || max_theta > 3)) {
    int64_t ex = *ext_cell;
    generic_encode_c(e, theta_model_cdf, model_inc, theta - 2,
                     nodesync ? -1 : max_theta - 3, ex, 2);
    *ext_cell += (((int64_t)theta << 16) - *ext_cell) >> 2;
  }
  // codeword
  if (k == 1 && n < 16) {
    int cdf_id_len = n - (noref ? 0 : 1);
    int pos = 0;
    for (int i = 0; i < cdf_id_len; i++) {
      if (y[i] != 0) { pos = i; break; }
    }
    enc_cdf_adapt32(e, pos, k1_cdf_row, cdf_id_len, k1_inc);
    enc_bits(e, y[pos] < 0 ? 1u : 0u, 1);
  } else {
    int64_t curr[4] = {0, 0, 0, 0};
    laplace_encode_vector_c(e, y, n - (noref ? 0 : 1), k, curr,
                            pvq_adapt_row);
    merge_adapt_c(pvq_adapt_row, curr, 5);
  }
}

// Decoder side: pid/gain/theta/codeword symbols only — float synthesis
// stays in Python.  Outputs via pointers; returns pid.
void dtpu_decode_partition_symbols1(
    void* h,
    int32_t* gaintheta_row, int gt_len, int gt_inc,
    int* out_pid) {
  *out_pid = dec_cdf_adapt32((Decoder*)h, gaintheta_row, gt_len, gt_inc);
}

int dtpu_decode_generic(void* h, int32_t* model_cdf, int model_inc,
                        int maxval, int64_t ex_q16, int integ) {
  int x;
  generic_decode_c((Decoder*)h, model_cdf, model_inc, maxval, ex_q16,
                   integ, &x);
  return x;
}

// Batched per-SB mesh subdivision level coding for one tile's rows
// (pipeline/inter.py _code_levels; context = left, else up, cut at
// the tile top).  cdf: (4, 4) int32; enc side only — the decode side
// stays in Python (decode output feeds per-SB control flow anyway).
void dtpu_mesh_levels_enc(void* h, int32_t* level_cdf, int inc,
                          const int32_t* levels, int nsbx, int row0,
                          int row1) {
  Encoder* e = (Encoder*)h;
  for (int r = row0; r < row1; r++) {
    for (int c = 0; c < nsbx; c++) {
      int ctx = 0;
      if (c > 0) {
        ctx = levels[(int64_t)r * nsbx + c - 1];
      } else if (r > row0) {
        ctx = levels[(int64_t)(r - 1) * nsbx + c];
      }
      enc_cdf_adapt32(e, levels[(int64_t)r * nsbx + c],
                      level_cdf + 4 * ctx, 4, inc);
    }
  }
}

// Batched per-SB dering flag coding for one tile's rows (the Python
// per-symbol loop costs ~10 ms/frame at 1080p).  Context = (up, left)
// neighbor flags, cut at the tile top (intra.py _dering_pass).
void dtpu_dering_flags_enc(void* h, int32_t* clpf_cdf, int inc,
                           const int32_t* flags, int nhsb, int row0,
                           int row1) {
  Encoder* e = (Encoder*)h;
  for (int sby = row0; sby < row1; sby++) {
    for (int sbx = 0; sbx < nhsb; sbx++) {
      int up = sby > row0 ? flags[(int64_t)(sby - 1) * nhsb + sbx] : 0;
      int left = sbx > 0 ? flags[(int64_t)sby * nhsb + sbx - 1] : 0;
      int32_t* cdf = clpf_cdf + 2 * ((up << 1) + left);
      enc_cdf_adapt32(e, flags[(int64_t)sby * nhsb + sbx], cdf, 2, inc);
    }
  }
}

void dtpu_decode_codeword(void* h, int32_t* k1_cdf_row, int k1_inc,
                          int64_t* pvq_adapt_row, int64_t* y, int n,
                          int k, int noref, int bs) {
  Decoder* d = (Decoder*)h;
  for (int i = 0; i < n; i++) y[i] = 0;
  if (k == 1 && n < 16) {
    int nn = n - (noref ? 0 : 1);
    int pos = dec_cdf_adapt32(d, k1_cdf_row, nn, k1_inc);
    y[pos] = dtpu_dec_bits((void*)d, 1) ? -1 : 1;
  } else {
    int64_t curr[4] = {0, 0, 0, 0};
    laplace_decode_vector_c(d, y, n - (noref ? 0 : 1), k, curr,
                            pvq_adapt_row);
    merge_adapt_c(pvq_adapt_row, curr, 5);
  }
}

}  // extern "C"

// ====================================================================
// Inter-frame tile symbol walk + batched PVQ synthesis.
//
// The Python inter pipeline (pipeline/inter.py) splits a P/B frame
// into:   (1) a batched band SEARCH prepass (dtpu_pvq_theta_batch),
//         (2) a strictly sequential SYMBOL pass per tile,
//         (3) a batched reconstruction.
// This section makes (2) one FFI call per tile and provides the shared
// batched synthesis used by BOTH encoder and decoder, so float
// reconstruction is bit-identical by construction (same code, same
// operation order).  Behavioral spec: pvq_encoder.c:645-815 /
// pvq_decoder.c:311-387 / od_block_encode encode.c:1066-1285, as
// restructured in pipeline/inter.py + pvq/coding.py.
// ====================================================================

namespace {

// Band layout (OD_BAND_OFFSETS*, partition.c:77-90).
const int BNB[4] = {1, 4, 7, 9};
const int BOFFS[4][10] = {
    {1, 16, 0, 0, 0, 0, 0, 0, 0, 0},
    {1, 16, 24, 32, 64, 0, 0, 0, 0, 0},
    {1, 16, 24, 32, 64, 96, 128, 256, 0, 0},
    {1, 16, 24, 32, 64, 96, 128, 256, 384, 512},
};
const int NCODED[4] = {16, 64, 256, 512};
const double QM1 = 1.0 / 32767.0;
const double QMI1 = 1.0 / 4096.0;
const double CSC = 256 * 16;
const double CSC1 = 1.0 / (256 * 16);

inline int qm_idx(int bs, int band) {
  return bs * (bs + 1) + band - band / 3;
}

inline double band_beta(int use_masking, int pli) {
  return (use_masking && pli == 0) ? 1.5 : 1.0;
}

// Companded gain of a coding-order vector (od_pvq_compute_gain,
// pvq.c:422-474).  MUST keep the exact expression order used in
// dtpu_pvq_theta so encoder search, encoder walk, decoder walk and
// synthesis all agree bit-for-bit.
inline double band_cgr(const int32_t* r0, const int32_t* qm, int n,
                       int q0, double beta, double* gr_out) {
  double gr = 0;
  for (int i = 0; i < n; i++) {
    double ri = (double)r0[i] * qm[i] * QM1;
    gr += ri * ri;
  }
  gr = std::sqrt(gr);
  *gr_out = gr;
  double cgr = beta == 1 ? gr / q0
                         : CSC * std::pow(gr * CSC1, 1.0 / beta) / q0;
  return cgr;
}

inline double gain_expand_c(double cg, int q0, double beta) {
  if (beta == 1) return cg * q0;
  if (beta == 1.5) {
    cg *= q0 * CSC1;
    return CSC * cg * std::sqrt(cg);
  }
  return CSC * std::pow(cg * q0 * CSC1, beta);
}

inline int neg_interleave_c(int x, int ref) {
  if (x < ref) return -2 * (x - ref) - 1;
  if (x < 2 * ref) return 2 * (x - ref);
  return x - 1;
}

inline int neg_deinterleave_c(int x, int ref) {
  if (x < 2 * ref - 1) {
    if (x & 1) return ref - 1 - (x >> 1);
    return ref + (x >> 1);
  }
  return x + 1;
}

inline int rdo_quant_c(int x, int q, double delta0, double lambda) {
  int t = (int)(256 * lambda * delta0 / 2);
  if (t < 0) t = 0;
  if (t > 128) t = 128;
  int threshold = 128 + t;
  int ax = x < 0 ? -x : x;
  if (ax < q * threshold / 256) return 0;
  if (x < 0) return -((-x + (q >> 1)) / q);
  return (x + (q >> 1)) / q;
}

}  // namespace

// ---- integer-spec (dres mode) helpers: pvq/isynth.py twins ----------
extern "C" int64_t dtpu_isqrt64(int64_t v);
extern "C" int64_t dtpu_sin_q15(const int64_t* lut, int64_t u_q16);
extern "C" void dtpu_isynth_noref(const int64_t* y, const int64_t* qg,
                                  int B, int n, int64_t q0,
                                  const int64_t* qm_inv, int32_t* out);
extern "C" void dtpu_isynth_ref(const int64_t* y, const int64_t* rq_q4,
                                const int64_t* gr_q8,
                                const int64_t* goff_q8,
                                const int64_t* qg, const int64_t* itheta,
                                int B, int n, int64_t q0,
                                const int64_t* qm_inv,
                                const int64_t* sin_lut, int32_t* out);

// Quarter-wave sine LUT (format constants, registered from Python so
// libm drift cannot silently change the stream format).
static int64_t g_sin_lut[257];
extern "C" void dtpu_set_sin_lut(const int64_t* lut) {
  memcpy(g_sin_lut, lut, sizeof(g_sin_lut));
}

namespace {

// Integer k rule (isynth.icompute_k): slope is exact because sqrt is
// correctly rounded and *65536 is a power-of-two scale.
inline int icompute_k_c(int n, int noref, int64_t v) {
  if (v <= 0) return 0;
  int add = noref ? 3 : 2;
  int64_t slope =
      (int64_t)std::llround(std::sqrt((double)((n + add) / 2)) * 65536.0);
  int64_t k = (v * slope - slope / 5 + ((int64_t)1 << 15)) >> 16;
  return k < 1 ? 1 : (int)k;
}

// One band's integer-spec synthesis incl. the skip rules — the dres
// replacement of the float band synthesis below.  y is the codeword
// (n entries noref, n-1 entries ref with the axis position excluded).
void isynth_band_c(const int32_t* r0, const int32_t* qm,
                   const int32_t* qmi, const int32_t* y, int n, int qg,
                   int itheta, int noref, int q0, int is_keyframe,
                   int pli, int32_t* out) {
  int64_t y64[128], qmi64[128];
  for (int i = 0; i < n; i++) qmi64[i] = qmi[i];
  if (noref) {
    if (qg <= 0) {
      for (int i = 0; i < n; i++) out[i] = 0;
      return;
    }
    for (int i = 0; i < n; i++) y64[i] = y[i];
    int64_t qg64 = qg;
    dtpu_isynth_noref(y64, &qg64, 1, n, q0, qmi64, out);
    return;
  }
  int cfl = is_keyframe && pli != 0;
  int64_t rq_q4[128];
  int64_t ss = 0;
  for (int i = 0; i < n; i++) {
    rq_q4[i] = ((int64_t)r0[i] * qm[i] + ((int64_t)1 << 10)) >> 11;
    ss += rq_q4[i] * rq_q4[i];
  }
  int64_t gr_q8 = dtpu_isqrt64(ss << 8);
  int64_t cgr_q8 = gr_q8 / q0;
  if (cfl) cgr_q8 = 256;
  int64_t icgr = (cgr_q8 + 128) >> 8;
  int64_t goff_q8 = cgr_q8 - (icgr << 8);
  int skip = 0;
  if (!is_keyframe && qg == 0) skip = icgr ? 1 : 2;
  if (qg == icgr && itheta == 0 && !cfl) skip = 2;
  if (skip == 2) {
    for (int i = 0; i < n; i++) out[i] = r0[i];
    return;
  }
  if (skip == 1) {
    for (int i = 0; i < n; i++) out[i] = 0;
    return;
  }
  int m = 0;
  int64_t mabs = -1;
  for (int i = 0; i < n; i++) {
    int64_t a = rq_q4[i] < 0 ? -rq_q4[i] : rq_q4[i];
    if (a > mabs) { mabs = a; m = i; }
  }
  for (int i = 0; i < m; i++) y64[i] = y[i];
  y64[m] = 0;
  for (int i = m + 1; i < n; i++) y64[i] = y[i - 1];
  int64_t qg64 = qg, it64 = itheta;
  dtpu_isynth_ref(y64, rq_q4, &gr_q8, &goff_q8, &qg64, &it64, 1, n, q0,
                  qmi64, g_sin_lut, out);
}

}  // namespace

// Batched synthesis of PVQ bands (od_pvq_synthesis_partial pvq.c:552 +
// the skip rules of pvq_encoder.c:718-813 / pvq_decoder.c:311-387).
// Inputs are per band; qg is in the TRUE (decoded) domain.  Used by
// both sides so reconstruction is identical by construction.
// isynth != 0 selects the integer-spec synthesis (dres stream mode).
extern "C" int dtpu_pvq_synth_batch(
    int nb, const int32_t* offsets, const int32_t* r0s,
    const int32_t* qms, const int32_t* qm_invs, const int32_t* ys,
    const int32_t* qgs, const int32_t* ithetas, const int32_t* norefs,
    const int32_t* q0s, const double* betas, int is_keyframe,
    const int32_t* plis, int32_t* outs, int isynth) {
  for (int b = 0; b < nb; b++) {
    int lo = offsets[b];
    int n = offsets[b + 1] - lo;
    const int32_t* r0 = r0s + lo;
    const int32_t* qm = qms + lo;
    const int32_t* qmi = qm_invs + lo;
    const int32_t* y = ys + lo;
    int32_t* out = outs + lo;
    int qg = qgs[b], itheta = ithetas[b], noref = norefs[b];
    int q0 = q0s[b];
    if (isynth) {
      isynth_band_c(r0, qm, qmi, y, n, qg, itheta, noref, q0,
                    is_keyframe, plis[b], out);
      continue;
    }
    double beta = betas[b];
    int cfl = is_keyframe && plis[b] != 0;
    double gr = 0, cgr = 0, gain_offset = 0;
    int icgr = 0;
    if (!noref) {
      cgr = band_cgr(r0, qm, n, q0, beta, &gr);
      if (cfl) cgr = 1.0;
      icgr = (int)std::floor(.5 + cgr);
      gain_offset = cgr - icgr;
    }
    int skip = 0;
    if (noref) {
      if (qg == 0) skip = 1;  // SKIP_ZERO
    } else {
      if (!is_keyframe && qg == 0) skip = icgr ? 1 : 2;
      if (qg == icgr && itheta == 0 && !cfl) skip = 2;  // SKIP_COPY
    }
    if (skip == 2) {
      for (int i = 0; i < n; i++) out[i] = r0[i];
      continue;
    }
    if (skip == 1) {
      for (int i = 0; i < n; i++) out[i] = 0;
      continue;
    }
    double go = noref ? 0.0 : gain_offset;
    double g = gain_expand_c(qg + go, q0, beta);
    double theta = 0;
    double rr[128];
    int m = 0, s = 1;
    if (!noref) {
      int ts = compute_max_theta(qg + gain_offset, beta);
      theta = compute_theta_v(itheta, ts);
      double maxr = 0;
      for (int i = 0; i < n; i++) {
        rr[i] = (double)r0[i] * qm[i] * QM1;
        double a = std::fabs(rr[i]);
        if (a > maxr) { maxr = a; m = i; }
      }
      // argmax-first semantics (np.argmax): strictly-greater keeps the
      // FIRST maximum, matching the loop above.
      s = rr[m] > 0 ? 1 : -1;
      rr[m] += gr * s;
    }
    int yn = noref ? n : n - 1;
    int64_t yy = 0;
    for (int i = 0; i < yn; i++) yy += (int64_t)y[i] * y[i];
    double scale = yy == 0 ? 0.0 : g / std::sqrt((double)yy);
    double x[128];
    if (noref) {
      for (int i = 0; i < n; i++) x[i] = y[i] * scale;
    } else {
      scale *= std::sin(theta);
      for (int i = 0; i < m; i++) x[i] = y[i] * scale;
      x[m] = -s * g * std::cos(theta);
      for (int i = m + 1; i < n; i++) x[i] = y[i - 1] * scale;
      double l2r = 0, proj = 0;
      for (int i = 0; i < n; i++) l2r += rr[i] * rr[i];
      for (int i = 0; i < n; i++) proj += rr[i] * x[i];
      double p2 = 2.0 * proj / (1e-100 + l2r);
      for (int i = 0; i < n; i++) x[i] -= rr[i] * p2;
    }
    for (int i = 0; i < n; i++) {
      out[i] = (int32_t)std::floor(.5 + x[i] * (qmi[i] * QMI1));
    }
  }
  return 0;
}

// -- the walk context (mirrored by a ctypes.Structure in
// pvq/native_walk.py; field order/types must match exactly). ----------

struct DtpuWalkCtx {
  // adaptation state (in-place numpy buffers, one tile's AdaptState)
  int32_t* skip_cdf;       // (8,5)
  int32_t* gaintheta_cdf;  // (72,16)
  int32_t* skip_dir_cdf;   // (6,7)
  int32_t* k1_cdf;         // (4,16)
  int64_t* pvq_adapt;      // (8,4)
  int64_t* exg;            // (4,4,9)
  int64_t* ext;            // (36,)
  int32_t* pm_cdf0;        // param models, (12,16) each
  int32_t* pm_cdf1;
  int32_t* pm_cdf2;
  int32_t* dc_cdf[4];      // model_dc per plane (12,16)
  int64_t* ex_dc;          // (nplanes,4,3)
  int32_t skip_inc, gt_inc, sd_inc, k1_inc, pm_inc, dc_inc;
  // frame structure
  int8_t* grid;            // luma 4x4 cells (h4, w4)
  int32_t h4, w4;
  int32_t nplanes;
  int32_t nhsb, row0, row1;
  int32_t xdec[4];
  int32_t q0;              // frame quantizer, already max(1,.)
  int32_t use_masking;
  double lambda;
  int32_t* pvq_qm[4];      // per plane (20,)
  const int32_t* qm[4];     // magnitude QM per block size (ncoded,)
  const int32_t* qm_inv[4];
  const int32_t* predt[4][4];  // [pli][bs] -> (bh, bw, ncoded)
  int32_t predt_w[4][4];
  // encoder inputs (indexed by leaf slot)
  const int32_t* leaf_slot[4];  // per plane (plane cells), -1 = none
  const int32_t* e_band_start;
  const int32_t* e_dc0;
  const int32_t* b_qg;          // per band, TRUE domain
  const int32_t* b_itheta;
  const int32_t* b_max_theta;
  const int32_t* b_k;
  const int32_t* b_noref;
  const double* b_skip_diff;
  const int32_t* b_y;           // flattened, band offsets
  const int32_t* b_yoff;        // per band start into b_y
  // encoder outputs (per leaf slot)
  int32_t* o_dc;
  uint8_t* o_acskip;
  uint8_t* o_bskip;
  // decoder outputs (append order)
  int32_t* d_leaf_pli;
  int32_t* d_leaf_bs;
  int32_t* d_leaf_cy;  // plane 4x4-cell coords
  int32_t* d_leaf_cx;
  int32_t* d_leaf_dc;
  uint8_t* d_leaf_acskip;
  uint8_t* d_leaf_bskip;
  int32_t* d_b_qg;     // TRUE domain
  int32_t* d_b_itheta;
  int32_t* d_b_noref;
  int32_t* d_b_k;
  int32_t* d_b_q;      // band quantizer (for synthesis)
  int32_t* d_y;        // flattened (band offsets implied by leaf bs)
  int64_t n_leaves, n_bands, y_len;
  // device-residual mode: bands are noref residuals with the integer
  // synthesis spec; the per-band ref is the zero vector.
  int32_t dres;
  // plain-DC mode (device-emitted symbols): e_dc0 holds the already
  // quantized DC RESIDUAL INDEX per leaf; the walk codes it verbatim
  // instead of running the RDO deadzone quantizer (rdo_quant_c), so
  // the DC decision replicates the device encode pipeline exactly.
  int32_t plain_dc;
};

namespace {

// Scoped adaptation snapshot for the whole-block skip rollback
// (_snapshot_block_state: PvqAdapt + skip_cdf).  Saves ONLY the CDF
// rows and expectation cells the trial region of one leaf can mutate
// (~1-2 KB) instead of the whole adaptation context (~9 KB) — the
// per-leaf memcpy was the dominant cost of the symbol walks at 1080p.
// Row selection facts this relies on:
//  * enc_cdf_adapt32 mutates exactly the row it is handed;
//  * generic_encode_c mutates exactly row min(log_ex(ex), 11) of the
//    model it is handed, with ex read from the cell BEFORE the call
//    updates it — so the row is computable at snapshot time;
//  * each band's exg/ext cell is private to that band, so later bands
//    never shift an earlier band's row choice;
//  * dtpu_encode_partition touches (gaintheta row, pm01 row, exg,
//    pm2 row, ext, one k1 row, one pvq_adapt row) and nothing else.
struct ScopedSnap {
  int32_t skip_row[5];
  int32_t skip_dir_row[7];
  int32_t k1_cdf[4 * 16];
  int32_t gt_rows[9][16];
  int32_t pm01_rows[9][16];
  int32_t pm2_rows[9][16];
  int32_t* pm01_ptr[9];
  int32_t* pm2_ptr[9];
  int64_t exg[9], ext[9];
  int64_t pvq_adapt[2][4];
  int nb, pli, bs;
};

template <typename CTX>
inline void scoped_save(CTX* c, ScopedSnap* s, int pli, int bs, int nb,
                        const int* noref) {
  s->nb = nb;
  s->pli = pli;
  s->bs = bs;
  memcpy(s->skip_row, c->skip_cdf + 5 * (2 * bs + (pli ? 1 : 0)),
         sizeof(s->skip_row));
  if (bs > 0) {
    memcpy(s->skip_dir_row,
           c->skip_dir_cdf + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)),
           sizeof(s->skip_dir_row));
  }
  memcpy(s->k1_cdf, c->k1_cdf, sizeof(s->k1_cdf));
  memcpy(s->pvq_adapt[0], c->pvq_adapt + 4 * (2 * bs),
         sizeof(s->pvq_adapt[0]));
  memcpy(s->pvq_adapt[1], c->pvq_adapt + 4 * (2 * bs + 1),
         sizeof(s->pvq_adapt[1]));
  int base_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9;
  for (int i = 0; i < nb; i++) {
    memcpy(s->gt_rows[i], c->gaintheta_cdf + 16 * (base_ctx + i),
           sizeof(s->gt_rows[i]));
    int64_t eg = c->exg[((int64_t)pli * 4 + bs) * 9 + i];
    int64_t et = c->ext[bs * 9 + i];
    s->exg[i] = eg;
    s->ext[i] = et;
    int lg_g = log_ex_c(eg);
    int32_t* pm01 = (noref[i] ? c->pm_cdf0 : c->pm_cdf1)
        + 16 * (lg_g < 11 ? lg_g : 11);
    s->pm01_ptr[i] = pm01;
    memcpy(s->pm01_rows[i], pm01, sizeof(s->pm01_rows[i]));
    int lg_t = log_ex_c(et);
    int32_t* pm2 = c->pm_cdf2 + 16 * (lg_t < 11 ? lg_t : 11);
    s->pm2_ptr[i] = pm2;
    memcpy(s->pm2_rows[i], pm2, sizeof(s->pm2_rows[i]));
  }
}

template <typename CTX>
inline void scoped_restore(CTX* c, const ScopedSnap* s) {
  int pli = s->pli, bs = s->bs;
  memcpy(c->skip_cdf + 5 * (2 * bs + (pli ? 1 : 0)), s->skip_row,
         sizeof(s->skip_row));
  if (bs > 0) {
    memcpy(c->skip_dir_cdf + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)),
           s->skip_dir_row, sizeof(s->skip_dir_row));
  }
  memcpy(c->k1_cdf, s->k1_cdf, sizeof(s->k1_cdf));
  memcpy(c->pvq_adapt + 4 * (2 * bs), s->pvq_adapt[0],
         sizeof(s->pvq_adapt[0]));
  memcpy(c->pvq_adapt + 4 * (2 * bs + 1), s->pvq_adapt[1],
         sizeof(s->pvq_adapt[1]));
  int base_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9;
  for (int i = 0; i < s->nb; i++) {
    memcpy(c->gaintheta_cdf + 16 * (base_ctx + i), s->gt_rows[i],
           sizeof(s->gt_rows[i]));
    c->exg[((int64_t)pli * 4 + bs) * 9 + i] = s->exg[i];
    c->ext[bs * 9 + i] = s->ext[i];
    memcpy(s->pm01_ptr[i], s->pm01_rows[i], sizeof(s->pm01_rows[i]));
    memcpy(s->pm2_ptr[i], s->pm2_rows[i], sizeof(s->pm2_rows[i]));
  }
}

int32_t* pm_of(DtpuWalkCtx* c, int i) {
  return i == 0 ? c->pm_cdf0 : (i == 1 ? c->pm_cdf1 : c->pm_cdf2);
}

// Encoder leaf (pvq_encode_block + the DC tail of _code_inter_block).
void enc_leaf_inter(Encoder* e, DtpuWalkCtx* c, int pli, int bs, int bsi,
                    int bx, int by) {
  int xdec = c->xdec[pli];
  int cy = (by << bsi) >> xdec;
  int cx = (bx << bsi) >> xdec;
  int w4p = c->w4 >> xdec;
  int slot = c->leaf_slot[pli][(int64_t)cy * w4p + cx];
  int nb = BNB[bs];
  int ncoded = NCODED[bs];
  int bw = c->predt_w[pli][bs];
  const int32_t* predt = c->predt[pli][bs]
      + ((int64_t)(cy >> bs) * bw + (cx >> bs)) * ncoded;
  const int32_t* pvq_qm = c->pvq_qm[pli];
  int32_t* skip_row = c->skip_cdf + 5 * (2 * bs + (pli ? 1 : 0));
  int nsym = 4 + ((pli == 0 && bs > 0) ? 1 : 0);
  int s0 = c->e_band_start[slot];
  int q0 = c->q0;
  int dc_quant = q0 * pvq_qm[qm_idx(bs, 0)] >> 4;
  if (dc_quant < 1) dc_quant = 1;
  int dc0, out0;
  if (c->plain_dc) {
    dc0 = 0;
    out0 = c->e_dc0[slot];
  } else {
    double dc_rate = -std::log2((double)(skip_row[1] - skip_row[0])
                                / skip_row[0]);
    dc0 = c->e_dc0[slot] - predt[0];
    out0 = rdo_quant_c(dc0, dc_quant, dc_rate, c->lambda);
  }
  // per-band coded-domain gains (need icgr per band) — pure
  // computation, hoisted above the trial region so nbeff is known
  // before any symbol is coded.
  int qgc[9];
  int noref_arr[9];
  double beta = band_beta(c->use_masking, pli);
  for (int i = 0; i < nb; i++) {
    int lo = BOFFS[bs][i];
    int bn = BOFFS[bs][i + 1] - lo;
    int q = q0 * pvq_qm[qm_idx(bs, i + 1)] >> 4;
    if (q < 1) q = 1;
    int bqg = c->b_qg[s0 + i];
    noref_arr[i] = c->b_noref[s0 + i];
    if (c->b_noref[s0 + i]) {
      qgc[i] = bqg - 1;
    } else if (c->dres) {
      // dres: the band ref is the zero vector -> icgr == 0 exactly.
      qgc[i] = neg_interleave_c(bqg + 1, 1);
      (void)lo; (void)bn; (void)q;
    } else {
      double gr;
      double cgr = band_cgr(predt + lo, c->qm[bs] + lo, bn, q, beta, &gr);
      int icgr = (int)std::floor(.5 + cgr);
      qgc[i] = neg_interleave_c(bqg + 1, icgr + 1);
    }
  }
  // skip_rest / skip_dir (skip_theta_value = 0 for inter)
  int skip_rest = 1;
  for (int i = 1; i < nb; i++) {
    if (c->b_itheta[s0 + i] != 0 || qgc[i]) skip_rest = 0;
  }
  int skip_dir = 0;
  if (nb > 1) {
    for (int i = 0; i < 3; i++) {
      int tmp = 1;
      for (int j = i + 1; j < nb; j += 3) {
        if (c->b_itheta[s0 + j] != 0 || qgc[j]) tmp = 0;
      }
      skip_dir |= tmp << i;
    }
  }
  int nbeff = nb;
  if (c->b_itheta[s0] == 0 && qgc[0] == 0 && skip_rest) nbeff = 0;
  double skip_diff = 0;
  for (int i = 0; i < nb; i++) skip_diff += c->b_skip_diff[s0 + i];
  int acskip = 0;
  if (nbeff == 0) {
    // All bands skip: the acskip branch below is taken
    // unconditionally, so code only the final skip symbol — no EC
    // checkpoint, no adaptation snapshot.  Bit-identical to the trial
    // path: with nbeff == 0 the trial codes exactly one skip symbol
    // and rolls it back; the !plain_dc DC re-quantization reads the
    // skip_row AS UPDATED by that trial symbol, replicated here on a
    // local copy.
    if (!c->plain_dc) {
      int32_t tmp5[5];
      memcpy(tmp5, skip_row, sizeof(int32_t) * nsym);
      adapt_cdf32(tmp5, nsym, out0 != 0 ? 1 : 0, c->skip_inc);
      double dcr2 = -std::log2((double)(tmp5[3] - tmp5[2])
                               / (tmp5[2] - tmp5[1]));
      out0 = rdo_quant_c(dc0, dc_quant, dcr2, c->lambda);
    }
    enc_cdf_adapt32(e, 2 + (out0 != 0 ? 1 : 0), skip_row, nsym,
                    c->skip_inc);
    acskip = 1;
  } else {
    // Whole-block-skip RDO can never fire when skip_diff is rigged to
    // +inf-like values (the device-symbol pack: skipping a nonzero
    // residual is never cheaper) — skip the per-leaf checkpoint +
    // scoped adaptation snapshot (~2 KB of memcpy per leaf, a
    // measurable share of the 1080p pack) and code straight through.
    int no_rdo = skip_diff >= 1e29;
    int64_t chk[7];
    ScopedSnap snap;
    int tell0 = 0;
    if (!no_rdo) {
      dtpu_enc_checkpoint(e, chk);
      scoped_save(c, &snap, pli, bs, nb, noref_arr);
      tell0 = dtpu_enc_tell_frac(e);
    }
    enc_cdf_adapt32(e, out0 != 0 ? 1 : 0, skip_row, nsym, c->skip_inc);
    for (int i = 0; i < nbeff; i++) {
      if (i == 0 || (!skip_rest && !(skip_dir & (1 << ((i - 1) % 3))))) {
        int lo = BOFFS[bs][i];
        int bn = BOFFS[bs][i + 1] - lo;
        int noref = c->b_noref[s0 + i];
        int k = c->b_k[s0 + i];
        int cdf_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9 + i;
        int code_skip = (i == 0 && i < nbeff - 1) ? 1 : 0;
        int64_t y64[128];
        const int32_t* yb = c->b_y + c->b_yoff[s0 + i];
        for (int t = 0; t < bn; t++) y64[t] = yb[t];
        dtpu_encode_partition(
            e, c->gaintheta_cdf + 16 * cdf_ctx, 8 + 7 * code_skip,
            c->gt_inc, pm_of(c, noref ? 0 : 1), c->pm_inc,
            c->exg + ((int64_t)pli * 4 + bs) * 9 + i,
            c->ext + bs * 9 + i, c->pm_cdf2,
            c->k1_cdf + 16 * (2 * (bn == 15) + (noref ? 0 : 1)),
            c->k1_inc,
            c->pvq_adapt + 4 * (2 * bs + (noref ? 1 : 0)), y64, bn, k,
            qgc[i], c->b_itheta[s0 + i], c->b_max_theta[s0 + i],
            /*nodesync=*/1, /*is_keyframe=*/0, code_skip, skip_rest, bs);
      }
      if (i == 0 && !skip_rest && bs > 0) {
        enc_cdf_adapt32(e, skip_dir,
                        c->skip_dir_cdf
                            + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)),
                        7, c->sd_inc);
      }
    }
    if (!no_rdo) {
      int tell = dtpu_enc_tell_frac(e) - tell0;
      int sf = 2 + (out0 != 0 ? 1 : 0);
      double skip_rate = -std::log2(
          (double)(skip_row[sf] - skip_row[sf - 1]) / skip_row[nsym - 1]);
      tell -= (int)std::floor(.5 + 8 * skip_rate);
      if (skip_diff <= c->lambda / 8 * tell) {
        if (!c->plain_dc) {
          double dcr2 = -std::log2((double)(skip_row[3] - skip_row[2])
                                   / (skip_row[2] - skip_row[1]));
          out0 = rdo_quant_c(dc0, dc_quant, dcr2, c->lambda);
        }
        dtpu_enc_rollback(e, chk);
        scoped_restore(c, &snap);
        enc_cdf_adapt32(e, 2 + (out0 != 0 ? 1 : 0), skip_row, nsym,
                        c->skip_inc);
        acskip = 1;
      }
    }
  }
  if (out0) {
    int64_t* exdc = c->ex_dc + ((int64_t)pli * 4 + bs) * 3;
    int v = out0 < 0 ? -out0 : out0;
    *exdc = generic_encode_c(e, c->dc_cdf[pli], c->dc_inc, v - 1, -1,
                             *exdc, 2);
    enc_bits(e, out0 < 0 ? 1u : 0u, 1);
  }
  c->o_dc[slot] = out0 * dc_quant + predt[0];
  c->o_acskip[slot] = (uint8_t)acskip;
  c->o_bskip[slot] = (uint8_t)(acskip && out0 == 0);
}

// Decoder leaf (pvq_decode_block + the DC tail), appending results.
void dec_leaf_inter(Decoder* d, DtpuWalkCtx* c, int pli, int bs, int bsi,
                    int bx, int by, int sk) {
  int xdec = c->xdec[pli];
  int cy = (by << bsi) >> xdec;
  int cx = (bx << bsi) >> xdec;
  int nb = BNB[bs];
  int ncoded = NCODED[bs];
  int bw = c->predt_w[pli][bs];
  const int32_t* predt = c->predt[pli][bs]
      + ((int64_t)(cy >> bs) * bw + (cx >> bs)) * ncoded;
  const int32_t* pvq_qm = c->pvq_qm[pli];
  int q0 = c->q0;
  int dc_quant = q0 * pvq_qm[qm_idx(bs, 0)] >> 4;
  if (dc_quant < 1) dc_quant = 1;
  int out0flag = sk & 1;
  int acskip = sk >> 1;
  double beta = band_beta(c->use_masking, pli);
  if (!acskip) {
    int skip_rest[3] = {0, 0, 0};
    for (int i = 0; i < nb; i++) {
      int lo = BOFFS[bs][i];
      int bn = BOFFS[bs][i + 1] - lo;
      int q = q0 * pvq_qm[qm_idx(bs, i + 1)] >> 4;
      if (q < 1) q = 1;
      int qg = 0, itheta = 0, noref = 0;
      if (!skip_rest[(i + 2) % 3]) {
        int has_skip = (i == 0 && i < nb - 1) ? 1 : 0;
        int cdf_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9 + i;
        int pid = dec_cdf_adapt32(d, c->gaintheta_cdf + 16 * cdf_ctx,
                                  8 + 7 * has_skip, c->gt_inc);
        if (pid >= 10) pid += 1;  // inter: pid 10 impossible
        if (pid >= 8) {
          pid -= 8;
          skip_rest[0] = skip_rest[1] = skip_rest[2] = 1;
        }
        qg = pid & 1;
        itheta = (pid >> 1) - 1;
        noref = itheta == -1 ? 1 : 0;
      }
      if (qg > 0) {
        int64_t* exg = c->exg + ((int64_t)pli * 4 + bs) * 9 + i;
        int v;
        generic_decode_c(d, pm_of(c, noref ? 0 : 1), c->pm_inc, -1, *exg,
                         2, &v);
        qg = 1 + v;
        *exg += (((int64_t)qg << 16) - *exg) >> 2;
      }
      double qcg;
      if (!noref) {
        double gr;
        double cgr = c->dres ? 0.0
            : band_cgr(predt + lo, c->qm[bs] + lo, bn, q, beta, &gr);
        int icgr = (int)std::floor(.5 + cgr);
        qg = neg_deinterleave_c(qg, icgr + 1) - 1;
        double gain_offset = cgr - icgr;
        qcg = qg + gain_offset;
        if (itheta > 1) {  // nodesync: max_theta unconstrained
          int64_t* ext = c->ext + bs * 9 + i;
          int v;
          generic_decode_c(d, c->pm_cdf2, c->pm_inc, -1, *ext, 2, &v);
          itheta = 2 + v;
          *ext += (((int64_t)itheta << 16) - *ext) >> 2;
        }
      } else {
        itheta = 0;
        qg += 1;  // inter
        qcg = (double)qg;
      }
      int k = c->dres
          ? icompute_k_c(bn, noref, noref ? qg : itheta)
          : compute_k_v(qcg, noref ? -1 : itheta, 0.0, noref, bn, beta,
                        /*nodesync=*/1);
      int64_t yi = c->y_len;
      int64_t y64[128];
      for (int t = 0; t < bn; t++) y64[t] = 0;
      if (k != 0) {
        dtpu_decode_codeword(
            d, c->k1_cdf + 16 * (2 * (bn == 15) + (noref ? 0 : 1)),
            c->k1_inc, c->pvq_adapt + 4 * (2 * bs + (noref ? 1 : 0)),
            y64, bn, k, noref, bs);
      }
      for (int t = 0; t < bn; t++) c->d_y[yi + t] = (int32_t)y64[t];
      c->y_len += bn;
      int64_t B = c->n_bands++;
      c->d_b_qg[B] = qg;
      c->d_b_itheta[B] = noref ? -1 : itheta;
      c->d_b_noref[B] = noref;
      c->d_b_k[B] = k;
      c->d_b_q[B] = q;
      if (i == 0 && !skip_rest[0] && bs > 0) {
        int sd = dec_cdf_adapt32(
            d, c->skip_dir_cdf + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)), 7,
            c->sd_inc);
        for (int j = 0; j < 3; j++) skip_rest[j] = (sd >> j) & 1;
      }
    }
  }
  int dc = 0;
  if (out0flag) {
    int64_t* exdc = c->ex_dc + ((int64_t)pli * 4 + bs) * 3;
    int v;
    *exdc = generic_decode_c(d, c->dc_cdf[pli], c->dc_inc, -1, *exdc, 2,
                             &v);
    dc = 1 + v;
    if (dtpu_dec_bits((void*)d, 1)) dc = -dc;
  }
  int64_t L = c->n_leaves++;
  c->d_leaf_pli[L] = pli;
  c->d_leaf_bs[L] = bs;
  c->d_leaf_cy[L] = cy;
  c->d_leaf_cx[L] = cx;
  c->d_leaf_dc[L] = dc * dc_quant + predt[0];
  c->d_leaf_acskip[L] = (uint8_t)(acskip != 0);
  c->d_leaf_bskip[L] = (uint8_t)(acskip != 0 && out0flag == 0);
}

// Z-order recursion with split/skip signaling (_inter_recursive).
void walk_rec_inter(void* ec, DtpuWalkCtx* c, int pli, int bx, int by,
                    int bsi, int encoder) {
  int xdec = c->xdec[pli];
  int cy = by << bsi;
  int cx = bx << bsi;
  if (pli == 0) {
    if (encoder) {
      int obs = c->grid[(int64_t)cy * c->w4 + cx];
      if (obs == bsi) {
        enc_leaf_inter((Encoder*)ec, c, 0, bsi, bsi, bx, by);
        return;
      }
      enc_cdf_adapt32((Encoder*)ec, 4, c->skip_cdf + 5 * (2 * bsi), 5,
                      c->skip_inc);
    } else {
      int nsym = 4 + (bsi > 0 ? 1 : 0);
      int sk = dec_cdf_adapt32((Decoder*)ec, c->skip_cdf + 5 * (2 * bsi),
                               nsym, c->skip_inc);
      if (sk < 4) {
        int span = 1 << bsi;
        for (int yy = 0; yy < span; yy++) {
          memset(c->grid + (int64_t)(cy + yy) * c->w4 + cx, bsi, span);
        }
        dec_leaf_inter((Decoder*)ec, c, 0, bsi, bsi, bx, by, sk);
        return;
      }
    }
  } else {
    int obs = c->grid[(int64_t)cy * c->w4 + cx];
    int eff = obs > xdec ? obs : xdec;
    if (eff == bsi) {
      int bs = bsi - xdec;
      if (encoder) {
        enc_leaf_inter((Encoder*)ec, c, pli, bs, bsi, bx, by);
      } else {
        int sk = dec_cdf_adapt32((Decoder*)ec,
                                 c->skip_cdf + 5 * (2 * bs + 1), 4,
                                 c->skip_inc);
        dec_leaf_inter((Decoder*)ec, c, pli, bs, bsi, bx, by, sk);
      }
      return;
    }
  }
  for (int dy = 0; dy < 2; dy++) {
    for (int dx = 0; dx < 2; dx++) {
      walk_rec_inter(ec, c, pli, 2 * bx + dx, 2 * by + dy, bsi - 1,
                     encoder);
    }
  }
}

}  // namespace

extern "C" int dtpu_inter_walk(void* ec, DtpuWalkCtx* c, int encoder) {
  c->n_leaves = 0;
  c->n_bands = 0;
  c->y_len = 0;
  for (int sby = c->row0; sby < c->row1; sby++) {
    for (int sbx = 0; sbx < c->nhsb; sbx++) {
      for (int pli = 0; pli < c->nplanes; pli++) {
        walk_rec_inter(ec, c, pli, sbx, sby, 3, encoder);
      }
    }
  }
  if (!encoder) return ((Decoder*)ec)->error;
  return 0;
}

// ====================================================================
// Motion-compensation host kernels: batched 6-tap subpel prediction
// and fused subpel-SAD (ops/mc.py subpel_predict_blocks + the SAD
// loops of search/me.py).  Behavioral spec: od_mc_predict1fmv8_c
// (mc.c:94-203) with the set-2 windowed-sinc filters (mc.c:66-78).
// Bit-exact twins of the numpy path (integer ops only).
// ====================================================================

namespace {

const int32_t SUBPEL_F[8][6] = {
    {0, 0, 128, 0, 0, 0},
    {1, -9, 122, 18, -5, 1},
    {3, -15, 112, 37, -11, 2},
    {3, -18, 97, 58, -15, 3},
    {4, -20, 80, 80, -20, 4},
    {3, -15, 58, 97, -18, 3},
    {2, -11, 37, 112, -15, 3},
    {1, -5, 18, 122, -9, 1},
};

template <typename T>
inline void subpel_one(const T* ref, int64_t stride, int64_t iy,
                       int64_t ix, int fy, int fx, int n, int center,
                       int maxv, int32_t* out /* n*n */) {
  if (fy == 0 && fx == 0) {
    for (int r = 0; r < n; r++) {
      const T* src = ref + (iy + r) * stride + ix;
      for (int c = 0; c < n; c++) out[r * n + c] = src[c];
    }
    return;
  }
  // Horizontal pass into (n+5, n) int32, rows from iy-2.
  int32_t h[(64 + 5) * 64];
  const int32_t* fh = SUBPEL_F[fx];
  const int32_t* fv = SUBPEL_F[fy];
  int32_t coff = center << 7;
  for (int r = 0; r < n + 5; r++) {
    const T* src = ref + (iy - 2 + r) * stride + (ix - 2);
    for (int c = 0; c < n; c++) {
      int32_t v = src[c] * fh[0] + src[c + 1] * fh[1] + src[c + 2] * fh[2]
          + src[c + 3] * fh[3] + src[c + 4] * fh[4] + src[c + 5] * fh[5];
      h[r * n + c] = v - coff;
    }
  }
  int32_t add = (1 << 13) + (center << 14);
  for (int r = 0; r < n; r++) {
    for (int c = 0; c < n; c++) {
      int32_t v = h[r * n + c] * fv[0] + h[(r + 1) * n + c] * fv[1]
          + h[(r + 2) * n + c] * fv[2] + h[(r + 3) * n + c] * fv[3]
          + h[(r + 4) * n + c] * fv[4] + h[(r + 5) * n + c] * fv[5];
      v = (v + add) >> 14;
      out[r * n + c] = v < 0 ? 0 : (v > maxv ? maxv : v);
    }
  }
}

template <typename T>
void subpel_blocks_t(const T* ref, int64_t stride, int pad,
                     const int64_t* ys, const int64_t* xs,
                     const int64_t* mvs, int64_t N, int n, int bitdepth,
                     T* out) {
  int center = 128 << (bitdepth - 8);
  int maxv = (1 << bitdepth) - 1;
  auto work = [&](int64_t b0, int64_t b1) {
    int32_t tmp[64 * 64];
    for (int64_t b = b0; b < b1; b++) {
      int64_t mvy = mvs[2 * b], mvx = mvs[2 * b + 1];
      int64_t iy = ys[b] + (mvy >> 3) + pad;
      int64_t ix = xs[b] + (mvx >> 3) + pad;
      subpel_one(ref, stride, iy, ix, (int)(mvy & 7), (int)(mvx & 7), n,
                 center, maxv, tmp);
      T* o = out + b * n * n;
      for (int i = 0; i < n * n; i++) o[i] = (T)tmp[i];
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (N * n * n >= 1 << 16 && hw > 1) ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, N); return; }
  std::vector<std::thread> ts;
  int64_t per = (N + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t b0 = t * per, b1 = b0 + per < N ? b0 + per : N;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& t : ts) t.join();
}

template <typename T>
void subpel_sad_t(const T* ref, int64_t stride, int pad, const T* cur,
                  const int64_t* ys, const int64_t* xs,
                  const int64_t* mvs, const int64_t* cands, int64_t C,
                  int64_t N, int n, int bitdepth, int64_t* out) {
  int center = 128 << (bitdepth - 8);
  int maxv = (1 << bitdepth) - 1;
  auto work = [&](int64_t b0, int64_t b1) {
    int32_t tmp[64 * 64];
    for (int64_t b = b0; b < b1; b++) {
      const T* cb = cur + b * n * n;
      for (int64_t ci = 0; ci < C; ci++) {
        int64_t mvy = mvs[2 * b] + cands[2 * ci];
        int64_t mvx = mvs[2 * b + 1] + cands[2 * ci + 1];
        int64_t iy = ys[b] + (mvy >> 3) + pad;
        int64_t ix = xs[b] + (mvx >> 3) + pad;
        int fy = (int)(mvy & 7), fx = (int)(mvx & 7);
        int64_t sad = 0;
        if (fy == 0 && fx == 0) {
          for (int r = 0; r < n; r++) {
            const T* src = ref + (iy + r) * stride + ix;
            const T* cr = cb + r * n;
            for (int c = 0; c < n; c++) {
              int32_t d = (int32_t)cr[c] - (int32_t)src[c];
              sad += d < 0 ? -d : d;
            }
          }
        } else {
          subpel_one(ref, stride, iy, ix, fy, fx, n, center, maxv, tmp);
          for (int i = 0; i < n * n; i++) {
            int32_t d = (int32_t)cb[i] - tmp[i];
            sad += d < 0 ? -d : d;
          }
        }
        out[b * C + ci] = sad;
      }
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (N * C * n * n >= 1 << 16 && hw > 1)
      ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, N); return; }
  std::vector<std::thread> ts;
  int64_t per = (N + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t b0 = t * per, b1 = b0 + per < N ? b0 + per : N;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" void dtpu_subpel_blocks(const void* ref, int elem,
                                   int64_t stride, int pad,
                                   const int64_t* ys, const int64_t* xs,
                                   const int64_t* mvs, int64_t N, int n,
                                   int bitdepth, void* out) {
  if (elem == 1) {
    subpel_blocks_t((const uint8_t*)ref, stride, pad, ys, xs, mvs, N, n,
                    bitdepth, (uint8_t*)out);
  } else {
    subpel_blocks_t((const uint16_t*)ref, stride, pad, ys, xs, mvs, N,
                    n, bitdepth, (uint16_t*)out);
  }
}

extern "C" void dtpu_subpel_sad(const void* ref, int elem,
                                int64_t stride, int pad, const void* cur,
                                const int64_t* ys, const int64_t* xs,
                                const int64_t* mvs, const int64_t* cands,
                                int64_t C, int64_t N, int n,
                                int bitdepth, int64_t* out) {
  if (elem == 1) {
    subpel_sad_t((const uint8_t*)ref, stride, pad, (const uint8_t*)cur,
                 ys, xs, mvs, cands, C, N, n, bitdepth, out);
  } else {
    subpel_sad_t((const uint16_t*)ref, stride, pad,
                 (const uint16_t*)cur, ys, xs, mvs, cands, C, N, n,
                 bitdepth, out);
  }
}

// ====================================================================
// Directional dering filter (CDEF ancestor) — C++ twin of
// ops/dering.py dering_frame (od_dering, filter.c:1655-1950): per-8x8
// direction estimate, variance-modulated threshold, 7-tap directional
// + 4-tap orthogonal conditional passes.  Bit-exact integer ops,
// threaded over superblocks.
// ====================================================================

namespace {

const int DERING_VERY_LARGE = 30000;
const int DIR_OFF[8][3][2] = {
    {{-1, 1}, {-2, 2}, {-3, 3}}, {{0, 1}, {-1, 2}, {-1, 3}},
    {{0, 1}, {0, 2}, {0, 3}},    {{0, 1}, {1, 2}, {1, 3}},
    {{1, 1}, {2, 2}, {3, 3}},    {{1, 0}, {2, 1}, {3, 1}},
    {{1, 0}, {2, 0}, {3, 0}},    {{1, 0}, {2, -1}, {3, -1}},
};
const int32_t THRESH_Q8[18] = {128, 134, 150, 168, 188, 210, 234, 262,
                               292, 327, 365, 408, 455, 509, 569, 635,
                               710, 768};

inline int ilog64(int64_t x) {
  int r = 0;
  while (x > 0) { r++; x >>= 1; }
  return r;
}

// Direction + variance of one 8x8 block (od_dir_find8).
inline void dir_find8_one(const int32_t* blk, int stride, int* dir_out,
                          int64_t* var_out) {
  int64_t p[8][15];
  memset(p, 0, sizeof(p));
  int64_t x[8][8];
  for (int i = 0; i < 8; i++) {
    for (int j = 0; j < 8; j++) x[i][j] = blk[i * stride + j] >> 4;
  }
  for (int i = 0; i < 8; i++) {
    for (int j = 0; j < 8; j++) {
      int64_t v = x[i][j];
      p[0][i + j] += v;
      p[1][i + (j >> 1)] += v;
      p[2][i] += v;
      p[3][3 + i - (j >> 1)] += v;
      p[4][7 + i - j] += v;
      p[5][3 - (i >> 1) + j] += v;
      p[6][j] += v;
      p[7][(i >> 1) + j] += v;
    }
  }
  int64_t cost[8] = {0};
  for (int i = 0; i < 8; i++) {
    cost[2] += (p[2][i] * p[2][i]) >> 3;
    cost[6] += (p[6][i] * p[6][i]) >> 3;
  }
  for (int dd = 0; dd < 2; dd++) {
    int d = dd * 4;
    int64_t c = 0;
    for (int i = 0; i < 7; i++) {
      c += (p[d][i] * p[d][i]) / (i + 1)
          + (p[d][14 - i] * p[d][14 - i]) / (i + 1);
    }
    c += (p[d][7] * p[d][7]) >> 3;
    cost[d] = c;
  }
  for (int dd = 0; dd < 4; dd++) {
    int d = 2 * dd + 1;
    int64_t c = 0;
    for (int j = 0; j < 5; j++) c += (p[d][3 + j] * p[d][3 + j]) >> 3;
    for (int j = 0; j < 3; j++) {
      c += (p[d][j] * p[d][j]) / (2 * j + 2)
          + (p[d][10 - j] * p[d][10 - j]) / (2 * j + 2);
    }
    cost[d] = c;
  }
  int best = 0;
  for (int d = 1; d < 8; d++) {
    if (cost[d] > cost[best]) best = d;
  }
  *dir_out = best;
  *var_out = cost[best] - cost[(best + 4) & 7];
}

void dering_sb_one(const int32_t* frame, int h, int w, int sby, int sbx,
                   int threshold, int xdec, int pli,
                   const int32_t* ldirs /* (4,4) luma dirs or null */,
                   int32_t* out /* (n,n) */, int32_t* dirs_out) {
  int ln = 5 - xdec;
  int n = 1 << ln;
  int bsize = 3 - xdec;
  int nb = n >> bsize;
  const int b = 3;
  int y0 = sby << ln;
  int x0 = sbx << ln;
  int32_t padded[(32 + 6) * (32 + 6)];
  int ps = n + 2 * b;
  for (int r = 0; r < ps; r++) {
    int fy = y0 - b + r;
    for (int c = 0; c < ps; c++) {
      int fx = x0 - b + c;
      padded[r * ps + c] =
          (fy >= 0 && fy < h && fx >= 0 && fx < w)
              ? frame[(int64_t)fy * w + fx] : DERING_VERY_LARGE;
    }
  }
  int dirs[4][4];
  int64_t thresh[4][4];
  if (pli == 0) {
    int64_t var[4][4];
    int64_t varsum = 0;
    for (int by = 0; by < nb; by++) {
      for (int bx = 0; bx < nb; bx++) {
        dir_find8_one(padded + (b + by * 8) * ps + (b + bx * 8), ps,
                      &dirs[by][bx], &var[by][bx]);
        varsum += var[by][bx];
      }
    }
    int64_t v2 = varsum / (32 * 32);
    if (v2 > 32767) v2 = 32767;
    for (int by = 0; by < nb; by++) {
      for (int bx = 0; bx < nb; bx++) {
        int64_t v1 = var[by][bx] >> 6;
        if (v1 > 32767) v1 = 32767;
        int idx = ilog64(v1 * v2) - 9;
        if (idx < 0) idx = 0;
        if (idx > 17) idx = 17;
        thresh[by][bx] = ((int64_t)threshold * THRESH_Q8[idx]) >> 8;
        if (dirs_out) dirs_out[by * nb + bx] = dirs[by][bx];
      }
    }
  } else {
    for (int by = 0; by < nb; by++) {
      for (int bx = 0; bx < nb; bx++) {
        dirs[by][bx] = ldirs[by * 4 + bx];
        thresh[by][bx] = threshold;
      }
    }
  }
  // 7-tap directional pass.
  int32_t y1[(32 + 6) * (32 + 6)];
  for (int i = 0; i < ps * ps; i++) y1[i] = DERING_VERY_LARGE;
  const int taps[3] = {3, 2, 2};
  for (int r = 0; r < n; r++) {
    for (int c = 0; c < n; c++) {
      int d = dirs[r >> bsize][c >> bsize];
      int64_t th = thresh[r >> bsize][c >> bsize];
      int64_t xv = padded[(b + r) * ps + (b + c)];
      int64_t tot = 0;
      for (int k = 0; k < 3; k++) {
        int dy = DIR_OFF[d][k][0], dx = DIR_OFF[d][k][1];
        for (int s = 0; s < 2; s++) {
          int sy = s ? -dy : dy, sx = s ? -dx : dx;
          int64_t pd = padded[(b + r + sy) * ps + (b + c + sx)] - xv;
          int64_t ad = pd < 0 ? -pd : pd;
          if (ad < th) tot += taps[k] * pd;
        }
      }
      y1[(b + r) * ps + (b + c)] = (int32_t)(xv + ((tot + 8) >> 4));
    }
  }
  // 4-tap orthogonal pass.
  for (int r = 0; r < n; r++) {
    for (int c = 0; c < n; c++) {
      int d = dirs[r >> bsize][c >> bsize];
      int64_t th = thresh[r >> bsize][c >> bsize];
      int64_t xv = y1[(b + r) * ps + (b + c)];
      int64_t orig = padded[(b + r) * ps + (b + c)];
      int64_t dv = xv - orig;
      if (dv < 0) dv = -dv;
      int64_t ath = th / 3 + dv;
      if (ath > th) ath = th;
      int vert = d <= 4 ? 1 : 0;
      int64_t tot = 0;
      const int offs[4] = {1, 2, -1, -2};
      for (int oi = 0; oi < 4; oi++) {
        int dy = vert ? offs[oi] : 0;
        int dx = vert ? 0 : offs[oi];
        int64_t pd = y1[(b + r + dy) * ps + (b + c + dx)] - xv;
        int64_t ad = pd < 0 ? -pd : pd;
        if (ad < ath) tot += pd;
      }
      out[r * n + c] = (int32_t)(xv + ((3 * tot + 8) >> 4));
    }
  }
}

}  // namespace

extern "C" void dtpu_dering_frame(
    const int32_t* frame, int h, int w, int nhsb, int nvsb,
    int threshold, int xdec, int pli,
    const int32_t* dirs_in /* (nvsb,nhsb,4,4) when pli>0 */,
    int32_t* out /* (nvsb,nhsb,n,n) */,
    int32_t* dirs_out /* (nvsb,nhsb,4,4) when pli==0 */) {
  int n = 1 << (5 - xdec);
  int nb = n >> (3 - xdec);
  int64_t total = (int64_t)nvsb * nhsb;
  auto work = [&](int64_t s0, int64_t s1) {
    for (int64_t s = s0; s < s1; s++) {
      int sby = (int)(s / nhsb), sbx = (int)(s % nhsb);
      dering_sb_one(frame, h, w, sby, sbx, threshold, xdec, pli,
                    dirs_in ? dirs_in + s * 16 : nullptr,
                    out + s * n * n,
                    dirs_out ? dirs_out + s * nb * nb : nullptr);
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (total >= 16 && hw > 1) ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, total); return; }
  std::vector<std::thread> ts;
  int64_t per = (total + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t a = t * per, e = a + per < total ? a + per : total;
    if (a >= e) break;
    ts.emplace_back(work, a, e);
  }
  for (auto& t : ts) t.join();
}

// ====================================================================
// Keyframe (intra) tile symbol walk — the C++ twin of
// pipeline/intra.py's sequential pass: SB-DC prediction, Haar-DC
// levels with gradient feed-forward, H/V intra and CfL prediction,
// in-loop PVQ band search (dtpu_pvq_theta), band symbol coding,
// whole-block skip RDO with rollback, and in-place reconstruction.
// Behavioral spec: encode.c:1066-1489 + decode.c:528-757 +
// intra.c:37-109; structured exactly like pipeline/intra.py so the
// Python path remains the oracle (DTPU_PY_WALK=1).
// ====================================================================

namespace {

// One band's synthesis incl. the skip rules (shared with
// dtpu_pvq_synth_batch's semantics; qg in TRUE domain).
void synth_band_one(const int32_t* r0, const int32_t* qm,
                    const int32_t* qmi, const int32_t* y32, int n,
                    int qg, int itheta, int noref, int q0, double beta,
                    int is_keyframe, int pli, int32_t* out) {
  int cfl = is_keyframe && pli != 0;
  double gr = 0, cgr = 0, gain_offset = 0;
  int icgr = 0;
  if (!noref) {
    cgr = band_cgr(r0, qm, n, q0, beta, &gr);
    if (cfl) cgr = 1.0;
    icgr = (int)std::floor(.5 + cgr);
    gain_offset = cgr - icgr;
  }
  int skip = 0;
  if (noref) {
    if (qg == 0) skip = 1;
  } else {
    if (!is_keyframe && qg == 0) skip = icgr ? 1 : 2;
    if (qg == icgr && itheta == 0 && !cfl) skip = 2;
  }
  if (skip == 2) {
    for (int i = 0; i < n; i++) out[i] = r0[i];
    return;
  }
  if (skip == 1) {
    for (int i = 0; i < n; i++) out[i] = 0;
    return;
  }
  double go = noref ? 0.0 : gain_offset;
  double g = gain_expand_c(qg + go, q0, beta);
  double theta = 0;
  double rr[128];
  int m = 0, s = 1;
  if (!noref) {
    int ts = compute_max_theta(qg + gain_offset, beta);
    theta = compute_theta_v(itheta, ts);
    double maxr = 0;
    for (int i = 0; i < n; i++) {
      rr[i] = (double)r0[i] * qm[i] * QM1;
      double a = std::fabs(rr[i]);
      if (a > maxr) { maxr = a; m = i; }
    }
    s = rr[m] > 0 ? 1 : -1;
    rr[m] += gr * s;
  }
  int yn = noref ? n : n - 1;
  int64_t yy = 0;
  for (int i = 0; i < yn; i++) yy += (int64_t)y32[i] * y32[i];
  double scale = yy == 0 ? 0.0 : g / std::sqrt((double)yy);
  double x[128];
  if (noref) {
    for (int i = 0; i < n; i++) x[i] = y32[i] * scale;
  } else {
    scale *= std::sin(theta);
    for (int i = 0; i < m; i++) x[i] = y32[i] * scale;
    x[m] = -s * g * std::cos(theta);
    for (int i = m + 1; i < n; i++) x[i] = y32[i - 1] * scale;
    double l2r = 0, proj = 0;
    for (int i = 0; i < n; i++) l2r += rr[i] * rr[i];
    for (int i = 0; i < n; i++) proj += rr[i] * x[i];
    double p2 = 2.0 * proj / (1e-100 + l2r);
    for (int i = 0; i < n; i++) x[i] -= rr[i] * p2;
  }
  for (int i = 0; i < n; i++) {
    out[i] = (int32_t)std::floor(.5 + x[i] * (qmi[i] * QMI1));
  }
}

struct DtpuKeyCtx;
inline int32_t* pm_of_key(struct DtpuKeyCtx* c, int i);

struct DtpuKeyCtx {
  // adaptation (same pointer set as DtpuWalkCtx)
  int32_t* skip_cdf;
  int32_t* gaintheta_cdf;
  int32_t* skip_dir_cdf;
  int32_t* k1_cdf;
  int64_t* pvq_adapt;
  int64_t* exg;
  int64_t* ext;
  int32_t* pm_cdf0;
  int32_t* pm_cdf1;
  int32_t* pm_cdf2;
  int32_t* dc_cdf[4];
  int64_t* ex_dc;      // (nplanes,4,3)
  int64_t* ex_sb_dc;   // (nplanes,)
  int32_t skip_inc, gt_inc, sd_inc, k1_inc, pm_inc, dc_inc;
  // frame structure
  int8_t* grid;
  int32_t h4, w4;
  int32_t nplanes, nhsb, row0, row1;
  int32_t xdec[4];
  int32_t q0;
  int32_t use_masking;
  double lambda;
  int32_t* pvq_qm[4];
  const int32_t* qm[4];
  const int32_t* qm_inv[4];
  const int32_t* scan[4];   // coding order -> raster flat index, per bs
  int32_t* d[4];            // transform-domain planes (int32)
  int32_t pw[4], ph[4];
  int64_t* sb_dc_mem[4];
  const int32_t* dc_qm;     // (3,2) Q4 haar AC weights
  const int32_t* cfl4;      // (4,4) CfL 4x4 scaling
};

inline int32_t* pm_of_key(DtpuKeyCtx* c, int i) {
  return i == 0 ? c->pm_cdf0 : (i == 1 ? c->pm_cdf1 : c->pm_cdf2);
}

inline int64_t tdiv_c(int64_t a, int64_t b) {
  return a / b;  // C division truncates toward zero = Python _tdiv
}

inline int64_t div_r0_c(int64_t x, int64_t q) {
  if (x < 0) return -((-x + (q >> 1)) / q);
  return (x + (q >> 1)) / q;
}

// Approximate generic-coder bit cost (generic_encode_cost,
// entropy/adapt.py:208; encoder-only RDO).
double gcost(const int32_t* model_cdf, int x, int64_t ex_q16) {
  int lg = log_ex_c(ex_q16);
  int shift = (lg - 5) >> 1;
  if (shift < 0) shift = 0;
  int mid = lg < 11 ? lg : 11;
  const int32_t* cdf = model_cdf + 16 * mid;
  int xs = (x + ((1 << shift) >> 1)) >> shift;
  double extra = 0;
  if (shift) extra = shift - (xs == 0 ? 1 : 0);
  xs = xs < 15 ? xs : 15;
  if (xs == 15) extra += 2;
  double p = (double)(cdf[xs] - (xs == 0 ? 0 : cdf[xs - 1])) / cdf[15];
  return extra - std::log2(p);
}

// SB-DC with LS neighbor prediction (encode.c:1368-1421 /
// decode.c:642-695).  Returns hgrad/vgrad via pointers.
void key_sb_dc(void* ec, DtpuKeyCtx* c, int pli, int sbx, int sby,
               int has_ur, int encoder, int64_t* hgrad, int64_t* vgrad) {
  int xdec = c->xdec[pli];
  int ln = 5 - xdec;
  int w = c->pw[pli];
  int nhsb = w >> ln;
  int64_t* mem = c->sb_dc_mem[pli];
  int dc_quant = c->q0 * c->pvq_qm[pli][qm_idx(3, 0)] >> 4;
  if (dc_quant < 1) dc_quant = 1;
  int64_t pred;
  int row0 = c->row0;
  if (sby > row0 && sbx > 0) {
    if (has_ur) {
      pred = (22 * mem[sby * nhsb + sbx - 1]
              - 9 * mem[(sby - 1) * nhsb + sbx - 1]
              + 15 * mem[(sby - 1) * nhsb + sbx]
              + 4 * mem[(sby - 1) * nhsb + sbx + 1] + 16) >> 5;
    } else {
      pred = (23 * mem[sby * nhsb + sbx - 1]
              - 10 * mem[(sby - 1) * nhsb + sbx - 1]
              + 19 * mem[(sby - 1) * nhsb + sbx] + 16) >> 5;
    }
  } else if (sby > row0) {
    pred = mem[(sby - 1) * nhsb + sbx];
  } else if (sbx > 0) {
    pred = mem[sby * nhsb + sbx - 1];
  } else {
    pred = 0;
  }
  int y0 = sby << ln, x0 = sbx << ln;
  int32_t* d = c->d[pli];
  int64_t quant;
  int64_t* ex = c->ex_sb_dc + pli;
  if (encoder) {
    int64_t dc0 = (int64_t)d[(int64_t)y0 * w + x0] - pred;
    quant = div_r0_c(dc0, dc_quant);
    int64_t q_ = quant < 0 ? -quant : quant;
    *ex = generic_encode_c((Encoder*)ec, c->dc_cdf[pli], c->dc_inc,
                           (int)q_, -1, *ex, 2);
    if (quant) enc_bits((Encoder*)ec, quant < 0 ? 1u : 0u, 1);
  } else {
    int v;
    *ex = generic_decode_c((Decoder*)ec, c->dc_cdf[pli], c->dc_inc, -1,
                           *ex, 2, &v);
    quant = v;
    if (quant && dtpu_dec_bits(ec, 1)) quant = -quant;
  }
  int64_t cur = quant * dc_quant + pred;
  d[(int64_t)y0 * w + x0] = (int32_t)cur;
  mem[sby * nhsb + sbx] = cur;
  *vgrad = sby > row0 ? mem[(sby - 1) * nhsb + sbx] - cur : 0;
  *hgrad = sbx > 0 ? mem[sby * nhsb + sbx - 1] - cur : 0;
}

// One Haar-DC split level (encode.c:1424-1489 / decode.c:697-757).
void key_haar_level(void* ec, DtpuKeyCtx* c, int pli, int bx, int by,
                    int bsi, int64_t* hgrad, int64_t* vgrad,
                    int encoder) {
  int xdec = c->xdec[pli];
  int w = c->pw[pli];
  int32_t* d = c->d[pli];
  int dc_quant = c->q0 * c->pvq_qm[pli][qm_idx(3, 0)] >> 4;
  if (dc_quant < 1) dc_quant = 1;
  int64_t ac_quant[2];
  ac_quant[0] = ((int64_t)dc_quant * c->dc_qm[2 * (bsi - xdec)] + 8) >> 4;
  ac_quant[1] = ((int64_t)dc_quant * c->dc_qm[2 * (bsi - xdec) + 1] + 8)
      >> 4;
  int ln = bsi - xdec + 2;
  int64_t pos[4];
  pos[0] = (int64_t)(by << ln) * w + (bx << ln);
  pos[1] = (int64_t)(by << ln) * w + ((bx + 1) << ln);
  pos[2] = (int64_t)((by + 1) << ln) * w + (bx << ln);
  pos[3] = (int64_t)((by + 1) << ln) * w + ((bx + 1) << ln);
  int64_t x[4];
  for (int i = 0; i < 4; i++) x[i] = d[pos[i]];
  if (encoder) {
    x[1] -= tdiv_c(*hgrad, 5);
    x[2] -= tdiv_c(*vgrad, 5);
    for (int i = 1; i < 4; i++) {
      int64_t q = ac_quant[i == 3 ? 1 : 0];
      int sign = x[i] < 0;
      int64_t mag = sign ? -x[i] : x[i];
      int64_t quant = mag / q;
      int64_t* ex = c->ex_dc + ((int64_t)pli * 4 + bsi) * 3 + (i - 1);
      double cost = gcost(c->dc_cdf[pli], (int)quant + 1, *ex)
          - gcost(c->dc_cdf[pli], (int)quant, *ex);
      if (quant == 0) cost += 1;
      double qq = (double)q;
      if (qq * qq - 2.0 * qq * (double)(mag - quant * q)
              + qq * qq * c->lambda * cost < 0) {
        quant += 1;
      }
      *ex = generic_encode_c((Encoder*)ec, c->dc_cdf[pli], c->dc_inc,
                             (int)quant, -1, *ex, 2);
      if (quant) enc_bits((Encoder*)ec, sign ? 1u : 0u, 1);
      x[i] = quant * q;
      if (sign) x[i] = -x[i];
    }
  } else {
    for (int i = 1; i < 4; i++) {
      int64_t* ex = c->ex_dc + ((int64_t)pli * 4 + bsi) * 3 + (i - 1);
      int v;
      *ex = generic_decode_c((Decoder*)ec, c->dc_cdf[pli], c->dc_inc,
                             -1, *ex, 2, &v);
      int64_t quant = v;
      if (quant && dtpu_dec_bits(ec, 1)) quant = -quant;
      x[i] = quant * ac_quant[i == 3 ? 1 : 0];
    }
  }
  x[1] += tdiv_c(*hgrad, 5);
  x[2] += tdiv_c(*vgrad, 5);
  *hgrad = x[1];
  *vgrad = x[2];
  // haar kernel (ll, lh, hl, hh) = (x0, x1, x2, x3)
  int64_t ll = x[0], lh = x[1], hl = x[2], hh = x[3];
  ll = ll + hl;
  hh = hh - lh;
  int64_t e = (ll - hh) >> 1;
  lh = e - lh;
  hl = e - hl;
  ll = ll - lh;
  hh = hh + hl;
  d[pos[0]] = (int32_t)ll;
  d[pos[1]] = (int32_t)lh;
  d[pos[2]] = (int32_t)hl;
  d[pos[3]] = (int32_t)hh;
}

// H/V intra prediction from coded neighbors (intra.c:37-61), raster.
void key_hv_pred(DtpuKeyCtx* c, int bx, int by, int bs, int tile_y0,
                 int32_t* pred /* n*n */) {
  int n = 4 << bs;
  int w = c->pw[0];
  const int32_t* d = c->d[0];
  int64_t y0 = (int64_t)by * n, x0 = (int64_t)bx * n;
  for (int i = 0; i < n * n; i++) pred[i] = 0;
  int c4 = n / 4;
  const int8_t* g = c->grid;
  int top = y0 > tile_y0 && g[(by * c4 - 1) * (int64_t)c->w4 + bx * c4]
      == bs;
  int left = bx > 0 && g[(int64_t)(by * c4) * c->w4 + bx * c4 - 1] == bs;
  int64_t g1 = 0, g2 = 0;
  if (top) {
    for (int j = 1; j < 4; j++) {
      int64_t v = d[(y0 - n) * w + x0 + j];
      g1 += v * v;
    }
    for (int j = 4; j < n; j++) pred[j] = d[(y0 - n) * w + x0 + j];
  }
  if (left) {
    for (int j = 1; j < 4; j++) {
      int64_t v = d[(y0 + j) * w + x0 - n];
      g2 += v * v;
    }
    for (int j = 4; j < n; j++) pred[j * n] = d[(y0 + j) * w + x0 - n];
  }
  if (g1 > g2) {
    if (top) {
      for (int j = 1; j < 4; j++) pred[j] = d[(y0 - n) * w + x0 + j];
    }
  } else if (left) {
    for (int j = 1; j < 4; j++) pred[j * n] = d[(y0 + j) * w + x0 - n];
  }
}

// CfL luma resample (intra.c:72-109), raster n x n.
void key_cfl_pred(DtpuKeyCtx* c, int pli, int bx, int by, int bsi,
                  int bs_c, int obs, int32_t* pred) {
  int n = 4 << bs_c;
  int lw = c->pw[0];
  const int32_t* luma = c->d[0];
  int64_t ly = (int64_t)by << (2 + bsi);
  int64_t lx = (int64_t)bx << (2 + bsi);
  if (obs == 0 && c->xdec[pli]) {
    // Merge four 4x4 luma blocks -> 4x4 chroma ref via tf_up_hv_lp
    // (dx = dy = 4, n = 4) then the trained scaling.
    int32_t up[4][4];
    for (int y = 0; y < 2; y++) {
      for (int x = 0; x < 2; x++) {
        int64_t ll = luma[(ly + y) * lw + lx + x];
        int64_t lh = luma[(ly + y) * lw + lx + x + 4];
        int64_t hl = luma[(ly + y + 4) * lw + lx + x];
        int64_t hh = luma[(ly + y + 4) * lw + lx + x + 4];
        // kernel call order (ll, hl, lh, hh) per tf.c:99 swap
        int64_t a = ll, b = hl, cc = lh, dd = hh;
        a = a + cc;
        dd = dd - b;
        int64_t e = (a - dd) >> 1;
        b = e - b;
        cc = e - cc;
        a = a - b;
        dd = dd + cc;
        // outputs (ll, hl, lh, hh) = (a, b, cc, dd)
        int hs = x & 1, vs = y & 1;
        up[2 * y + vs][2 * x + hs] = (int32_t)a;
        up[2 * y + vs][2 * x + 1 - hs] = (int32_t)cc;   // lh
        up[2 * y + 1 - vs][2 * x + hs] = (int32_t)b;    // hl
        up[2 * y + 1 - vs][2 * x + 1 - hs] = (int32_t)dd;
      }
    }
    for (int r = 0; r < 4; r++) {
      for (int cc2 = 0; cc2 < 4; cc2++) {
        pred[r * 4 + cc2] = (int32_t)(((int64_t)c->cfl4[cc2 * 4 + r]
                                       * up[r][cc2] + 64) >> 7);
      }
    }
    return;
  }
  for (int r = 0; r < n; r++) {
    for (int cc2 = 0; cc2 < n; cc2++) {
      pred[r * n + cc2] = luma[(ly + r) * lw + lx + cc2];
    }
  }
}


// Leaf: prediction + in-loop PVQ search + symbols + reconstruction
// (od_block_encode encode.c:1066-1285 / od_block_decode
// decode.c:528-636, keyframe paths).
void key_leaf(void* ec, DtpuKeyCtx* c, int pli, int bs, int bsi, int bx,
              int by, int encoder, int sk, int obs) {
  int xdec = c->xdec[pli];
  int n = 4 << bs;
  int ncoded = NCODED[bs];
  int w = c->pw[pli];
  int64_t y0 = (int64_t)by << (2 + bsi - xdec);
  int64_t x0 = (int64_t)bx << (2 + bsi - xdec);
  int32_t* d = c->d[pli];
  const int32_t* scan = c->scan[bs];
  int32_t predr[64 * 64];
  if (pli == 0) {
    key_hv_pred(c, bx, by, bs, c->row0 << 5, predr);
  } else {
    key_cfl_pred(c, pli, bx, by, bsi, bs, obs, predr);
  }
  int32_t ref[512], dblock[512], out[512];
  for (int i = 0; i < ncoded; i++) {
    ref[i] = predr[scan[i]];
    dblock[i] = d[(y0 + scan[i] / n) * w + x0 + scan[i] % n];
  }
  int q0 = c->q0;
  const int32_t* qmb = c->qm[bs];
  const int32_t* qmib = c->qm_inv[bs];
  const int32_t* pvq_qm = c->pvq_qm[pli];
  int nb = BNB[bs];
  double beta = band_beta(c->use_masking, pli);
  int nb_end = BOFFS[bs][nb];
  int32_t* skip_row = c->skip_cdf + 5 * (2 * bs + (pli ? 1 : 0));
  int nsym = 4 + ((pli == 0 && bs > 0) ? 1 : 0);
  for (int i = 0; i < ncoded; i++) out[i] = 0;
  int acskip = 0;
  if (encoder) {
    // CfL flip detection (pvq_encoder.c:697-709).
    int flip = 0;
    if (pli != 0) {
      double xy = 0;
      for (int i = BOFFS[bs][0]; i < BOFFS[bs][1]; i++) {
        xy += ((double)ref[i] * qmb[i] * QM1)
            * ((double)dblock[i] * qmb[i] * QM1);
      }
      if (xy < 0) {
        flip = 1;
        for (int i = BOFFS[bs][0]; i < nb_end; i++) ref[i] = -ref[i];
      }
    }
    // In-loop band search (prediction depends on decoded neighbors).
    int32_t yv[512];
    int qgs[9], its[9], mts[9], ks[9], nrs[9], qgc[9];
    double sds[9];
    double extras[6];
    double skip_diff = 0;
    for (int i = 0; i < nb; i++) {
      int lo = BOFFS[bs][i];
      int bn = BOFFS[bs][i + 1] - lo;
      int q = q0 * pvq_qm[qm_idx(bs, i + 1)] >> 4;
      if (q < 1) q = 1;
      dtpu_pvq_theta(dblock + lo, ref + lo, bn, q, beta, 1, 1, pli,
                     qmb + lo, c->lambda, yv + lo, &qgs[i], &its[i],
                     &mts[i], &ks[i], &nrs[i], &sds[i], extras);
      skip_diff += sds[i];
      if (nrs[i]) {
        qgc[i] = qgs[i];
        its[i] = -1;
      } else {
        double gr;
        double cgr = band_cgr(ref + lo, qmb + lo, bn, q, beta, &gr);
        if (pli != 0) cgr = 1.0;
        int icgr = (int)std::floor(.5 + cgr);
        qgc[i] = neg_interleave_c(qgs[i], icgr);
      }
      synth_band_one(ref + lo, qmb + lo, qmib + lo, yv + lo, bn,
                     qgs[i], its[i], nrs[i], q, beta, 1, pli, out + lo);
    }
    // skip_rest / skip_dir (skip_theta_value = -1 for keyframes) —
    // pure computation, hoisted above the trial region so nbeff is
    // known before any symbol is coded.
    int skip_rest = 1;
    for (int i = 1; i < nb; i++) {
      if (its[i] != -1 || qgc[i]) skip_rest = 0;
    }
    int skip_dir = 0;
    if (nb > 1) {
      for (int i = 0; i < 3; i++) {
        int tmp = 1;
        for (int j = i + 1; j < nb; j += 3) {
          if (its[j] != -1 || qgc[j]) tmp = 0;
        }
        skip_dir |= tmp << i;
      }
    }
    int nbeff = nb;
    if (its[0] == -1 && qgc[0] == 0 && skip_rest) nbeff = 0;
    if (nbeff == 0) {
      // All bands skip: the acskip branch is taken unconditionally —
      // code only the final skip symbol (no checkpoint/snapshot).
      enc_cdf_adapt32((Encoder*)ec, 2, skip_row, nsym, c->skip_inc);
      acskip = 1;
      goto key_enc_done;
    }
    {
    int64_t chk[7];
    dtpu_enc_checkpoint(ec, chk);
    ScopedSnap snap;
    scoped_save(c, &snap, pli, bs, nb, nrs);
    int tell0 = dtpu_enc_tell_frac(ec);
    // keyframe: out[0] = 0 before the skip symbol.
    enc_cdf_adapt32((Encoder*)ec, 0, skip_row, nsym, c->skip_inc);
    int cfl_encoded = 0;
    for (int i = 0; i < nbeff; i++) {
      if (i == 0
          || (!skip_rest && !(skip_dir & (1 << ((i - 1) % 3))))) {
        int lo = BOFFS[bs][i];
        int bn = BOFFS[bs][i + 1] - lo;
        int cdf_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9 + i;
        int code_skip = (i == 0 && i < nbeff - 1) ? 1 : 0;
        int64_t y64[128];
        for (int t = 0; t < bn; t++) y64[t] = yv[lo + t];
        dtpu_encode_partition(
            ec, c->gaintheta_cdf + 16 * cdf_ctx, 8 + 7 * code_skip,
            c->gt_inc, pm_of_key(c, nrs[i] ? 0 : 1), c->pm_inc,
            c->exg + ((int64_t)pli * 4 + bs) * 9 + i,
            c->ext + bs * 9 + i, c->pm_cdf2,
            c->k1_cdf + 16 * (2 * (bn == 15) + (nrs[i] ? 0 : 1)),
            c->k1_inc, c->pvq_adapt + 4 * (2 * bs + (nrs[i] ? 1 : 0)),
            y64, bn, ks[i], qgc[i], its[i], mts[i],
            /*nodesync=*/1, /*is_keyframe=*/1, code_skip, skip_rest,
            bs);
      }
      if (i == 0 && !skip_rest && bs > 0) {
        enc_cdf_adapt32(
            (Encoder*)ec, skip_dir,
            c->skip_dir_cdf + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)), 7,
            c->sd_inc);
      }
      if (pli != 0 && its[i] != -1 && !cfl_encoded) {
        enc_bits((Encoder*)ec, (uint32_t)flip, 1);
        cfl_encoded = 1;
      }
    }
    int tell = dtpu_enc_tell_frac(ec) - tell0;
    double skip_rate = -std::log2((double)(skip_row[2] - skip_row[1])
                                  / skip_row[nsym - 1]);
    tell -= (int)std::floor(.5 + 8 * skip_rate);
    if (skip_diff <= c->lambda / 8 * tell) {
      dtpu_enc_rollback(ec, chk);
      scoped_restore(c, &snap);
      enc_cdf_adapt32((Encoder*)ec, 2, skip_row, nsym, c->skip_inc);
      acskip = 1;
    }
    }
  key_enc_done:;
  } else {
    int out0flag = sk & 1;
    (void)out0flag;  // keyframe DC comes from the Haar tree
    acskip = sk >> 1;
    if (!acskip) {
      int skip_rest[3] = {0, 0, 0};
      int allow_flip = pli != 0 ? 1 : 0;
      for (int i = 0; i < nb; i++) {
        int lo = BOFFS[bs][i];
        int bn = BOFFS[bs][i + 1] - lo;
        int q = q0 * pvq_qm[qm_idx(bs, i + 1)] >> 4;
        if (q < 1) q = 1;
        int qg = 0, itheta = -1, noref = 1;
        if (!skip_rest[(i + 2) % 3]) {
          int has_skip = (i == 0 && i < nb - 1) ? 1 : 0;
          int cdf_ctx = (pli ? 1 : 0) * 4 * 9 + bs * 9 + i;
          int pid = dec_cdf_adapt32((Decoder*)ec,
                                    c->gaintheta_cdf + 16 * cdf_ctx,
                                    8 + 7 * has_skip, c->gt_inc);
          if (pid >= 8) pid += 1;  // keyframe: pid 8 impossible
          if (pid >= 8) {
            pid -= 8;
            skip_rest[0] = skip_rest[1] = skip_rest[2] = 1;
          }
          qg = pid & 1;
          itheta = (pid >> 1) - 1;
          noref = itheta == -1 ? 1 : 0;
        }
        if (qg > 0) {
          int64_t* exg = c->exg + ((int64_t)pli * 4 + bs) * 9 + i;
          int v;
          generic_decode_c((Decoder*)ec, pm_of_key(c, noref ? 0 : 1),
                           c->pm_inc, -1, *exg, 2, &v);
          qg = 1 + v;
          *exg += (((int64_t)qg << 16) - *exg) >> 2;
        }
        double qcg;
        if (!noref) {
          double gr;
          double cgr = band_cgr(ref + lo, qmb + lo, bn, q, beta, &gr);
          if (pli != 0) cgr = 1.0;
          int icgr = (int)std::floor(.5 + cgr);
          qg = neg_deinterleave_c(qg, icgr);
          double gain_offset = cgr - icgr;
          qcg = qg + gain_offset;
          if (itheta > 1) {
            int64_t* ext = c->ext + bs * 9 + i;
            int v;
            generic_decode_c((Decoder*)ec, c->pm_cdf2, c->pm_inc, -1,
                             *ext, 2, &v);
            itheta = 2 + v;
            *ext += (((int64_t)itheta << 16) - *ext) >> 2;
          }
        } else {
          itheta = 0;
          qcg = (double)qg;
        }
        int k = compute_k_v(qcg, noref ? -1 : itheta, 0.0, noref, bn,
                            beta, 1);
        int64_t y64[128];
        for (int t = 0; t < bn; t++) y64[t] = 0;
        if (k != 0) {
          dtpu_decode_codeword(
              ec, c->k1_cdf + 16 * (2 * (bn == 15) + (noref ? 0 : 1)),
              c->k1_inc, c->pvq_adapt + 4 * (2 * bs + (noref ? 1 : 0)),
              y64, bn, k, noref, bs);
        }
        if (allow_flip && !noref) {
          int flip = (int)dtpu_dec_bits(ec, 1);
          if (flip) {
            for (int t = BOFFS[bs][0]; t < nb_end; t++) ref[t] = -ref[t];
          }
          allow_flip = 0;
        }
        int32_t y32[128];
        for (int t = 0; t < bn; t++) y32[t] = (int32_t)y64[t];
        synth_band_one(ref + lo, qmb + lo, qmib + lo, y32, bn, qg,
                       noref ? -1 : itheta, noref, q, beta, 1, pli,
                       out + lo);
        if (i == 0 && !skip_rest[0] && bs > 0) {
          int sd = dec_cdf_adapt32(
              (Decoder*)ec,
              c->skip_dir_cdf + 7 * ((pli ? 1 : 0) + 2 * (bs - 1)), 7,
              c->sd_inc);
          for (int j = 0; j < 3; j++) skip_rest[j] = (sd >> j) & 1;
        }
      }
    }
  }
  // Reconstruction writeback (zeros base for keyframes; DC from the
  // Haar tree already in d[y0][x0]).
  int32_t dc = d[y0 * w + x0];
  if (acskip) {
    for (int i = 0; i < ncoded; i++) out[i] = 0;
  }
  for (int r = 0; r < n; r++) {
    for (int cc = 0; cc < n; cc++) d[(y0 + r) * w + x0 + cc] = 0;
  }
  for (int i = 1; i < ncoded; i++) {
    d[(y0 + scan[i] / n) * w + x0 + scan[i] % n] = out[i];
  }
  d[y0 * w + x0] = dc;
}

// Z-order keyframe recursion (_code_recursive, intra.py).
void key_rec(void* ec, DtpuKeyCtx* c, int pli, int bx, int by, int bsi,
             int64_t hgrad, int64_t vgrad, int encoder) {
  int xdec = c->xdec[pli];
  int64_t cell = (int64_t)(by << bsi) * c->w4 + (bx << bsi);
  if (pli == 0) {
    if (encoder) {
      int obs = c->grid[cell];
      if (obs == bsi) {
        key_leaf(ec, c, 0, bsi, bsi, bx, by, 1, 0, obs);
        return;
      }
      enc_cdf_adapt32((Encoder*)ec, 4, c->skip_cdf + 5 * (2 * bsi), 5,
                      c->skip_inc);
    } else {
      int nsym = 4 + (bsi > 0 ? 1 : 0);
      int sk = dec_cdf_adapt32((Decoder*)ec, c->skip_cdf + 5 * (2 * bsi),
                               nsym, c->skip_inc);
      if (sk < 4) {
        int span = 1 << bsi;
        int cy = by << bsi, cx = bx << bsi;
        for (int yy = 0; yy < span; yy++) {
          memset(c->grid + (int64_t)(cy + yy) * c->w4 + cx, bsi, span);
        }
        key_leaf(ec, c, 0, bsi, bsi, bx, by, 0, sk, bsi);
        return;
      }
    }
  } else {
    int obs = c->grid[cell];
    int eff = obs > xdec ? obs : xdec;
    if (eff == bsi) {
      int bs = bsi - xdec;
      if (encoder) {
        key_leaf(ec, c, pli, bs, bsi, bx, by, 1, 0, obs);
      } else {
        int sk = dec_cdf_adapt32((Decoder*)ec,
                                 c->skip_cdf + 5 * (2 * bs + 1), 4,
                                 c->skip_inc);
        key_leaf(ec, c, pli, bs, bsi, bx, by, 0, sk, obs);
      }
      return;
    }
  }
  key_haar_level(ec, c, pli, 2 * bx, 2 * by, bsi - 1, &hgrad, &vgrad,
                 encoder);
  for (int dy = 0; dy < 2; dy++) {
    for (int dx = 0; dx < 2; dx++) {
      key_rec(ec, c, pli, 2 * bx + dx, 2 * by + dy, bsi - 1, hgrad,
              vgrad, encoder);
    }
  }
}

}  // namespace

extern "C" int dtpu_key_walk(void* ec, DtpuKeyCtx* c, int encoder) {
  for (int sby = c->row0; sby < c->row1; sby++) {
    for (int sbx = 0; sbx < c->nhsb; sbx++) {
      for (int pli = 0; pli < c->nplanes; pli++) {
        int has_ur = (sby > c->row0 && sbx < c->nhsb - 1) ? 1 : 0;
        int64_t hgrad = 0, vgrad = 0;
        key_sb_dc(ec, c, pli, sbx, sby, has_ur, encoder, &hgrad,
                  &vgrad);
        key_rec(ec, c, pli, sbx, sby, 3, hgrad, vgrad, encoder);
      }
    }
  }
  if (!encoder) return ((Decoder*)ec)->error;
  return 0;
}

// ====================================================================
// Lifting VM — executes the declarative integer-lifting programs of
// ops/lifting.py (reversible DCT/lapping networks) over a batch of
// rows.  Bit-exact int32 twin of lifting.run; threaded over the batch.
// Op encoding (int32 x 6): kind, a, b, c, r, s  with kind:
//   0 lift(+)  1 lift(-)  2 add  3 sub  4 rsub  5 addh  6 subh
//   7 rsubh    8 neg      9 addf 10 subf 11 scale6 12 unscale6
// (for scale6/unscale6, b is the scale constant).
// ====================================================================

namespace {

inline int32_t hrnd32(int32_t x) {
  return (x + ((x >> 31) & 1)) >> 1;
}

}  // namespace

extern "C" void dtpu_lift_apply(
    const int32_t* ops, int nops, int nlanes,
    const int32_t* load_lane /* n: lane index of input k */,
    const int32_t* store_lane /* n: lane index of output k */,
    int n, const int32_t* x, int64_t N, int32_t* out) {
  auto work = [&](int64_t b0, int64_t b1) {
    std::vector<int32_t> t(nlanes);
    for (int64_t b = b0; b < b1; b++) {
      const int32_t* xr = x + b * n;
      int32_t* orow = out + b * n;
      for (int k = 0; k < n; k++) t[load_lane[k]] = xr[k];
      const int32_t* op = ops;
      for (int o = 0; o < nops; o++, op += 6) {
        int32_t a = op[1], bb = op[2];
        switch (op[0]) {
          case 0: t[a] += (t[bb] * op[3] + op[4]) >> op[5]; break;
          case 1: t[a] -= (t[bb] * op[3] + op[4]) >> op[5]; break;
          case 2: t[a] += t[bb]; break;
          case 3: t[a] -= t[bb]; break;
          case 4: t[a] = t[bb] - t[a]; break;
          case 5: t[a] += hrnd32(t[bb]); break;
          case 6: t[a] -= hrnd32(t[bb]); break;
          case 7: t[a] = hrnd32(t[bb]) - t[a]; break;
          case 8: t[a] = -t[a]; break;
          case 9: t[a] += t[bb] >> 1; break;
          case 10: t[a] -= t[bb] >> 1; break;
          case 11: {
            int32_t v = (t[a] * bb) >> 6;
            t[a] = v + (v > 0 ? 1 : 0);
            break;
          }
          case 12: {
            int32_t v = t[a];
            int32_t av = v < 0 ? -v : v;
            int32_t q = (av << 6) / bb;
            t[a] = v < 0 ? -q : q;
            break;
          }
        }
      }
      for (int k = 0; k < n; k++) orow[k] = t[store_lane[k]];
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (N * nops >= 1 << 15 && hw > 1) ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, N); return; }
  std::vector<std::thread> ts;
  int64_t per = (N + nt - 1) / nt;
  for (int t2 = 0; t2 < nt; t2++) {
    int64_t a = t2 * per, e = a + per < N ? a + per : N;
    if (a >= e) break;
    ts.emplace_back(work, a, e);
  }
  for (auto& t2 : ts) t2.join();
}

// Strided variant: apply the program along an arbitrary axis of a
// contiguous buffer (e.g. the column pass of a 2D transform without
// materializing a transpose).  For block b and vector v, element k
// lives at x[b*block_stride + v*vec_stride + k*lane_stride].
extern "C" void dtpu_lift_apply_s(
    const int32_t* ops, int nops, int nlanes,
    const int32_t* load_lane, const int32_t* store_lane, int n,
    const int32_t* x, int32_t* out, int64_t nblocks,
    int64_t block_stride, int64_t vec_stride, int64_t lane_stride,
    int nvec) {
  auto work = [&](int64_t b0, int64_t b1) {
    std::vector<int32_t> t(nlanes);
    for (int64_t b = b0; b < b1; b++) {
      for (int v = 0; v < nvec; v++) {
        const int32_t* xr = x + b * block_stride + v * vec_stride;
        int32_t* orow = out + b * block_stride + v * vec_stride;
        for (int k = 0; k < n; k++) {
          t[load_lane[k]] = xr[k * lane_stride];
        }
        const int32_t* op = ops;
        for (int o = 0; o < nops; o++, op += 6) {
          int32_t a = op[1], bb = op[2];
          switch (op[0]) {
            case 0: t[a] += (t[bb] * op[3] + op[4]) >> op[5]; break;
            case 1: t[a] -= (t[bb] * op[3] + op[4]) >> op[5]; break;
            case 2: t[a] += t[bb]; break;
            case 3: t[a] -= t[bb]; break;
            case 4: t[a] = t[bb] - t[a]; break;
            case 5: t[a] += hrnd32(t[bb]); break;
            case 6: t[a] -= hrnd32(t[bb]); break;
            case 7: t[a] = hrnd32(t[bb]) - t[a]; break;
            case 8: t[a] = -t[a]; break;
            case 9: t[a] += t[bb] >> 1; break;
            case 10: t[a] -= t[bb] >> 1; break;
            case 11: {
              int32_t vv = (t[a] * bb) >> 6;
              t[a] = vv + (vv > 0 ? 1 : 0);
              break;
            }
            case 12: {
              int32_t vv = t[a];
              int32_t av = vv < 0 ? -vv : vv;
              int32_t q = (av << 6) / bb;
              t[a] = vv < 0 ? -q : q;
              break;
            }
          }
        }
        for (int k = 0; k < n; k++) {
          orow[k * lane_stride] = t[store_lane[k]];
        }
      }
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (nblocks * nvec * nops >= 1 << 15 && hw > 1)
      ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, nblocks); return; }
  std::vector<std::thread> ts;
  int64_t per = (nblocks + nt - 1) / nt;
  for (int t2 = 0; t2 < nt; t2++) {
    int64_t a = t2 * per, e = a + per < nblocks ? a + per : nblocks;
    if (a >= e) break;
    ts.emplace_back(work, a, e);
  }
  for (auto& t2 : ts) t2.join();
}

// ====================================================================
// Blend-aware MV lattice refinement (encoder-only).  Gauss-Seidel
// sweeps over the 32 px OBMC vertex lattice: each vertex tries +-step
// perturbations scored by the EXACT bilinear-blend SAD of its four
// adjacent blocks (the role of the reference's rate-aware DP refine,
// od_mv_est_refine_row/col mcenc.c:5216,5880, recast against the
// blend objective).  Fixed-corner block predictions are cached.
// ====================================================================

namespace {

const int RB = 32;  // refined block size (blk_log 5)

template <typename T>
void pred_block32(const T* ref, int64_t stride, int pad, int64_t y0,
                  int64_t x0, int64_t mvy, int64_t mvx, int bitdepth,
                  int32_t* out) {
  int64_t iy = y0 + (mvy >> 3) + pad;
  int64_t ix = x0 + (mvx >> 3) + pad;
  subpel_one(ref, stride, iy, ix, (int)(mvy & 7), (int)(mvx & 7), RB,
             128 << (bitdepth - 8), (1 << bitdepth) - 1, out);
}

inline int64_t blend_sad32(const int32_t* p0, const int32_t* p1,
                           const int32_t* p2, const int32_t* p3,
                           const uint8_t* cur, int64_t cstride,
                           int maxv) {
  int64_t sad = 0;
  for (int j = 0; j < RB; j++) {
    for (int i = 0; i < RB; i++) {
      int32_t a = (p0[j * RB + i] << 5)
          + (p1[j * RB + i] - p0[j * RB + i]) * i;
      int32_t b = (p3[j * RB + i] << 5)
          + (p2[j * RB + i] - p3[j * RB + i]) * i;
      int32_t v = ((a << 5) + (b - a) * j + (1 << 9)) >> 10;
      v = v < 0 ? 0 : (v > maxv ? maxv : v);
      int32_t d = (int32_t)cur[j * cstride + i] - v;
      sad += d < 0 ? -d : d;
    }
  }
  return sad;
}

}  // namespace

namespace {

// np.median semantics per component over up to 3 candidates
// (pipeline/inter.py _mesh_pred): 2 candidates -> float mean truncated
// toward zero, 3 -> middle.
inline int64_t med_component(const int64_t* v, int nn) {
  if (nn == 1) return v[0];
  if (nn == 2) {
    int64_t s = v[0] + v[1];
    return s >= 0 ? s / 2 : -((-s) / 2);
  }
  int64_t a = v[0], b = v[1], c = v[2];
  int64_t lo = a < b ? a : b, hi = a < b ? b : a;
  return c < lo ? lo : (c > hi ? hi : c);
}

// Coding-order predictor of g4 vertex (vy, vx) on the stride-`st`
// lattice (st = 2: the always-coded 64 px pass; st = 1: the 32 px
// midpoint pass) — left / up / up-right median, exactly
// _code_mesh_pass's _mesh_pred on a single tile, computed in the
// MV-RESOLUTION domain (the mesh codes truth >> res, so the median is
// taken over res-domain values).  Reads go through an immutable
// snapshot of the lattice; a trial candidate for one vertex is passed
// via (ovy, ovx, o0, o1) instead of being written into shared memory,
// so concurrent passes never read a torn or transient MV.
inline void mesh_pred_c(const int64_t* g4, int nvy, int nvx, int vy,
                        int vx, int st, int res, int64_t* py,
                        int64_t* px, int ovy = -1, int ovx = -1,
                        int64_t o0 = 0, int64_t o1 = 0) {
  int64_t cy[3], cx[3];
  int nn = 0;
  auto rd = [&](int y, int x, int64_t* v0, int64_t* v1) {
    if (y == ovy && x == ovx) { *v0 = o0; *v1 = o1; return; }
    *v0 = g4[((int64_t)y * nvx + x) * 2];
    *v1 = g4[((int64_t)y * nvx + x) * 2 + 1];
  };
  int64_t a, b;
  if (vx >= st) {
    rd(vy, vx - st, &a, &b);
    cy[nn] = a >> res; cx[nn] = b >> res; nn++;
  }
  if (vy >= st) {
    rd(vy - st, vx, &a, &b);
    cy[nn] = a >> res; cx[nn] = b >> res; nn++;
    if (vx + st < nvx) {
      rd(vy - st, vx + st, &a, &b);
      cy[nn] = a >> res; cx[nn] = b >> res; nn++;
    } else if (vx >= st) {
      rd(vy - st, vx - st, &a, &b);
      cy[nn] = a >> res; cx[nn] = b >> res; nn++;
    }
  }
  if (!nn) { *py = 0; *px = 0; return; }
  *py = med_component(cy, nn);
  *px = med_component(cx, nn);
}

// Generic-model MV cost for one coded delta component in the
// MV-resolution domain, in INTEGER 1/8-bit units: table lookup into
// the model-derived cost table (search/mvcost.mv_cost_table8 —
// actual generic-coder tell_frac deltas at a canonical adapted
// state, sign bit included), shared verbatim with the jax twin so
// both refinements make identical — and, being all-integer,
// reproducible — rate decisions.
inline int64_t mv_bits_tab(int64_t d, const int32_t* tab, int ntab) {
  int64_t a = d < 0 ? -d : d;
  if (a >= ntab) a = ntab - 1;
  return tab[a];
}

}  // namespace

extern "C" void dtpu_obmc_refine(
    const void* const* refs, int nrefs, int elem, int64_t stride,
    int pad, const uint8_t* cur, int h, int w,
    int64_t* g4 /* (nvy, nvx, 2) */, const int32_t* rids,
    const int64_t* steps, int nsteps, int iters, int bitdepth,
    int64_t lamq /* round(lam * 16) */, int mv_res,
    const int32_t* mvtab, int ntab) {
  if (elem != 1) return;  // 8-bit path (high depth falls back)
  int nvy = (h >> 5) + 1, nvx = (w >> 5) + 1;
  int nby = h >> 5, nbx = w >> 5;
  int maxv = (1 << bitdepth) - 1;
  // corner cache: block (by,bx), corner c in TL,TR,BR,BL order.
  std::vector<int32_t> cache((size_t)nby * nbx * 4 * RB * RB);
  auto corner_v = [&](int by, int bx, int c, int* vy, int* vx) {
    // TL, TR, BR, BL vertex of block (by, bx).
    static const int dy[4] = {0, 0, 1, 1}, dx[4] = {0, 1, 1, 0};
    *vy = by + dy[c];
    *vx = bx + dx[c];
  };
  auto fill_cache = [&](int by, int bx, int c) {
    int vy, vx;
    corner_v(by, bx, c, &vy, &vx);
    const int64_t* mv = g4 + ((int64_t)vy * nvx + vx) * 2;
    int rid = rids[(int64_t)vy * nvx + vx];
    if (rid >= nrefs) rid = 0;
    pred_block32((const uint8_t*)refs[rid], stride, pad,
                 (int64_t)by * RB, (int64_t)bx * RB, mv[0], mv[1],
                 bitdepth,
                 &cache[(((size_t)by * nbx + bx) * 4 + c) * RB * RB]);
  };
  {
    auto fill_rows = [&](int b0, int b1) {
      for (int by = b0; by < b1; by++) {
        for (int bx = 0; bx < nbx; bx++) {
          for (int c = 0; c < 4; c++) fill_cache(by, bx, c);
        }
      }
    };
    unsigned hw = std::thread::hardware_concurrency();
    int nt = (nby >= 8 && hw > 1) ? (hw < 8 ? (int)hw : 8) : 1;
    if (nt <= 1) {
      fill_rows(0, nby);
    } else {
      std::vector<std::thread> ts;
      int per = (nby + nt - 1) / nt;
      for (int t = 0; t < nt; t++) {
        int b0 = t * per, b1 = b0 + per < nby ? b0 + per : nby;
        if (b0 >= b1) break;
        ts.emplace_back(fill_rows, b0, b1);
      }
      for (auto& t : ts) t.join();
    }
  }
  // blocks adjacent to vertex (vy,vx) and which corner the vertex is.
  static const int bdy[4] = {-1, -1, 0, 0}, bdx[4] = {-1, 0, 0, -1};
  static const int bc[4] = {2, 3, 0, 1};  // vertex's corner role: BR,BL,TL,TR
  int64_t cap = 0;
  for (int si = 0; si < nsteps; si++) cap += steps[si];
  std::vector<int64_t> g0((size_t)nvy * nvx * 2);
  for (int it = 0; it < iters; it++) {
    // si == -1: predictor-jump phase — the coding-order median
    // predictor as the sole candidate, evaluated once per iteration.
    // si >= 0: the step passes, with per-vertex movement capped to
    // `cap` (= sum of steps: only candidates the walk could not reach
    // anyway are rejected) around the post-jump lattice g0, so the
    // jax twin can serve every step candidate of the iteration from
    // ONE window fetch per color (search/me_jax.refine_lattice_jax).
    for (int si = -1; si < nsteps; si++) {
      int64_t st = si < 0 ? 0 : steps[si];
      if (si == 0)
        std::copy(g4, g4 + (size_t)nvy * nvx * 2, g0.begin());
      const int64_t cand[4][2] = {
          {st, 0}, {-st, 0}, {0, st}, {0, -st}};
      // Distance-2 colored Jacobi-within-color sweeps: same-color
      // vertices share no adjacent block (cache/SAD writes are
      // disjoint), and every RATE read — predictors, dependent-reader
      // deltas — goes through an immutable per-pass snapshot of g4
      // with the trial candidate passed by value, so the pass is
      // race-free and gives identical results at any thread count
      // (the rate model sees same-color neighbors at distance 2;
      // reading them Jacobi-style from the snapshot keeps that
      // deterministic).
      std::vector<int64_t> snap((size_t)nvy * nvx * 2);
      for (int color = 0; color < 4; color++) {
        int cy0 = color >> 1, cx0 = color & 1;
        std::copy(g4, g4 + (size_t)nvy * nvx * 2, snap.begin());
        const int64_t* sn = snap.data();
        auto pass = [&](int ry0, int ry1, int32_t* mov) {
        for (int vy = cy0 + 2 * ry0; vy < nvy && vy < cy0 + 2 * ry1;
             vy += 2) {
        for (int vx = cx0; vx < nvx; vx += 2) {
          int64_t* mv = g4 + ((int64_t)vy * nvx + vx) * 2;
          int rid = rids[(int64_t)vy * nvx + vx];
          if (rid >= nrefs) rid = 0;
          // This vertex's coding-order lattice: the 64 px (stride 2 in
          // g4) pass for even-even vertices, else the 32 px midpoint
          // pass.  Midpoint rate is half-weighted: whether a midpoint
          // is actually coded depends on the level RDO that runs after
          // the refinement.
          int self_even = ((vy & 1) == 0) && ((vx & 1) == 0);
          int self_st = self_even ? 2 : 1;
          int self_w2 = self_even ? 2 : 1;  // doubled integer weight
          int64_t spy, spx;   // res-domain predictor of this vertex
          mesh_pred_c(sn, nvy, nvx, vy, vx, self_st, mv_res, &spy,
                      &spx);
          // Dependent vertices whose coding-order predictor reads this
          // vertex: as left (v, vx+st), up (vy+st, v), up-right
          // (vy+st, vx-st) on the vertex's own-parity lattices.
          struct Dep { int dy, dx, st, w2; };
          Dep deps[6];
          int ndeps = 0;
          if (self_even) {
            // 64 px-lattice readers of this vertex (left/up/up-right).
            deps[ndeps++] = {0, 2, 2, 2};
            deps[ndeps++] = {2, 0, 2, 2};
            deps[ndeps++] = {2, -2, 2, 2};
          }
          // Midpoint-pass readers (even-even targets are coded in the
          // coarser pass, filtered below; half weight = 1 of 2).
          deps[ndeps++] = {0, 1, 1, 1};
          deps[ndeps++] = {1, 0, 1, 1};
          deps[ndeps++] = {1, -1, 1, 1};
          int res_sh = mv_res;
          // m is an eighth-pel multiple of 1 << res; pred is already
          // in the res domain.
          auto delta_bits = [&](int64_t m, int64_t pred) -> int64_t {
            return mv_bits_tab((m >> res_sh) - pred, mvtab, ntab);
          };
          // rate in doubled 1/8-bit units (integer; the half weights
          // ride the doubling) — identical to the jax twin's rate16.
          auto rate_of = [&](int64_t my, int64_t mx) -> int64_t {
            // The candidate is passed by value into the dependents'
            // predictor reads; nothing is written to shared state.
            int64_t r = self_w2 * (delta_bits(my, spy)
                                   + delta_bits(mx, spx));
            for (int di = 0; di < ndeps; di++) {
              int uy = vy + deps[di].dy, ux = vx + deps[di].dx;
              if (uy >= nvy || ux < 0 || ux >= nvx) continue;
              int ue = ((uy & 1) == 0) && ((ux & 1) == 0);
              // st=2 deps must land on the 64 px lattice; st=1 deps
              // must land on true midpoints (even-even vertices are
              // coded in the coarser pass, not the midpoint pass).
              if (deps[di].st == 2 && !ue) continue;
              if (deps[di].st == 1 && ue) continue;
              int64_t py, px;
              mesh_pred_c(sn, nvy, nvx, uy, ux, deps[di].st, res_sh,
                          &py, &px, vy, vx, my, mx);
              const int64_t* u = sn + ((int64_t)uy * nvx + ux) * 2;
              r += deps[di].w2 * (delta_bits(u[0], py)
                                  + delta_bits(u[1], px));
            }
            return r;
          };
          // base cost from cached corner preds
          auto eval = [&](int64_t my, int64_t mx, int use_mov) -> int64_t {
            int64_t total = 0;
            for (int a = 0; a < 4; a++) {
              int by = vy + bdy[a], bx = vx + bdx[a];
              if (by < 0 || by >= nby || bx < 0 || bx >= nbx) continue;
              const int32_t* p[4];
              for (int c = 0; c < 4; c++) {
                p[c] = &cache[(((size_t)by * nbx + bx) * 4 + c)
                              * RB * RB];
              }
              if (use_mov) {
                pred_block32((const uint8_t*)refs[rid], stride, pad,
                             (int64_t)by * RB, (int64_t)bx * RB, my, mx,
                             bitdepth, mov);
                p[bc[a]] = mov;
              }
              total += blend_sad32(
                  p[0], p[1], p[2], p[3],
                  cur + (int64_t)by * RB * w + (int64_t)bx * RB, w,
                  maxv);
            }
            // cost = sad * 256 + lamq * rate16 — the jax twin's int32
            // cost widened to int64 (identical ordering: both exact).
            return total * 256 + lamq * rate_of(my, mx);
          };
          int64_t best = eval(mv[0], mv[1], 0);
          int64_t bmy = mv[0], bmx = mv[1];
          int moved = 0;
          const int64_t* v0 = g0.data() + ((int64_t)vy * nvx + vx) * 2;
          for (int ci = 0; ci < 5; ci++) {
            int64_t my, mx;
            if (si < 0 ? ci != 4 : ci == 4) continue;
            if (ci < 4) {
              my = mv[0] + cand[ci][0];
              mx = mv[1] + cand[ci][1];
              if (my - v0[0] > cap || v0[0] - my > cap
                  || mx - v0[1] > cap || v0[1] - mx > cap) continue;
            } else {
              // The coding-order predictor itself: a zero-delta MV is
              // nearly free — the joint MV/rate candidate that matters
              // at coarse lambda (the role of the reference's
              // rate-aware DP accepting predictor-aligned fields).
              my = spy << res_sh;
              mx = spx << res_sh;
              if (my == mv[0] && mx == mv[1]) continue;
            }
            if (my < -480 || my > 480 || mx < -480 || mx > 480) continue;
            int64_t cost = eval(my, mx, 1);
            if (cost < best) { best = cost; bmy = my; bmx = mx;
                               moved = 1; }
          }
          if (moved) {
            mv[0] = bmy;
            mv[1] = bmx;
            for (int a = 0; a < 4; a++) {
              int by = vy + bdy[a], bx = vx + bdx[a];
              if (by < 0 || by >= nby || bx < 0 || bx >= nbx) continue;
              fill_cache(by, bx, bc[a]);
            }
          }
        }
        }
        };
        int nrows = (nvy - cy0 + 1) / 2;
        unsigned hw = std::thread::hardware_concurrency();
        int nt = (nrows >= 8 && hw > 1) ? (hw < 8 ? (int)hw : 8) : 1;
        if (nt <= 1) {
          int32_t mov[RB * RB];
          pass(0, nrows, mov);
        } else {
          std::vector<std::thread> ts;
          std::vector<std::array<int32_t, RB * RB>> movs(nt);
          int per = (nrows + nt - 1) / nt;
          for (int t = 0; t < nt; t++) {
            int r0 = t * per, r1 = r0 + per < nrows ? r0 + per : nrows;
            if (r0 >= r1) break;
            ts.emplace_back(pass, r0, r1, movs[t].data());
          }
          for (auto& t : ts) t.join();
        }
      }
    }
  }
}

/* ---- Integer PVQ synthesis (pvq/isynth.py spec) -----------------------
   Fixed-point re-specification of the PVQ synthesis chain so host,
   device and native walks reconstruct identical integers (the float
   chain is not reproducible across platforms).  All arithmetic is
   int64 with arithmetic (floor) shifts and divisions on non-negative
   operands; see daala_tpu/pvq/isynth.py for the full spec text. */

extern "C" {

/* One stride-s vertex pass of the adaptive MV mesh (single-ref) —
   native twin of pipeline/inter.py _code_mesh_pass: median predictor
   (left / up / up-right, numpy-median semantics incl. the truncated
   2-candidate mean), generic-model magnitudes + sign bits.  wrk and
   truth are (nvy, nvx, 2) int64 in the MV-resolution domain; ex is
   [ex_dy, ex_dx] in/out.  Returns the decoder error flag. */
int dtpu_mesh_pass(void* ec, int encoder, int64_t* wrk,
                   const int64_t* truth, const int32_t* req,
                   int nvy, int nvx, int v0, int v1, int s,
                   int32_t* model_cdf, int model_inc, int64_t* ex,
                   int limit, int nrefs, int32_t* wrids,
                   const int32_t* truth_rids, int32_t* ref_cdf,
                   int ref_inc) {
  (void)nvy;
  int S = 2 * s;
  for (int vy = v0; vy < v1; vy += s) {
    for (int vx = 0; vx < nvx; vx += s) {
      if (s != 8) {
        if ((vy - v0) % S == 0 && vx % S == 0) continue;
        if (req[(int64_t)vy * nvx + vx] > s) continue;
      }
      if (nrefs > 1) {
        // Per-vertex ref-id symbol, neighbor-majority context
        // (_code_mesh_pass; the mv_ref_cdf role, state.c:602).
        int nb = 0, sum = 0;
        if (vx >= s) { sum += wrids[(int64_t)vy * nvx + vx - s]; nb++; }
        if (vy - s >= v0) {
          sum += wrids[(int64_t)(vy - s) * nvx + vx]; nb++;
        }
        int rp = (nb && sum * 2 > nb) ? 1 : 0;
        if (encoder) {
          int rid = truth_rids[(int64_t)vy * nvx + vx];
          wrids[(int64_t)vy * nvx + vx] = rid;
          enc_cdf_adapt32((Encoder*)ec, rid, ref_cdf + 2 * rp, 2,
                          ref_inc);
        } else {
          wrids[(int64_t)vy * nvx + vx] =
              dec_cdf_adapt32((Decoder*)ec, ref_cdf + 2 * rp, 2,
                              ref_inc);
        }
      }
      int64_t cy[3], cx[3];
      int nc = 0;
      if (vx >= s) {
        const int64_t* p = wrk + ((int64_t)vy * nvx + vx - s) * 2;
        cy[nc] = p[0]; cx[nc] = p[1]; nc++;
      }
      if (vy - s >= v0) {
        const int64_t* p = wrk + ((int64_t)(vy - s) * nvx + vx) * 2;
        cy[nc] = p[0]; cx[nc] = p[1]; nc++;
        if (vx + s < nvx) {
          p = wrk + ((int64_t)(vy - s) * nvx + vx + s) * 2;
          cy[nc] = p[0]; cx[nc] = p[1]; nc++;
        } else if (vx >= s) {
          p = wrk + ((int64_t)(vy - s) * nvx + vx - s) * 2;
          cy[nc] = p[0]; cx[nc] = p[1]; nc++;
        }
      }
      int64_t py = 0, px = 0;
      if (nc == 1) { py = cy[0]; px = cx[0]; }
      else if (nc == 2) { py = (cy[0] + cy[1]) / 2;
                          px = (cx[0] + cx[1]) / 2; }
      else if (nc == 3) {
#define MED3(a, b, c) ((a) > (b) ? ((b) > (c) ? (b) : ((a) > (c) ? (c) \
    : (a))) : ((a) > (c) ? (a) : ((b) > (c) ? (c) : (b))))
        py = MED3(cy[0], cy[1], cy[2]);
        px = MED3(cx[0], cx[1], cx[2]);
#undef MED3
      }
      int64_t* w = wrk + ((int64_t)vy * nvx + vx) * 2;
      if (encoder) {
        Encoder* e = (Encoder*)ec;
        const int64_t* t = truth + ((int64_t)vy * nvx + vx) * 2;
        int64_t dy = t[0] - py, dx = t[1] - px;
        ex[0] = generic_encode_c(e, model_cdf, model_inc,
                                 (int)(dy < 0 ? -dy : dy), -1, ex[0], 2);
        if (dy) enc_bits(e, dy < 0 ? 1u : 0u, 1);
        ex[1] = generic_encode_c(e, model_cdf, model_inc,
                                 (int)(dx < 0 ? -dx : dx), -1, ex[1], 2);
        if (dx) enc_bits(e, dx < 0 ? 1u : 0u, 1);
        w[0] = t[0]; w[1] = t[1];
      } else {
        Decoder* d = (Decoder*)ec;
        int v;
        ex[0] = generic_decode_c(d, model_cdf, model_inc, -1, ex[0], 2,
                                 &v);
        int64_t dy = v;
        if (v && dtpu_dec_bits(ec, 1)) dy = -dy;
        ex[1] = generic_decode_c(d, model_cdf, model_inc, -1, ex[1], 2,
                                 &v);
        int64_t dx = v;
        if (v && dtpu_dec_bits(ec, 1)) dx = -dx;
        int64_t wy = py + dy, wx = px + dx;
        if (wy < -limit) wy = -limit;
        if (wy > limit) wy = limit;
        if (wx < -limit) wx = -limit;
        if (wx > limit) wx = limit;
        w[0] = wy; w[1] = wx;
      }
    }
  }
  if (!encoder) return ((Decoder*)ec)->error;
  return 0;
}

int64_t dtpu_isqrt64(int64_t v) {
  int64_t x = 0, r = v, bit = (int64_t)1 << 62;
  for (int i = 0; i < 32; i++) {
    int64_t t = x + bit;
    if (r >= t) { r -= t; x = (x >> 1) + bit; }
    else x >>= 1;
    bit >>= 2;
  }
  return x;
}

static const int64_t DTPU_PI_HALF_Q16 = 102944;

static int64_t div_nn(int64_t num, int64_t den) {
  return num < 0 ? -((-num) / den) : num / den;
}

int64_t dtpu_sin_q15(const int64_t* lut, int64_t u_q16) {
  int64_t hi = u_q16 >> 8;
  if (hi > 255) hi = 255;
  int64_t fr = u_q16 - (hi << 8);
  int64_t a = lut[hi], b = lut[hi + 1];
  return a + (((b - a) * fr + 128) >> 8);
}

/* Noref bands, batched: y (B, n) signed pulses, qg (B,), qm_inv (n,)
   Q12; out (B, n) int32. */
void dtpu_isynth_noref(const int64_t* y, const int64_t* qg, int B,
                       int n, int64_t q0, const int64_t* qm_inv,
                       int32_t* out) {
  for (int b = 0; b < B; b++) {
    const int64_t* yb = y + (int64_t)b * n;
    int32_t* ob = out + (int64_t)b * n;
    int64_t yy = 0;
    for (int i = 0; i < n; i++) yy += yb[i] * yb[i];
    if (qg[b] <= 0 || yy == 0) {
      for (int i = 0; i < n; i++) ob[i] = 0;
      continue;
    }
    int64_t g_q4 = qg[b] * q0 * 16;
    int64_t den = dtpu_isqrt64(yy << 32);
    if (den < 1) den = 1;
    for (int i = 0; i < n; i++) {
      int64_t x_q4 = div_nn((yb[i] * g_q4) << 16, den);
      ob[i] = (int32_t)((x_q4 * qm_inv[i] + ((int64_t)1 << 15)) >> 16);
    }
  }
}

/* Householder-reference bands, batched: y has the reflection-axis
   position zeroed; rq_q4/gr_q8/gain_offset_q8 per dtpu spec. */
void dtpu_isynth_ref(const int64_t* y, const int64_t* rq_q4,
                     const int64_t* gr_q8, const int64_t* goff_q8,
                     const int64_t* qg, const int64_t* itheta, int B,
                     int n, int64_t q0, const int64_t* qm_inv,
                     const int64_t* sin_lut, int32_t* out) {
  for (int b = 0; b < B; b++) {
    const int64_t* yb = y + (int64_t)b * n;
    const int64_t* rb = rq_q4 + (int64_t)b * n;
    int32_t* ob = out + (int64_t)b * n;
    int64_t qcg_q8 = (qg[b] << 8) + goff_q8[b];
    if (qcg_q8 < 0) qcg_q8 = 0;
    if (qcg_q8 == 0) {
      for (int i = 0; i < n; i++) ob[i] = 0;
      continue;
    }
    int64_t g_q4 = (qcg_q8 * q0) >> 4;
    int64_t ts = (qcg_q8 * DTPU_PI_HALF_Q16 + ((int64_t)1 << 23)) >> 24;
    if (qcg_q8 < 358) ts = 1;
    int64_t t = itheta[b] < ts - 1 ? itheta[b] : ts - 1;
    if (t < 0) t = 0;
    int64_t u_q16 = div_nn(t << 16, ts < 1 ? 1 : ts);
    int64_t s_q15 = dtpu_sin_q15(sin_lut, u_q16);
    int64_t c_q15 = dtpu_sin_q15(sin_lut, 65536 - u_q16);
    int m = 0;
    int64_t mabs = -1;
    for (int i = 0; i < n; i++) {
      int64_t a = rb[i] < 0 ? -rb[i] : rb[i];
      if (a > mabs) { mabs = a; m = i; }
    }
    int64_t sgn = rb[m] > 0 ? 1 : -1;
    int64_t yy = 0;
    for (int i = 0; i < n; i++) yy += yb[i] * yb[i];
    int64_t gs_q4 = (g_q4 * s_q15 + ((int64_t)1 << 14)) >> 15;
    int64_t den = dtpu_isqrt64(yy << 32);
    if (den < 1) den = 1;
    int64_t x_q4[128];
    for (int i = 0; i < n; i++) {
      x_q4[i] = yy > 0 ? div_nn((yb[i] * gs_q4) << 16, den) : 0;
    }
    x_q4[m] = -sgn * ((g_q4 * c_q15 + ((int64_t)1 << 14)) >> 15);
    int64_t r_m = rb[m] + sgn * (gr_q8[b] >> 4);
    int64_t l2r = 0, proj = 0;
    for (int i = 0; i < n; i++) {
      int64_t ri = i == m ? r_m : rb[i];
      l2r += ri * ri;
      proj += ri * x_q4[i];
    }
    if (l2r < 1) l2r = 1;
    int64_t f_q16 = div_nn((2 * proj) << 16, l2r);
    for (int i = 0; i < n; i++) {
      int64_t ri = i == m ? r_m : rb[i];
      int64_t xi = x_q4[i] - ((ri * f_q16 + ((int64_t)1 << 15)) >> 16);
      ob[i] = (int32_t)((xi * qm_inv[i] + ((int64_t)1 << 15)) >> 16);
    }
  }
}

}  // extern "C"

// ====================================================================
// Whole-frame OBMC prediction (4-corner bilinear blend over a uniform
// MV vertex grid) — C++ twin of ops/mc.py obmc_predict: per block,
// the four vertex MVs each produce a subpel prediction (multi-ref via
// per-vertex ref ids) and the bilinear blend combines them
// (od_mc_blend_full semantics, mc.h:39-59).  Threaded over block rows.
// ====================================================================

namespace {

template <typename T>
void obmc_frame_t(const T* const* refs, int nrefs, int64_t stride,
                  int pad, const int64_t* mv, const int32_t* rids,
                  int nvx, int h, int w, int blk_log, int bitdepth,
                  const uint8_t* bmask, T* out) {
  int n = 1 << blk_log;
  int nby = h >> blk_log, nbx = w >> blk_log;
  int center = 128 << (bitdepth - 8);
  int maxv = (1 << bitdepth) - 1;
  int bl2 = 2 * blk_log;
  auto work = [&](int r0, int r1) {
    int32_t p[4][64 * 64];
    for (int by = r0; by < r1; by++) {
      for (int bx = 0; bx < nbx; bx++) {
        if (bmask && !bmask[by * nbx + bx]) continue;
        int64_t ys = (int64_t)by << blk_log;
        int64_t xs = (int64_t)bx << blk_log;
        const int cdy[4] = {0, 0, 1, 1}, cdx[4] = {0, 1, 1, 0};
        for (int c = 0; c < 4; c++) {
          int64_t v = (int64_t)(by + cdy[c]) * nvx + (bx + cdx[c]);
          int64_t mvy = mv[2 * v], mvx = mv[2 * v + 1];
          const T* ref = refs[rids ? rids[v] : 0];
          int64_t iy = ys + (mvy >> 3) + pad;
          int64_t ix = xs + (mvx >> 3) + pad;
          int fy = (int)(mvy & 7), fx = (int)(mvx & 7);
          if (fy == 0 && fx == 0) {
            for (int r = 0; r < n; r++) {
              const T* src = ref + (iy + r) * stride + ix;
              int32_t* dst = p[c] + r * n;
              for (int cc = 0; cc < n; cc++) dst[cc] = src[cc];
            }
          } else {
            subpel_one(ref, stride, iy, ix, fy, fx, n, center, maxv,
                       p[c]);
          }
        }
        for (int j = 0; j < n; j++) {
          T* orow = out + (ys + j) * w + xs;
          const int32_t* r0p = p[0] + j * n;
          const int32_t* r1p = p[1] + j * n;
          const int32_t* r2p = p[2] + j * n;
          const int32_t* r3p = p[3] + j * n;
          for (int i = 0; i < n; i++) {
            int64_t a = ((int64_t)r0p[i] << blk_log)
                + (int64_t)(r1p[i] - r0p[i]) * i;
            int64_t b = ((int64_t)r3p[i] << blk_log)
                + (int64_t)(r2p[i] - r3p[i]) * i;
            int64_t val = ((a << blk_log) + (b - a) * j
                           + ((int64_t)1 << (bl2 - 1))) >> bl2;
            if (val < 0) val = 0;
            if (val > maxv) val = maxv;
            orow[i] = (T)val;
          }
        }
      }
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int nt = ((int64_t)h * w >= 1 << 16 && hw > 1)
      ? (hw < 8 ? (int)hw : 8) : 1;
  if (nt <= 1) { work(0, nby); return; }
  std::vector<std::thread> ts;
  int per = (nby + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int b0 = t * per, b1 = b0 + per < nby ? b0 + per : nby;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" void dtpu_obmc_frame(const void* const* refs, int nrefs,
                                int elem, int64_t stride, int pad,
                                const int64_t* mv, const int32_t* rids,
                                int nvx, int h, int w, int blk_log,
                                int bitdepth, const uint8_t* bmask,
                                void* out) {
  if (elem == 1) {
    obmc_frame_t((const uint8_t* const*)refs, nrefs, stride, pad, mv,
                 rids, nvx, h, w, blk_log, bitdepth, bmask,
                 (uint8_t*)out);
  } else {
    obmc_frame_t((const uint16_t* const*)refs, nrefs, stride, pad, mv,
                 rids, nvx, h, w, blk_log, bitdepth, bmask,
                 (uint16_t*)out);
  }
}
