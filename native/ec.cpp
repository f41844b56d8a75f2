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

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>

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
