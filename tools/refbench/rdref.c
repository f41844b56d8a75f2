/* RD harness for the reference daala codec: raw YUV420 in, encode at a
   given quantizer, decode own packets, print JSON with sizes + PSNR. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "daala/daalaenc.h"
#include "daala/daaladec.h"

static double sse_plane(const unsigned char *a, const unsigned char *b,
                        int w, int h, int stride_b) {
  double s = 0;
  int i, j;
  for (i = 0; i < h; i++)
    for (j = 0; j < w; j++) {
      double d = (double)a[i * w + j] - (double)b[i * stride_b + j];
      s += d * d;
    }
  return s;
}

int main(int argc, char **argv) {
  if (argc < 7) {
    fprintf(stderr,
            "usage: rdref file.yuv W H NFRAMES QUANT BFRAMES [KEYRATE]\n");
    return 1;
  }
  const char *path = argv[1];
  int w = atoi(argv[2]), h = atoi(argv[3]), nframes = atoi(argv[4]);
  int quant = atoi(argv[5]);
  int bframes = atoi(argv[6]);
  int keyrate = argc > 7 ? atoi(argv[7]) : 256;
  int cw = w >> 1, ch = h >> 1;
  size_t fsz = (size_t)w * h + 2 * (size_t)cw * ch;
  unsigned char *data = malloc(fsz * nframes);
  FILE *f = fopen(path, "rb");
  if (!f || fread(data, 1, fsz * nframes, f) != fsz * nframes) {
    fprintf(stderr, "read failed\n");
    return 1;
  }
  fclose(f);

  daala_info info;
  daala_info_init(&info);
  info.pic_width = w;
  info.pic_height = h;
  info.nplanes = 3;
  info.plane_info[0].xdec = 0; info.plane_info[0].ydec = 0;
  info.plane_info[1].xdec = 1; info.plane_info[1].ydec = 1;
  info.plane_info[2].xdec = 1; info.plane_info[2].ydec = 1;
  info.timebase_numerator = 30;
  info.timebase_denominator = 1;
  info.frame_duration = 1;
  info.keyframe_rate = keyrate;
  info.bitdepth_mode = OD_BITDEPTH_MODE_8;

  daala_enc_ctx *enc = daala_encode_create(&info);
  if (!enc) { fprintf(stderr, "enc create failed\n"); return 1; }
  daala_encode_ctl(enc, OD_SET_QUANT, &quant, sizeof(quant));
  {
    int complexity = 7, mc_chroma = 1, mc_satd = 1;
    int mv_res_min = 0, mv_lmin = 0, mv_lmax = 6;
    daala_encode_ctl(enc, OD_SET_COMPLEXITY, &complexity,
                     sizeof(complexity));
    daala_encode_ctl(enc, OD_SET_MC_CHROMA, &mc_chroma, sizeof(mc_chroma));
    daala_encode_ctl(enc, OD_SET_MC_SATD, &mc_satd, sizeof(mc_satd));
    daala_encode_ctl(enc, OD_SET_MV_RES_MIN, &mv_res_min,
                     sizeof(mv_res_min));
    daala_encode_ctl(enc, OD_SET_MV_LEVEL_MIN, &mv_lmin, sizeof(mv_lmin));
    daala_encode_ctl(enc, OD_SET_MV_LEVEL_MAX, &mv_lmax, sizeof(mv_lmax));
  }
  daala_encode_ctl(enc, OD_SET_B_FRAMES, &bframes, sizeof(bframes));
  if (getenv("RDREF_NOMASK")) {
    int m = 0;
    daala_encode_ctl(enc, OD_SET_ACTIVITY_MASKING, &m, sizeof(m));
  }

  /* Headers -> decoder setup. */
  daala_comment comment;
  daala_comment_init(&comment);
  daala_info dinfo;
  daala_info_init(&dinfo);
  daala_comment dcomment;
  daala_comment_init(&dcomment);
  daala_setup_info *setup = NULL;
  daala_packet dp;
  int hdr_done = 0;
  while (daala_encode_flush_header(enc, &comment, &dp) > 0) {
    int r = daala_decode_header_in(&dinfo, &dcomment, &setup, &dp);
    if (r < 0) { fprintf(stderr, "hdr parse %d\n", r); return 1; }
    hdr_done++;
  }
  daala_dec_ctx *dec = daala_decode_create(&dinfo, setup);
  if (!dec) { fprintf(stderr, "dec create failed\n"); return 1; }
#ifdef OD_ACCOUNTING
  /* Per-label bit totals (1/8-bit units), matched against our own
     analyzer's by_technique dump.  Enable with RDREF_ACCT=1 on a
     -DOD_ACCOUNTING build (tools/refbench/build.sh acct). */
  static double acct_bits[256];
  static char acct_names[256][32];
  static int acct_n = 0;
  int acct_on = getenv("RDREF_ACCT") != NULL;
  if (acct_on) {
    int e = 1;
    daala_decode_ctl(dec, OD_DECCTL_SET_ACCOUNTING_ENABLED, &e, sizeof(e));
  }
#define ACCT_DUMP() \
  if (acct_on) { \
    od_accounting *acct; \
    if (daala_decode_ctl(dec, OD_DECCTL_GET_ACCOUNTING, &acct, \
                         sizeof(acct)) == 0) { \
      int si; \
      for (si = 0; si < acct->nb_syms; si++) { \
        int id = acct->syms[si].id; \
        if (id < 256) { \
          if (!acct_names[id][0] && acct->dict.str[id]) { \
            strncpy(acct_names[id], acct->dict.str[id], 31); \
            if (id >= acct_n) acct_n = id + 1; \
          } \
          acct_bits[id] += acct->syms[si].bits_q3 / 8.0; \
        } \
      } \
    } \
  }
#else
#define ACCT_DUMP()
#endif

  long total_bytes = 0;
  double sy = 0, su = 0, sv = 0;
  int decoded = 0;
  int in_idx;
  int left = 0;
  int eos_seen = 0;
  od_img img;
  /* Decoder emits frames in display order; accumulate SSE vs the
     matching input frame. */
#define DRAIN(lastflag) \
  while (daala_encode_packet_out(enc, (lastflag), &dp) > 0) { \
    total_bytes += dp.bytes; \
    if (dp.e_o_s) eos_seen = 1; \
    if (getenv("RDREF_DEBUG")) fprintf(stderr, "pkt %ld\n", dp.bytes); \
    if (daala_decode_packet_in(dec, &dp) >= 0) { \
      ACCT_DUMP(); \
      od_img dimg; \
      if (daala_decode_img_out(dec, &dimg) > 0) { \
        int di = decoded; \
        if (di >= nframes) break; \
        unsigned char *src = data + fsz * di; \
        sy += sse_plane(src, dimg.planes[0].data, w, h, \
                        dimg.planes[0].ystride); \
        su += sse_plane(src + (size_t)w * h, dimg.planes[1].data, \
                        cw, ch, dimg.planes[1].ystride); \
        sv += sse_plane(src + (size_t)w * h + (size_t)cw * ch, \
                        dimg.planes[2].data, cw, ch, \
                        dimg.planes[2].ystride); \
        if (getenv("RDREF_DEBUG")) { \
          double fs = sse_plane(src, dimg.planes[0].data, w, h, \
                                dimg.planes[0].ystride); \
          fprintf(stderr, "frame %d psnr_y %.2f\n", di, \
                  10 * log10(255.0 * 255.0 * w * h / (fs + 1e-9))); \
        } \
        decoded++; \
      } \
    } \
  }
  for (in_idx = 0; in_idx <= nframes; in_idx++) {
    int end = in_idx == nframes;
    if (!end) {
      memset(&img, 0, sizeof(img));
      img.nplanes = 3;
      img.width = w;
      img.height = h;
      unsigned char *p = data + fsz * in_idx;
      img.planes[0].data = p;
      img.planes[0].xdec = 0; img.planes[0].ydec = 0;
      img.planes[0].xstride = 1; img.planes[0].ystride = w;
      img.planes[0].bitdepth = 8;
      img.planes[1].data = p + (size_t)w * h;
      img.planes[1].xdec = 1; img.planes[1].ydec = 1;
      img.planes[1].xstride = 1; img.planes[1].ystride = cw;
      img.planes[1].bitdepth = 8;
      img.planes[2].data = p + (size_t)w * h + (size_t)cw * ch;
      img.planes[2].xdec = 1; img.planes[2].ydec = 1;
      img.planes[2].xstride = 1; img.planes[2].ystride = cw;
      img.planes[2].bitdepth = 8;
    }
    /* Drain the previous frame's packet; e_o_s once input is done
       and the encoder buffer is empty (encoder_example.c order). */
    DRAIN(end && !left);
    int rc = daala_encode_img_in(enc, &img, 1, end, &left);
    if (getenv("RDREF_DEBUG"))
      fprintf(stderr, "img_in idx %d end %d rc %d left %d\n",
              in_idx, end, rc, left);
    if (rc < 0 && !end) {
      fprintf(stderr, "img_in failed at %d\n", in_idx);
      return 1;
    }
  }
  {
    int guard;
    for (guard = 0; guard < nframes + 16 && !eos_seen; guard++) {
      DRAIN(!left);
      if (eos_seen) break;
      int rc = daala_encode_img_in(enc, &img, 1, 1, &left);
      if (rc < 0) break;
    }
  }
  DRAIN(1);
  {
    od_img dimg;
    while (decoded < nframes && daala_decode_img_out(dec, &dimg) > 0) {
      unsigned char *src = data + fsz * decoded;
      sy += sse_plane(src, dimg.planes[0].data, w, h,
                      dimg.planes[0].ystride);
      su += sse_plane(src + (size_t)w * h, dimg.planes[1].data,
                      cw, ch, dimg.planes[1].ystride);
      sv += sse_plane(src + (size_t)w * h + (size_t)cw * ch,
                      dimg.planes[2].data, cw, ch,
                      dimg.planes[2].ystride);
      if (getenv("RDREF_DEBUG")) {
        double fs = sse_plane(src, dimg.planes[0].data, w, h,
                              dimg.planes[0].ystride);
        fprintf(stderr, "tail frame %d psnr_y %.2f\n", decoded,
                10 * log10(255.0 * 255.0 * w * h / (fs + 1e-9)));
      }
      decoded++;
    }
  }
  double py = 10 * log10(255.0 * 255.0 * w * h * decoded / (sy > 0 ? sy : 1e-9));
  double pu = 10 * log10(255.0 * 255.0 * cw * ch * decoded / (su > 0 ? su : 1e-9));
  double pv = 10 * log10(255.0 * 255.0 * cw * ch * decoded / (sv > 0 ? sv : 1e-9));
  printf("{\"frames\": %d, \"bytes\": %ld, \"psnr_y\": %.3f, "
         "\"psnr_cb\": %.3f, \"psnr_cr\": %.3f}\n",
         decoded, total_bytes, py, pu, pv);
#ifdef OD_ACCOUNTING
  if (acct_on) {
    int id;
    printf("{\"accounting_bits\": {");
    int first = 1;
    for (id = 0; id < acct_n; id++) {
      if (acct_bits[id] > 0) {
        printf("%s\"%s\": %.1f", first ? "" : ", ", acct_names[id],
               acct_bits[id]);
        first = 0;
      }
    }
    printf("}}\n");
  }
#endif
  return decoded == nframes ? 0 : 2;
}
