/* Matched-input PVQ SEARCH oracle: runs the reference's pvq_theta on
   band records fed from stdin and prints its chosen
   (qg, itheta, max_theta, k, y[]) per record — the per-band search
   diff harness for the texture small-K RD isolator (VERDICT round-4
   item 7): identical inputs through OUR band search and this oracle,
   both charged through the bit-equal K-tokens coder, name the search
   defect precisely.

   Input (text): first line "nrec", then per record:
     n q0 beta is_keyframe pli bs
     x0[n]            (ints, one line)
     r0[n]            (ints, one line)
   Output per record: "qg itheta max_theta k  y0 y1 ..."

   Build (after tools/refbench/build.sh):
     gcc -O2 -I$REF/include -I$REF/src -I/tmp/refbuild \
         tools/refbench/search_harness.c /tmp/refbuild/pvq.o \
         /tmp/refbuild/internal.o -lm -o /tmp/refbuild/search_harness
   (pvq_encoder.c is #included so the static pvq_theta is callable;
   its entropy-coding entry points are stubbed — pvq_theta itself
   never touches the range coder.) */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* pvq_theta needs od_adapt_ctx for its rate model lookups via
   adapt->pvq.gain/theta increments; a zeroed ctx reproduces the
   reset state the framework's device search models.  The include
   drags in entropy headers; stub the encoder calls pvq_theta's
   neighbors use so we only need pvq.o + internal.o. */
#include "../../../reference/src/pvq_encoder.c"

/* Stubs for od_pvq_encode's entropy checkpointing (unused:
   the harness calls only the static pvq_theta). */
void od_encode_checkpoint(const daala_enc_ctx *enc,
                          od_rollback_buffer *rbuf) {
  (void)enc; (void)rbuf;
}
void od_encode_rollback(daala_enc_ctx *enc,
                        const od_rollback_buffer *rbuf) {
  (void)enc; (void)rbuf;
}

int main(void) {
  int nrec;
  if (scanf("%d", &nrec) != 1) return 1;
  od_adapt_ctx adapt;
  memset(&adapt, 0, sizeof(adapt));
  od_adapt_pvq_ctx_reset(&adapt.pvq, 0);
  for (int r = 0; r < nrec; r++) {
    int n, q0, is_key, pli, bs;
    double beta;
    if (scanf("%d %d %lf %d %d %d", &n, &q0, &beta, &is_key, &pli,
              &bs) != 6) return 1;
    od_coeff x0[MAXN], r0[MAXN], out[MAXN], y[MAXN];
    for (int i = 0; i < n; i++) {
      long v; if (scanf("%ld", &v) != 1) return 1; x0[i] = (od_coeff)v;
    }
    for (int i = 0; i < n; i++) {
      long v; if (scanf("%ld", &v) != 1) return 1; r0[i] = (od_coeff)v;
    }
    int itheta, max_theta, vk;
    double skip_diff = 0;
    int16_t qm[MAXN], qm_inv[MAXN];
    /* Flat magnitude compensation (identity: qm = OD_QM_SCALE_MAX,
       qm_inv = OD_QM_INV_SCALE): matches the framework's
       matched-input protocol. */
    for (int i = 0; i < n; i++) {
      qm[i] = OD_QM_SCALE_MAX; qm_inv[i] = OD_QM_INV_SCALE;
    }
    int qg = pvq_theta(out, x0, r0, n, q0, y, &itheta, &max_theta,
                       &vk, beta, &skip_diff, 0, is_key, pli, &adapt,
                       bs, qm, qm_inv);
    printf("%d %d %d %d ", qg, itheta, max_theta, vk);
    for (int i = 0; i < n; i++) printf("%d ", (int)y[i]);
    printf("\n");
  }
  return 0;
}
