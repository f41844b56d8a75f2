/* Matched-input K-tokens cost harness (VERDICT round-2 item 4).
 *
 * Reads a sequence of (n, k, y[n]) band records from stdin (text),
 * codes each vector with the REFERENCE laplace_encode_vector using the
 * reference's own adaptation flow (od_adapt_ctx-style 4-entry
 * curr/means vectors with the 2-entry running average the PVQ adapt
 * row keeps), and prints the total bits (od_ec_enc_tell_frac / 8).
 *
 * Our Python coder (entropy/adapt.py laplace_encode_vector) costs the
 * SAME records through our range coder; equal totals prove the
 * codeword coder + adaptation are bit-equivalent and localize any
 * high-rate RD gap to the search's pulse choices.
 *
 * Build (after tools/refbench/build.sh):
 *   gcc -O2 -I/root/reference/include -I/root/reference/src \
 *       -I/tmp/refbuild tools/refbench/ktok_harness.c \
 *       /tmp/refbuild/entenc.o /tmp/refbuild/entcode.o \
 *       /tmp/refbuild/laplace_encoder.o /tmp/refbuild/laplace_tables.o \
 *       /tmp/refbuild/internal.o -lm -o /tmp/refbuild/ktok_harness
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "entenc.h"
#include "pvq.h"

void laplace_encode_vector(od_ec_enc *enc, const od_coeff *y, int n,
                           int k, int32_t *curr, const int32_t *means);

int main(void) {
  od_ec_enc enc;
  od_ec_enc_init(&enc, 1 << 22);
  int32_t adapt[OD_NSB_ADAPT_CTXS] = {0, 0, 0, 0};
  int32_t mean[OD_NSB_ADAPT_CTXS] = {0, 0, 0, 0};
  int n, k;
  od_coeff y[1024];
  long nrec = 0;
  while (scanf("%d %d", &n, &k) == 2) {
    int i;
    for (i = 0; i < n; i++) {
      int v;
      if (scanf("%d", &v) != 1) return 1;
      y[i] = v;
    }
    memset(adapt, 0, sizeof(adapt));
    laplace_encode_vector(&enc, y, n, k, adapt, mean);
    /* Exactly od_encode_pvq_codeword's running-average update
       (pvq_encoder.c:61-78, speed 5). */
    if (adapt[OD_ADAPT_K_Q8] > 0) {
      mean[OD_ADAPT_K_Q8] +=
          (256 * adapt[OD_ADAPT_K_Q8] - mean[OD_ADAPT_K_Q8]) >> 5;
      mean[OD_ADAPT_SUM_EX_Q8] +=
          (adapt[OD_ADAPT_SUM_EX_Q8] - mean[OD_ADAPT_SUM_EX_Q8]) >> 5;
    }
    if (adapt[OD_ADAPT_COUNT_Q8] > 0) {
      mean[OD_ADAPT_COUNT_Q8] +=
          (adapt[OD_ADAPT_COUNT_Q8] - mean[OD_ADAPT_COUNT_Q8]) >> 5;
      mean[OD_ADAPT_COUNT_EX_Q8] +=
          (adapt[OD_ADAPT_COUNT_EX_Q8] - mean[OD_ADAPT_COUNT_EX_Q8]) >> 5;
    }
    nrec++;
  }
  printf("{\"records\": %ld, \"bits\": %.3f}\n", nrec,
         od_ec_enc_tell_frac(&enc) / 8.0);
  od_ec_enc_clear(&enc);
  return 0;
}
