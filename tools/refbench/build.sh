#!/bin/sh
# Build the reference daala codec (read-only tree at /root/reference)
# out-of-tree and link the RD harness.  The codec sources are
# self-contained C (no libogg in the API); only a stub config.h is
# needed.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
mkdir -p "$OUT"
cd "$OUT"
printf '/* stub config for out-of-tree build */\n' > config.h
for f in "$REF"/src/*.c; do
  case $f in *x86*|*arm*) continue;; esac
  o="$(basename "${f%.c}").o"
  [ -f "$o" ] || gcc -O2 -I"$REF"/include -I"$REF"/src -I. -c "$f" -o "$o"
done
gcc -O2 -I"$REF"/include -I"$REF"/src -I. \
  "$(dirname "$0")"/rdref.c ./*.o -lm -o rdref
echo "built $OUT/rdref"
echo "usage: rdref file.yuv W H NFRAMES QUANT BFRAMES [KEYRATE]"
