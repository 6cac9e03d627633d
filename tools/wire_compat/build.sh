#!/bin/sh
# Build the wire-compat tools against a reference SEAL build.
#
#   1. cmake -S /root/reference -B /tmp/seal-build -DCMAKE_BUILD_TYPE=Release \
#        -DSEAL_USE_ZLIB=OFF -DSEAL_USE_ZSTD=OFF -DSEAL_USE_MSGSL=OFF \
#        -DSEAL_USE_INTEL_HEXL=OFF -DSEAL_BUILD_TESTS=OFF \
#        -DSEAL_BUILD_EXAMPLES=OFF -G Ninja && ninja -C /tmp/seal-build
#   2. tools/wire_compat/build.sh [build_dir] [ref_dir]
#
# Blobs are regenerated with:  /tmp/wire_compat/gen_blobs tests/data/wire
set -e
BUILD=${1:-/tmp/seal-build}
REF=${2:-/root/reference}
HERE=$(dirname "$0")
mkdir -p /tmp/wire_compat
# -lz -lzstd are no-ops when the lib was built without compression, but
# required when it was (the compressed-blob compat checks need them ON)
LIBS="-lz -lzstd"
g++ -std=c++17 -O2 \
  -I"$REF/native/src" -I"$BUILD/native/src" \
  "$HERE/gen_blobs.cpp" "$BUILD/lib/libseal-4.4.a" $LIBS -o /tmp/wire_compat/gen_blobs
g++ -std=c++17 -O2 \
  -I"$REF/native/src" -I"$BUILD/native/src" \
  "$HERE/verify_blobs.cpp" "$BUILD/lib/libseal-4.4.a" $LIBS -o /tmp/wire_compat/verify_blobs
g++ -std=c++17 -O2 \
  -I"$REF/native/src" -I"$BUILD/native/src" \
  "$HERE/gen_legacy_sampler_vectors.cpp" "$BUILD/lib/libseal-4.4.a" $LIBS \
  -o /tmp/wire_compat/gen_legacy_sampler_vectors
echo built: /tmp/wire_compat/gen_blobs /tmp/wire_compat/verify_blobs /tmp/wire_compat/gen_legacy_sampler_vectors
