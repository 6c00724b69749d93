#!/usr/bin/env bash
# Build the native components and install the package (editable).
#
# Native artifacts land in haplohyped_tpu/_native/:
#   libhh_blosc_h5.so — HDF5 Blosc filter plugin (links system c-blosc)
#   libhh_hostio.so   — BGZF/VCF/FASTA host-I/O shim (links zlib)
#
# Everything degrades gracefully if a native build fails: the Python
# fallbacks keep the pipelines functional (slower, gzip-compressed).

set -euo pipefail
cd "$(dirname "$0")"

echo "== building native components =="
make -C cpp "$@"

echo "== installing package (editable) =="
pip install -e . --quiet || pip install -e .

echo "== environment check =="
python -m haplohyped_tpu.pipeline.doctor || true

echo "done."
