#!/bin/bash
# Mirror of the reference's examples/test.sh against the upstream example data.
set -e
cd "$(dirname "$0")/.."
mkdir -p examples/out
python -m mapper_tpu \
  --reference /root/reference/examples/reference.fasta \
  --queries /root/reference/examples/queries.fasta \
  --out-sam examples/out/out.sam \
  --out-vcf examples/out/out.vcf \
  --out-refs-map-count examples/out/ref-counts.txt \
  --out-unaligned examples/out/out-unaligned.fasta
echo "Now look at the results in examples/out/"
