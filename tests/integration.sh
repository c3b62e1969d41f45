#!/usr/bin/env bash
# End-to-end CLI chain on the reference example fixtures (no network).
# Counterpart of the reference's tests/integration.sh (which pip-installs
# and runs on downloaded GENCODE data); this one is hermetic.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
FIXTURES="${SEEKR_FIXTURES:-/root/reference/seekr/tests/data}"
# absolutize: the chain below cds into a mktemp workdir, so a relative
# SEEKR_FIXTURES (CI passes tests/fixtures/data) must be resolved first
FIXTURES="$(cd "$FIXTURES" && pwd)"
FA="$FIXTURES/example.fa"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cd "$WORK"

# Hermetic functional run: pin the CPU backend.  (PYTHONPATH is replaced
# wholesale, which also drops any site dir that registers accelerator
# plugins — e.g. the axon TPU tunnel's, whose env var would otherwise point
# JAX at a backend that is no longer registered.)  The AOT executable
# store is pointed at the workdir so every fresh CLI process after the
# first exercises the cross-process warm-start path end to end.
run() { PYTHONPATH="$REPO" JAX_PLATFORMS=cpu SEEKR_TPU_AOT="$WORK/aot" \
        python -m seekr_tpu.cli "$@"; }

K=2
run norm_vectors "$FA" -k $K -mv mean.npy -sv std.npy
run kmer_counts  "$FA" -k $K -mv mean.npy -sv std.npy -o counts.csv
run pearson      counts.csv counts.csv -o pearson.csv
run find_dist    "$FA" -k $K -fm -mdl norm,uniform -o fitres
run find_pval    "$FA" "$FA" mean.npy std.npy $K fitres.csv -o pvals
run adj_pval     pvals.csv fdr_bh -o adj
run kmer_heatmap pvals.csv 0 1 -o hm -hf png
run kmer_dendrogram pearson.csv -o dendro
run kmer_count_barplot "$FA" mean.npy std.npy $K -o cb
run kmer_msd_barplot   "$FA" mean.npy std.npy $K -o msd
run kmer_comp_textplot "$FA" "$FA" 'AAAA,GGG' -o comp
run kmer_indi_textplot "$FA" 'ATTT' -op ./
run kmer_leiden "$FA" mean.npy std.npy $K -sd -pn net -cf gephi || true  # 5 seqs: tiny graph
run pipeline "$FA" -b "$FA" -k $K --leiden -o pipe_out

for f in counts.csv pearson.csv fitres.csv pvals.csv adj.csv hm.png \
         dendro.pdf cb.pdf msd.pdf comp.pdf \
         pipe_out/pearson.csv pipe_out/pvals.csv pipe_out/communities.csv; do
  [[ -s "$f" ]] || { echo "MISSING ARTIFACT: $f"; exit 1; }
done

# warm-resident service: start, ping, query, clean shutdown
run serve mean.npy std.npy -k $K -t "$FA" --socket "$WORK/s.sock" \
    --no-warmup > serve.log 2>&1 &
SRV=$!
for i in $(seq 1 60); do [[ -S "$WORK/s.sock" ]] && break; sleep 1; done
PYTHONPATH="$REPO" JAX_PLATFORMS=cpu python - <<PYEOF
from seekr_tpu.serve import request
sock = "$WORK/s.sock"
assert request(sock, {"op": "ping"})["ok"]
resp = request(sock, {"seqs": ["AGTCAGTCAGTCAGTCAGTC"], "want": ["sim"]})
assert resp["ok"] and resp["m"] == 1, resp
assert request(sock, {"op": "shutdown"})["ok"]
PYEOF
wait "$SRV"
echo "integration: all artifacts produced + service round trip ok"
