#!/bin/bash
# hap.py accuracy harness (reference: scripts/happy.sh): the full
# call-VCF x truth-VCF x stratum-BED x eval-BED sweep, run in parallel,
# with the reference's eval-chromosome BED subsetting (:58-69), vcfeval
# engine, --roc QUAL --write-counts flags and {call}-{bed}-{truth}-{eval}
# output naming (:85-100) that scripts/plot_results.py consumes.
# Requires hap.py + rtg-tools on PATH (external evaluation tools).
#
# usage: ./happy.sh <ref.fasta> <bed_prefix> <out_dir> \
#            --calls name1=call1.vcf.gz [name2=call2.vcf.gz ...] \
#            --truths name1=truth1.vcf.gz [...] \
#            [--evalbeds name1=eval1.bed ...] \
#            [--chrs chr20,chr21,chr22] [--jobs N] [--sdf template.sdf]
#
# <bed_prefix> points at the bed CLI's outputs: {prefix}_{0..6,all}.bed.
set -euo pipefail

ref=${1:?ref fasta}
bedpre=${2:?bed prefix (from the bed CLI)}
outdir=${3:?output dir}
shift 3

calls=(); truths=(); evalbeds=(); chrs=""; jobs=${HAPPY_JOBS:-25}; sdf=""
mode=""
while [ $# -gt 0 ]; do
  case "$1" in
    --calls) mode=c ;;
    --truths) mode=t ;;
    --evalbeds) mode=e ;;
    --chrs) shift; chrs=$1 ;;
    --jobs) shift; jobs=$1 ;;
    --sdf) shift; sdf=$1 ;;
    *) case "$mode" in
         c) calls+=("$1") ;;
         t) truths+=("$1") ;;
         e) evalbeds+=("$1") ;;
         *) echo "unexpected arg $1"; exit 1 ;;
       esac ;;
  esac
  shift
done
[ ${#calls[@]} -gt 0 ] || { echo "need --calls"; exit 1; }
[ ${#truths[@]} -gt 0 ] || { echo "need --truths"; exit 1; }
[ ${#evalbeds[@]} -gt 0 ] || evalbeds=("evalall=")

mkdir -p "$outdir"
export HGREF="$ref"

# stratum BEDs from the bed CLI, subset to the eval chromosomes
# (reference :58-69 greps chr20-22 out of the genome-wide strata)
beds=(); bednames=()
for n in 0 1 2 3 4 5 6 all; do
  b="${bedpre}_${n}.bed"
  [ -f "$b" ] || continue
  name="np_${n}"
  if [ -n "$chrs" ]; then
    sub="$outdir/${name}_eval.bed"
    tr ',' '\n' <<< "$chrs" | grep -w -f - "$b" > "$sub" || true
    [ -s "$sub" ] || continue
    beds+=("$sub")
  else
    beds+=("$b")
  fi
  bednames+=("$name")
done
[ ${#beds[@]} -gt 0 ] || { echo "no stratum beds at ${bedpre}_*.bed"; exit 1; }

run_one() {
  local call=$1 cname=$2 truth=$3 tname=$4 bed=$5 bname=$6 ebed=$7 ename=$8
  local extra=()
  [ -n "$sdf" ] && extra+=(--engine-vcfeval-template "$sdf")
  [ -n "$ebed" ] && extra+=(-R "$ebed")
  hap.py "$truth" "$call" \
      -r "$ref" \
      -T "$bed" \
      --roc QUAL \
      --write-counts \
      --engine vcfeval \
      "${extra[@]}" \
      -o "$outdir/${cname}-${bname}-${tname}-${ename}" || return 1
  gunzip -f "$outdir/${cname}-${bname}-${tname}-${ename}".*.gz || true
}
export -f run_one
export ref outdir sdf

# full sweep (reference :85-100 uses GNU parallel -j25 the same way)
sweep() {
  for c in "${calls[@]}"; do
    cname=${c%%=*}; call=${c#*=}
    for t in "${truths[@]}"; do
      tname=${t%%=*}; truth=${t#*=}
      for i in "${!beds[@]}"; do
        for e in "${evalbeds[@]}"; do
          ename=${e%%=*}; ebed=${e#*=}
          printf 'run_one %q %q %q %q %q %q %q %q\n' \
            "$call" "$cname" "$truth" "$tname" \
            "${beds[$i]}" "${bednames[$i]}" "$ebed" "$ename"
        done
      done
    done
  done
}

if command -v parallel >/dev/null 2>&1; then
  sweep | parallel --halt now,fail=1 --joblog "$outdir/happy.log" -j "$jobs"
else
  # -d '\n': keep xargs from eating the %q quoting; bash -e so a failed
  # hap.py run fails the sweep (pipefail propagates xargs' 123)
  sweep | xargs -P "$jobs" -d '\n' -I{} bash -ec '{}'
fi
