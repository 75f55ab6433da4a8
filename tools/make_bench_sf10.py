#!/usr/bin/env python3
"""Assemble BENCH_SF10.json — the sf10 (100x bench-scale) decade checkpoint.

Second scale decade on top of BENCH_SF1.json: the flagship pipeline
entries measured on sf0.1 replicated 100x by graft.tools.MakeScale.
Reads a fresh sf0.1 detail file (same code version as the sf10 run — the
round-9 governance rework changed the ingest-loop constants, so stale
round detail would skew every ratio) and one or more sf10 detail files,
computes sf0.1 -> sf10 ratios, and attaches plan-audit notes.

Usage: make_bench_sf10.py <sf01_detail> <sf10_detail> [<sf10_detail2>...]
"""
import json
import sys

NOTES = {
    "p5_indexed_ingest_loop": (
        "~3x at 100x data: the governed loop's per-batch work tracks the "
        "BATCH (greedy-star within-batch screen, shard-pruned committed-"
        "index probe, one raw occupancy read, claim-file epoch fence), so "
        "the 100x corpus contributes only the ~linear one-off index "
        "build; at sf0.1 the loop is fixed-overhead-dominated, which the "
        "flat decade ratio makes visible. The architecture's headline "
        "claim, measured across TWO decades (1.9x at 10x in BENCH_SF1 "
        "pre-rework, 3.1x at 100x post-rework)."),
    "p1_training_corpus": (
        "~10x at 100x data: quality->dedup->decontaminate->split stays "
        "sub-linear; the dedup stage's banded self-join grows with "
        "bucket occupancy (uniform synthetic corpus keeps it bounded) "
        "and the clustering auto-select routes through the star variant."),
    "p6_embedding_ingest_loop": (
        "~19x at 100x data, sub-linear but the steepest governed entry: "
        "auto plane density rises log2 with the corpus (7 planes at "
        "sf0.1, 13-14 at sf10), so the Hamming-1 multi-probe fan per "
        "vector grows from 8 to ~15 probes/table and candidate volume "
        "scales ~n*log n rather than n. The price of holding bucket "
        "occupancy (and per-bucket join work) constant; nothing "
        "quadratic - same plan family as b4/d5d."),
    "b4_embedding_index": (
        "~41x at 100x data, sub-linear: the one-off index build "
        "dominates - SRP projection is linear-with-log-fan (plane count "
        "tracks log2(corpus)), and the write-time bucket cap is a "
        "row_number window over (tbl,bkt), a corpus-sized shuffle whose "
        "row count is vectors x tables x 1 = linear with a log-growing "
        "constant. Probes stay batch-sized (shard-pruned scans). "
        "Second-decade steepening (3.3x first decade, ~12x second) is "
        "the log plane fan plus shuffle spill at 3.2M-row windows, not "
        "a super-linear candidate blowup - occupancy stays ~32/bucket "
        "by construction."),
    "d11_semdedup": (
        "~81x at 100x data, near-linear: the data-sized quantizer "
        "(semDeDupCellsFor scales cell count with the corpus) holds "
        "within-cell pair work bounded, so the decade ratio tracks the "
        "assignment scan plus the capped within-cell verify. The frozen-"
        "quantizer variant measured 3.8x SLOWER at sf10 "
        "(tools/SemDedupScale audit) - the dial this auto entry closes."),
    "q60_dsir_sample": (
        "~3.6x at 100x data: DSIR's fit is ONE corpus scan with map-side "
        "bucket partials (shuffle O(partitions x 4096 buckets), corpus-"
        "size-independent), scoring is a shuffle-free codegen'd pass, and "
        "selection is a bounded hash-Gumbel top-k - at sf0.1 the entry is "
        "fixed-overhead-dominated, so the 100x corpus contributes only "
        "the linear scan, which the flat decade ratio makes visible."),
    "d5d_embedding_lsh_auto": (
        "~91x at 100x data = LINEAR, the design target hit across two "
        "decades: planes = ceil(log2(n/32)) holds bucket occupancy "
        "~constant, so candidate volume (and the codegen'd exact-cosine "
        "verify behind the bucket join) scales with the corpus, with a "
        "log factor from the multi-probe fan absorbed by the verify "
        "pipelining. The pairwise-op scale story d5b/d5c exist to "
        "contrast (fixed planes: quadratic, documented docrows)."),
}


def main():
    sf01 = json.load(open(sys.argv[1]))["queries"]
    sf10 = {}
    cpus = sf = None
    for p in sys.argv[2:]:
        d = json.load(open(p))
        for q, t in d["queries"].items():
            # each detail file is itself a best-of-2 run; across files
            # keep the min (JVM pollution only ever inflates)
            sf10[q] = min(t, sf10.get(q, float("inf")))
        cpus, sf = d.get("cpus"), d.get("sf")
    rows = {}
    for q, t10 in sorted(sf10.items(), key=lambda kv: -kv[1]):
        t01 = sf01.get(q)
        ratio = round(t10 / t01, 2) if t01 and t01 > 0 else None
        row = {"sf10_sec": round(t10, 2), "sf01_sec": round(t01, 3) if t01 else None,
               "ratio": ratio}
        if q in NOTES:
            row["note"] = NOTES[q]
        rows[q] = row
    out = {
        "metric": "sf10_scale_checkpoint",
        "data": "synthetic sf10 = sf0.1 replicated 100x by "
                "graft.tools.MakeScale (vocabulary-disjoint document "
                "replicas; isometric embedding replicas via coordinate "
                "rotation x global negation, distinct through factor 128; "
                "key-shifted facts) - same distribution, 100x rows, never "
                "100 copies of an entity",
        "cpus": cpus, "sf_dir": sf,
        "data_factor": 100,
        "queries": rows,
    }
    json.dump(out, open("BENCH_SF10.json", "w"), indent=1)
    print(json.dumps({q: r["ratio"] for q, r in rows.items()}))


if __name__ == "__main__":
    main()
