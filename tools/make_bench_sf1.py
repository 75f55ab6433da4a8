#!/usr/bin/env python3
"""Assemble BENCH_SF1.json — the sf1 (10x bench-scale) scale checkpoint.

Reads the sf0.1 per-round detail (BENCH_DETAIL.json) and one or more sf1
detail files produced by `graft.Bench` with SPARK_GRAFT_ONLY, computes
sf0.1 -> sf1 scaling ratios, and attaches plan-audit notes for any query
scaling worse than ~linear (ratio > data factor).

Usage: make_bench_sf1.py <sf01_detail> <sf1_detail> [<sf1_detail2> ...]
"""
import json
import sys

NOTES = {
    "d5b_embedding_lsh": (
        "QUADRATIC by construction at fixed planes: SRP bucket space is "
        "2^5 = 32 buckets/table, so 10x vectors -> 10x bucket occupancy -> "
        "~100x self-join pairs (measured 43x time). Not a plan defect - the "
        "planes dial must track log2(corpus/target-occupancy); see "
        "d5c_embedding_lsh_scaled, the same pipeline at 8 planes, and the "
        "MEASURED note on Dedup.embeddingNearDupLsh."),
    "d6_neardup_clusters": (
        "Label propagation rounds grow with component diameter; the 10x "
        "graph keeps structure but the round overhead compounds - the star "
        "variant (d6b) scales better, which is why p1 routes through it."),
    "d5c_embedding_lsh_scaled": (
        "FIXED 8 planes (256 buckets/table) + Hamming-1 multi-probe: still "
        "the fixed-bucket-space quadratic (occupancy 78 at sf1 vs 8 at "
        "sf0.1), and the 1+8 probe fan multiplies the constant - this row "
        "now exists to DOCUMENT the failure mode. The production entry is "
        "d5d_embedding_lsh_auto, the same pipeline with planes tracking "
        "log2(corpus): 8.6 s / 3.1x on identical data."),
    "d5d_embedding_lsh_auto": (
        "THE CLOSER for d5b/d5c's manual planes dial: planes = "
        "ceil(log2(n/32)) from a corpus count picks 6 planes at sf0.1 and "
        "10 at sf1, holding bucket occupancy (and per-bucket join work) "
        "~constant; multi-probe keeps recall >= 0.97 (EmbeddingLshSpec). "
        "3.1x at 10x data - within the <= ~5x target for a pairwise op "
        "whose candidate volume scales with corpus size."),
    "a2_approx_quantile": (
        "The 20x tracks the ACCURACY DIAL, not the operator: a2 pins "
        "accuracy = 1e6 so the GK sketch is rank-exact at the verify SF "
        "(the DuckDB oracle hash-matches quantile_disc); at 6M rows that "
        "accuracy makes the summary near-degenerate. The production "
        "default (1e4) measured 1.05 s on the same sf1 data (~1.6x vs "
        "sf0.1) with identical results on this value distribution - "
        "linear; its error contract is gated in SketchAccuracySpec."),
    "d3_ngram_jaccard_neardup": (
        "dfOrdered crossover checked at sf1 (graft.tools.Probe, warm): "
        "hash-order 3.25 s vs df-ordered (d3b) 5.24 s - the Dedup.scala "
        "prediction HOLDS at 10x because the synthetic corpus stays "
        "near-uniform (vocabulary-disjoint replicas preserve the token "
        "distribution); the df-ascending prefix pays its extra postings "
        "aggregation without pruning anything. The crossover is driven by "
        "Zipfian skew, not raw scale; real-corpus deployments still flip "
        "the flag. Both paths are oracle-identical (d3b row, 122/122)."),
}


def main():
    sf01 = json.load(open(sys.argv[1]))["queries"]
    sf1 = {}
    cpus = sf = None
    for p in sys.argv[2:]:
        if "=" in p and not p.endswith(".json"):
            # extra sf0.1 reference point, e.g. a query added after the
            # round bench ran, measured with graft.tools.Probe (warm run)
            q, v = p.split("=", 1)
            sf01[q] = float(v)
            continue
        d = json.load(open(p))
        for q, t in d["queries"].items():
            # each detail file is itself a best-of-2 run; across files
            # keep the min (JVM pollution only ever inflates)
            sf1[q] = min(t, sf1.get(q, float("inf")))
        cpus, sf = d.get("cpus"), d.get("sf")
    rows = {}
    for q, t1 in sorted(sf1.items(), key=lambda kv: -kv[1]):
        t01 = sf01.get(q)
        ratio = round(t1 / t01, 2) if t01 and t01 > 0 else None
        row = {"sf1_sec": round(t1, 2), "sf01_sec": t01, "ratio": ratio}
        if q in NOTES:
            row["note"] = NOTES[q]
        rows[q] = row
    out = {
        "metric": "sf1_scale_checkpoint",
        "data": "synthetic sf1 = sf0.1 replicated 10x by graft.tools.MakeScale "
                "(vocabulary-disjoint document replicas, isometric coordinate-"
                "permuted embedding replicas, key-shifted facts) - same "
                "distribution, 10x rows, never 10 copies of an entity",
        "cpus": cpus, "sf_dir": sf,
        "data_factor": 10,
        "queries": rows,
    }
    json.dump(out, open("BENCH_SF1.json", "w"), indent=1)
    print(json.dumps({q: r["ratio"] for q, r in rows.items()}))


if __name__ == "__main__":
    main()
