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
        "log2(corpus): 8.6 s / ~3x on identical data."),
    "d5d_embedding_lsh_auto": (
        "THE CLOSER for d5b/d5c's manual planes dial: planes = "
        "ceil(log2(n/32)) from a corpus count picks 6 planes at sf0.1 and "
        "10 at sf1, holding bucket occupancy (and per-bucket join work) "
        "~constant; multi-probe keeps recall >= 0.97 (EmbeddingLshSpec). "
        "~3x at 10x data (2.5-3.1 across runs) - within the <= ~5x target for a pairwise op "
        "whose candidate volume scales with corpus size."),
    "a2_approx_quantile": (
        "The 20x tracks the ACCURACY DIAL, not the operator: a2 pins "
        "accuracy = 1e6 so the GK sketch is rank-exact at the verify SF "
        "(the DuckDB oracle hash-matches quantile_disc); at 6M rows that "
        "accuracy makes the summary near-degenerate. The production "
        "default (1e4) measured 1.05 s on the same sf1 data (~1.6x vs "
        "sf0.1) with identical results on this value distribution - "
        "linear; its error contract is gated in SketchAccuracySpec."),
    "d9_containment_pairs": (
        "Sub-linear (~4-5x at 10x data across runs) but the highest of the linear "
        "inverted-index family because containment's asymmetry only "
        "admits a prefix bound on the SMALLER set: the larger side posts "
        "its FULL token list (one row per token, no prefix prune), and "
        "the min-denominator qualifies far more candidate pairs per "
        "posting than Jaccard's union-denominator at the same nominal "
        "threshold. Inherent to the operator's completeness argument "
        "(overlap >= t*min pigeonholes only the small side), not a plan "
        "defect - the join stays postings-length-bounded, never "
        "quadratic."),
    "d3b_ngram_jaccard_df": (
        "Same pipeline as d3 plus a corpus-wide document-frequency "
        "aggregation whose key space is the VOCABULARY - which MakeScale "
        "grows 10x by construction (vocabulary-disjoint replicas). On "
        "this near-uniform synthetic corpus the df-ascending prefix "
        "prunes nothing (see the d3 crossover note), so d3b pays the "
        "10x-keyed df shuffle with no candidate reduction: 3.8x vs d3's "
        "2.1x. Real Zipfian corpora are where the df ordering wins; "
        "both paths stay oracle-identical."),
    "t18_source_overlap": (
        "Exact pairwise source-overlap shuffles the full distinct "
        "(source, token) vocabulary, which MakeScale grows 10x by "
        "construction - ~4x time at 10x vocabulary is sub-linear, but "
        "the row exists as the EXACT baseline: the production corpus-"
        "scale entry is t18b_source_overlap_minhash (O(sources*k) "
        "signatures independent of corpus size, 2.6x here, stderr "
        "~= sqrt(J(1-J)/k))."),
    "d8b_span_scrub": (
        "d8's span profile (2.6x) plus the excision: covered positions "
        "rejoin the corpus by id and a linear codegen'd pass rebuilds "
        "the kept text - one extra O(total tokens) shuffle of (id, "
        "position) pairs, corpus text still read once and never "
        "shuffled. ~3.5-4x at 10x data across runs, sub-linear."),
    "p5_indexed_ingest_loop": (
        "The governed ingest loop end-to-end (index build over 60% of the "
        "corpus + two ledger-committed batch generations with physical "
        "writes): 1.8x at 10x data - per-batch work tracks the BATCH "
        "(within-batch banding + committed-index probe), the corpus "
        "contributes only the ~linear one-off index build, which is the "
        "design claim of the persisted-index/ledger architecture, here "
        "measured."),
    "b4_embedding_index": (
        "SRP index build over 80% of the embeddings + incremental probe: "
        "3.3-4.1x across runs at 10x vectors. The build dominates - the "
        "projection kernel is linear but the write-time bucket cap is a "
        "row_number window over (tbl,bkt), a shuffle that grows with the "
        "corpus; probes stay batch-sized (constant occupancy via auto "
        "planes). Sub-linear vs the 10x data factor; the probe-side plan "
        "is audited in PLANS.md."),
    "e2_asof_enrich": (
        "As-of join: the range-partitioned sort IS the operator (same "
        "shape as q15's order-statistics 2.15x) - ~3x at 10x rows tracks "
        "the 10x sort volume, sub-linear vs the data factor."),
    "m4_decode_features": (
        "Real javax.imageio PNG decode in mapPartitions: cost is per "
        "image byte (codec-bound, ~2.9-3.5x across runs at 10x images, "
        "sub-linear); pixels reduce to per-partition BIGINT stats before "
        "any shuffle, so only the decode scales, not the exchange."),
    "d4b_simhash_pairs": (
        "SimHash banded pair generation + Hamming verify: linear work "
        "(one signature per doc, bounded band fan); the ~3x at 10x data "
        "reflects the fixed-overhead share of the small sf0.1 time "
        "(0.35 s), not plan growth."),
    "p6_embedding_ingest_loop": (
        "p5's embedding twin end-to-end: ~4.3x at 10x vectors, "
        "sub-linear. Higher constant than p5's 1.8x because the auto "
        "plane density rises with the corpus (7 planes at sf0.1, 10 at "
        "sf1), so the Hamming-1 multi-probe fan grows from 8 to 11 "
        "probes per vector per table - the price of holding bucket "
        "occupancy constant; candidate volume per batch stays bounded, "
        "nothing quadratic (same plan family as b4/d5d, audited in "
        "PLANS.md)."),
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
