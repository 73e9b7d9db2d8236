#!/usr/bin/env python
"""Scale probe: do the headline plans survive a 10× data blow-up?

Materializes a key-shifted ×K replica of the sf0.1 tables (so join and
group cardinalities grow realistically: each replica shifts the
order/lineitem/document keys, customers keep their keys and so gain K×
orders), runs the heavy registry queries at both scales in one session,
and reports the time ratio per query.

A healthy distributed plan shows ratio ≈ K (linear in data) or better;
ratio ≫ K exposes a super-linear stage — a collect, a driver loop, an
unsalted hot key, a single-partition window — exactly the class of bug
that is invisible at one scale factor.  Results land in
``docs/SCALE.md`` (committed as evidence) and on stdout as JSON.

Usage: python tools/scale_probe.py [--k 10] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCALE_DIR = "/tmp/spark_graft_scale"

# Heavy / shuffle-bearing queries worth probing (cheap scans excluded).
PROBE = (
    "tpch_q1_pricing_summary",
    "top_customers_by_revenue",
    "min_cost_supplier_per_part",
    "volume_shipping_pairs",
    "late_shipment_priority",
    "order_running_totals",
    "events_sessionize",
    "events_asof_join",
    "dedup_exact_hash",
    "dedup_near_clusters",
    "doc_tfidf_top_terms",
    "doc_pack_sequences",
    "orders_merge_snapshot",
    "events_salted_enrich",
    "skew_safe_count_distinct",
    "embedding_cosine_topk",
    "corpus_span_dedup",
    "doc_gopher_filter",
    "orders_topk_two_phase",
    "events_session_window_fn",
    "doc_sample_k_per_source",
    "embedding_kmeans_ivf",
    # round-3 additions: the remaining iterative / fan-out heavies
    "customer_supplier_pagerank",
    "corpus_inverted_index",
    "events_rolling_7d_active",
    "events_iqr_outliers",
    "multimodal_audio_windows",
    "dedup_incremental",
    "embedding_near_dup_pairs_lsh",
    # round-4 additions: the last unprobed heavies + the new flagship
    "doc_bm25_topk",
    "corpus_word_pmi",
    "s3_ocr_composed",
    "corpus_build_full",
    "embedding_pq_ann",
    "embedding_semantic_dedup",
    "corpus_bpe_merges",
    "doc_topic_clusters",
    # round-5 additions: streaming replay, IVFADC, TF-IDF oracle, and
    # the two surfaces the r04 verdict flagged as unprobed
    "s3_event_listing",
    "census_records_full",
    "dedup_ingest_replay",
    "embedding_pq_ivf_ann",
    "doc_tfidf_vectors",
    # round-5 additions: the engine-portable md5 hash family
    "dedup_minhash_portable",
    "dedup_clusters_portable",
    "dedup_simhash_portable",
    "corpus_bpe_encode",
    "dedup_incremental_portable",
    "dedup_simhash_pairs_portable",
    "doc_quality_classifier",
    "doc_pack_bpe",
    "corpus_kn_bigram_lm",
    "corpus_dedup_report",
    # round-5 additions: portable sketches, hybrid retrieval, LM scoring
    "events_hll_portable",
    "orders_bloom_prune",
    "doc_hybrid_rrf",
    "doc_kn_score",
    "corpus_build_lm_gated",
    "corpus_tokenizer_fertility",
    "doc_quality_gate_trained",
    "events_hll_stream_replay",
    "doc_contamination_profile",
    "doc_mixture_token_budget",
    "embedding_hard_negatives",
    "doc_bm25_maxp",
    "events_session_stream_replay",
    "doc_curriculum_phases",
    # round-6 additions
    "embedding_sq_ivf_topk",
    "embedding_sq_ivf_portable",
    "embedding_pq_adc",
    "corpus_jsonl_pipeline",
    "embedding_pq_ivf_portable",
    "dedup_containment_prefix",
    "dedup_containment_map",
    "corpus_source_overlap",
    "embedding_ivf_ingest_delta",
    "embedding_ivf_stream_replay",
    "events_quantile_sketch",
    "embedding_matryoshka_recall",
    "dedup_lsh_eval",
    "doc_compressibility",
    # round-7 additions
    "embedding_ivf_hot_split",
    "doc_quality_gate_compress",
    "dedup_containment_excerpts",
    "corpus_source_gate",
    "dedup_lsh_eval_sampled",
    "dedup_lsh_eval_budget",
    "corpus_build_source_gated",
    "embedding_bq_portable",
    "embedding_bq_topk",
    "doc_split_leakage_safe",
    "embedding_bq_ivf_topk",
    "embedding_ann_eval",
    "doc_split_incremental",
    "embedding_bq_asym",
    "doc_split_stream_replay",
    # round-8 additions: the split-labeled corpus products and the
    # stored-assignment one-shot incremental split
    "corpus_build_split",
    "corpus_jsonl_split",
    "doc_split_incremental_stored",
    "embedding_bq_gated_pairs",
    "doc_split_audit",
    "embedding_semantic_dedup_gated",
    # round-8 late additions: the DSIR family
    "doc_dsir_scores",
    "doc_dsir_select",
    "corpus_build_dsir_gated",
    "doc_dsir_stream_replay",
    "events_hll_corrected",
    # round-9 additions: frozen DSIR scoring with real unseen buckets,
    # and the ExactSubstr (suffix-array-class) substring dedup layer
    "doc_dsir_score_frozen",
    "corpus_substring_spans",
    "corpus_substring_dedup",
    "multimodal_image_dhash",
    "multimodal_dhash_pairs",
    "embedding_semantic_dedup_frozen",
    "multimodal_dhash_clusters",
    "multimodal_dhash_incremental",
    "corpus_build_substring_gated",
    "multimodal_dhash_stream_replay",
    "corpus_substring_incremental",
    # round-10 additions: paragraph-granularity dedup (CCNet keep-first
    # + Dolma Bloom-gated) and the O(bits)-state streaming admission
    "doc_paragraph_dedup",
    "doc_paragraph_bloom_dedup",
    "doc_bloom_stream_replay",
    # round-10 additions: span-level eval decontamination (ExactSubstr
    # machinery vs an eval matching state) and prototype pruning
    "corpus_decontam_spans",
    "corpus_decontam_scrub",
    "corpus_build_decontam_scrub",
    "embedding_prototype_prune",
    "embedding_prototype_prune_kmeans",
    "corpus_decontam_eval_delta",
    "doc_decontam_stream_replay",
    "corpus_build_curated",
    "corpus_build_token_mixture",
    "corpus_decontam_report",
    "doc_decontam_fuzzy",
    "embedding_matryoshka_topk",
    "doc_decontam_containment",
    # round-12 additions: PII scrub, quality-aware canonical pick,
    # video fingerprints, and line-wise boilerplate removal
    "doc_pii_stats",
    "dedup_keep_best",
    "multimodal_video_near_dup",
    "doc_boilerplate_strip",
    "corpus_boilerplate_profile",
    "corpus_build_boilerplate_gated",
    "multimodal_audio_fingerprint",
    "multimodal_audio_near_dup",
    "corpus_bpe_merges_unrolled",
    "doc_boilerplate_stream_replay",
    "doc_quality_gate_refined",
    "corpus_build_rocchio_gated",
    "multimodal_audio_stream_replay",
    # round-13 additions: keep-best composed into the build; the WAV
    # container parse inside the fingerprint hash gate
    "corpus_build_keepbest_gated",
    "multimodal_audio_wav_fingerprint",
    "multimodal_video_stream_replay",
    "multimodal_keepbest_stream_replay",
)

KEYED = {
    # table -> columns shifted per replica (keeps FK consistency:
    # lineitem.l_orderkey moves with orders.o_orderkey)
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
UNSCALED = ("region", "nation", "customer", "supplier", "part")


def materialize(spark, sf_dir: str, k: int) -> str:
    from pyspark.sql import functions as F

    out_dir = os.path.join(SCALE_DIR, f"x{k}")
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in UNSCALED:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        # key shift must clear the real key range; 10^9 does at sf0.1
        rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
        wide = df.select("*", rep)
        for c in keys:
            wide = wide.withColumn(
                c, F.col(c) + F.col("_rep").cast("long") * F.lit(1_000_000_000)
            )
        wide.drop("_rep").write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    open(marker, "w").close()
    return out_dir


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--sf", default="/root/testdata/sf0.1")
    parser.add_argument("--md", default=os.path.join(ROOT, "docs", "SCALE.md"))
    parser.add_argument("--only", default=None, help="comma-separated probe subset")
    parser.add_argument(
        "--addendum",
        action="store_true",
        help="accepted for compatibility; a '×K validation' section is "
        "now appended automatically whenever --md lacks a ×K table",
    )
    args = parser.parse_args()

    from textract_farmdata_pipeline_spark.registry import QUERIES
    from textract_farmdata_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = materialize(spark, args.sf, args.k)

    def run(name: str, sf_dir: str) -> float:
        # best of two, like bench.py: a single sample is at the mercy of
        # one unlucky full-GC pause (observed turning a 2.8s ×10 run
        # into 25.6s and a 0.8 ratio into 14.2)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm-up both paths once — including the FULL Python worker pool
    # (census_records_full is a mapInPandas query: without it the first
    # Python-island query's t(sf0.1) absorbs ~30 process forks, which
    # inflates its small-scale time and understates its ratio)
    run("tpch_q1_pricing_summary", args.sf)
    run("tpch_q1_pricing_summary", big_dir)
    run("census_records_full", args.sf)

    results = {}
    probe = tuple(args.only.split(",")) if args.only else PROBE
    for name in probe:
        t_small = run(name, args.sf)
        t_big = run(name, big_dir)
        results[name] = {
            "t_sf01_sec": round(t_small, 3),
            f"t_x{args.k}_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)

    verdicts = {
        n: ("OK" if r["ratio"] <= args.k * 1.5 else "SUPra-LINEAR")
        for n, r in results.items()
    }
    summary = {
        "k": args.k,
        "queries": results,
        "worst_ratio": max(r["ratio"] for r in results.values()),
        "all_linear_or_better": all(v == "OK" for v in verdicts.values()),
    }
    print(json.dumps(summary))

    template = [
        "# SCALE — 10× blow-up probe",
        "",
        f"`tools/scale_probe.py --k {args.k}` replicates sf0.1 {args.k}× with",
        "key-shifted copies (FK-consistent; customers gain {k}× orders so".replace("{k}", str(args.k)),
        "group/join cardinalities grow realistically) and times each heavy",
        "query at both scales **in one session**.  `ratio` is t(×{k})/t(sf0.1);".replace("{k}", str(args.k)),
        f"linear scaling is ratio ≈ {args.k}; the gate flags ratio > {args.k}×1.5.",
        "Sub-linear ratios mean fixed per-query overhead (JVM, planning,",
        "Python workers) still dominates at this size — the distributed part",
        "scales better than linearly in these plans.",
        "",
        f"| query | t(sf0.1) s | t(×{args.k}) s | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for n, r in results.items():
        template.append(
            f"| {n} | {r['t_sf01_sec']} | {r[f't_x{args.k}_sec']} | {r['ratio']} | {verdicts[n]} |"
        )
    template += [
        "",
        f"Worst ratio: **{summary['worst_ratio']}** — "
        + ("all plans scale linearly or better." if summary["all_linear_or_better"]
           else "super-linear plans listed above need attention."),
        "",
        "## Finding the probe already paid for",
        "",
        "The first probe run caught `dedup_minhash_lsh` (raw LSH candidate",
        "pairs) at **39×** for 10× data: the ×10 replica gives every document",
        "10 identical copies, each bucket holds all copies, and candidate",
        "PAIRS grow O(d²) in the duplication factor — exactly what repeated",
        "boilerplate does to pair-emitting LSH in a real crawl.  The fix is",
        "`dedup_near_clusters` (probed above): exact-collapse identical texts",
        "to one representative BEFORE LSH, verify + connected-components over",
        "representatives only, then map members back — output stays one row",
        "per document at any duplication rate.  `dedup_minhash_lsh` remains",
        "registered as the pair-level primitive; the clustered operator is",
        "the at-scale product.",
        "",
        "Round-3 probe catches (all fixed, ratios above are post-fix):",
        "",
        "1. **`volume_shipping_pairs` 5s → 24s at ×10**: Catalyst's",
        "   column-pruned size estimate slipped the 1.5M-row orders table",
        "   under the broadcast threshold and built a giant hash relation.",
        "   Fix: `hint(\"merge\")` on the fact-fact join — a plan that must",
        "   stay shuffled-and-spillable at any scale; the plan test now",
        "   pins 4 broadcasts + 1 sort-merge.",
        "2. **`embedding_near_dup_pairs_lsh` OOM'd the 16g driver at ×10**:",
        "   ×10 duplication put d copies of each vector in every LSH",
        "   bucket (candidates O(d²)), and the first fix still scored the",
        "   pair set *after* member expansion (186M dot products).  Final",
        "   shape: exact-collapse identical vectors → bucket/score at the",
        "   representative level (duplication-invariant) → expand member",
        "   pairs last.  Ratio now 1.1.",
        "3. **`dedup_incremental` ratio 16.7**: same disease on both sides",
        "   of the batch-vs-corpus band-bucket join; both sides now",
        "   exact-collapse to one representative per distinct text, and",
        "   the member mapping preserves the min-id `dup_of` contract",
        "   exactly.  Ratio now 1.0.",
        "",
    ]
    os.makedirs(os.path.dirname(args.md), exist_ok=True)
    if os.path.exists(args.md):
        merged, appended = merge_rows(args.md, results, verdicts, args.k)
        if appended:
            # no ×k table exists yet: append the validation section once
            # (with or without --addendum — measurements must never be
            # silently dropped); subsequent runs at the same k merge
            # into it.
            add = [
                "",
                f"## ×{args.k} validation — do the ×10 ratios extrapolate?",
                "",
                f"Same probe at ×{args.k} (sf0.1 replicated {args.k}×, ≈"
                f"{args.k * 600_000 // 1_000_000}M lineitem rows): a plan whose"
                " ×10 ratio was honest should scale by ≈K again, not blow up.",
                "",
                f"| query | t(sf0.1) s | t(×{args.k}) s | ratio | verdict |",
                "|---|---|---|---|---|",
            ]
            for n in appended:
                r = results[n]
                add.append(
                    f"| {n} | {r['t_sf01_sec']} | {r[f't_x{args.k}_sec']} | {r['ratio']} | {verdicts[n]} |"
                )
            add.append("")
            with open(args.md, "a") as fh:
                fh.write("\n".join(add))
        print(
            json.dumps(
                {"md_merged": sorted(merged), "md_appended": sorted(appended)}
            )
        )
    else:
        with open(args.md, "w") as fh:
            fh.write("\n".join(template))
    return 0


def merge_rows(
    md_path: str, results: dict, verdicts: dict, k: int
) -> tuple[set, set]:
    """Merge probe rows into an existing SCALE.md BY QUERY KEY — never
    append a duplicate row for a query the file already carries.

    A markdown table "belongs" to scale k iff its header row contains
    ``t(×k)`` (the ×10 probe tables and the ×100 validation table have
    distinct headers, so one rule scopes both).  For each probed query:

    * already present in a matching table → its FIRST row is updated in
      place and later duplicate rows IN THAT SAME TABLE are dropped
      (the residue the old append-style ``--only`` runs left behind);
      intentional duplicates in a different same-k table survive;
    * present with an annotated verdict cell (``OK (pair primitive)``)
      whose classification still matches → the annotation is kept;
    * absent → appended to the LAST matching table.

    Returns ``(merged_names, appended_names)``; ``appended`` also
    signals the caller when NO matching table exists at all (addendum
    bootstrap).  Idempotent: re-running the same probe rewrites the
    same rows.
    """
    import re

    with open(md_path) as fh:
        lines = fh.read().split("\n")

    header_re = re.compile(r"^\|\s*query\s*\|.*t\(×%d\)" % k)
    row_re = re.compile(r"^\|\s*([^|]+?)\s*\|")
    in_table = False
    table_idx = -1  # ordinal of the ×k table the current row belongs to
    # name -> list of (line index, table ordinal) holding a row for it
    locations: dict[str, list[tuple[int, int]]] = {}
    labels: dict[str, str] = {}  # name -> cell text incl. "(r04)" suffix
    last_table_end = None  # index AFTER the last data row of the last ×k table
    for i, ln in enumerate(lines):
        if header_re.match(ln):
            in_table = True
            table_idx += 1
            last_table_end = i + 1
            continue
        if in_table:
            if ln.startswith("|"):
                last_table_end = i + 1
                m = row_re.match(ln)
                if m and m.group(1) != "---":
                    # strip ONLY a "(r04)"-style provenance suffix so the
                    # key is the query name; a hand-written variant row
                    # like "foo (sampled)" stays a distinct key
                    name = re.sub(r"\s*\(r\d+\)$", "", m.group(1))
                    locations.setdefault(name, []).append((i, table_idx))
                    labels.setdefault(name, m.group(1))
            else:
                in_table = False

    def fmt(name: str, old_verdict: str | None) -> str:
        r = results[name]
        v = verdicts[name]
        if old_verdict and old_verdict.split(" ")[0] == v:
            v = old_verdict  # keep hand annotations like "OK (pair primitive)"
        label = labels.get(name, name)  # keep "(r04)"-style provenance suffixes
        return f"| {label} | {r['t_sf01_sec']} | {r[f't_x{k}_sec']} | {r['ratio']} | {v} |"

    merged, appended = set(), set()
    drop: set[int] = set()
    for name in results:
        if name in locations:
            (first, first_tbl), *rest = locations[name]
            old = [c.strip() for c in lines[first].split("|")]
            old_verdict = old[5] if len(old) > 6 else None
            lines[first] = fmt(name, old_verdict)
            # only de-dup residue WITHIN the first occurrence's table —
            # an intentional duplicate row in a different same-k table
            # (e.g. a hand-curated recap) must survive the merge
            drop.update(i for i, tbl in rest if tbl == first_tbl)
            merged.add(name)
        else:
            appended.add(name)
    lines = [ln for i, ln in enumerate(lines) if i not in drop]
    if appended and last_table_end is not None:
        # dropped lines shift indexes; recompute the insertion point as
        # the end of the last ×k table in the post-drop line list
        shift = sum(1 for i in drop if i < last_table_end)
        at = last_table_end - shift
        lines[at:at] = [fmt(n, None) for n in sorted(appended)]
        appended_into_file = set(appended)
        appended = set()  # nothing left for the addendum bootstrap
        merged |= appended_into_file
    _refresh_summaries(lines, header_re)
    with open(md_path, "w") as fh:
        fh.write("\n".join(lines))
    return merged, appended


def _refresh_summaries(lines: list, header_re) -> None:
    """Recompute any 'Worst ratio: …' line that follows a merged ×k
    table from the table it now summarizes — a merge that updates rows
    must not leave the headline verdict asserting a worst ratio (or an
    all-linear claim) its own table contradicts."""
    import re

    i = 0
    while i < len(lines):
        if not header_re.match(lines[i]):
            i += 1
            continue
        ratios, verdict_ok = [], True
        j = i + 1
        while j < len(lines) and lines[j].startswith("|"):
            cells = [c.strip() for c in lines[j].split("|")]
            # | name | t_small | t_big | ratio | verdict | → 7 cells
            if len(cells) >= 7 and cells[1] != "---":
                try:
                    ratios.append(float(cells[4]))
                except ValueError:
                    pass
                else:
                    verdict_ok &= cells[5].split(" ")[0] == "OK"
            j += 1
        # the summary sits in the prose after the table, before the
        # next heading; rewrite it in place if present
        while j < len(lines) and not lines[j].startswith("#"):
            if lines[j].startswith("Worst ratio:") and ratios:
                # surgical rewrite: swap the number and (if the verdict
                # flipped) the claim clause, keeping any trailing prose
                ln = re.sub(
                    r"\*\*[0-9.]+\*\*", f"**{max(ratios)}**", lines[j], count=1
                )
                ok_txt = "all plans scale linearly or better."
                bad_txt = "super-linear plans listed above need attention."
                if verdict_ok:
                    ln = ln.replace(bad_txt, ok_txt)
                else:
                    ln = ln.replace(ok_txt, bad_txt)
                lines[j] = ln
                break
            j += 1
        i += 1


if __name__ == "__main__":
    sys.exit(main())
