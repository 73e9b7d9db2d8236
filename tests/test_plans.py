"""Plan-shape regression tests — the 100 TB guards.

Each assertion pins a physical-plan property that is invisible in
small-scale correctness tests but decides whether the query survives a
1000-executor run: dimension joins stay broadcast (no fact-sized
shuffle), filters reach the parquet scan, column pruning holds, pure
filters never shuffle.  `plan_summary` reads the static Catalyst plan,
so a regression fails here before anyone benches anything.
"""

from __future__ import annotations

from textract_farmdata_pipeline_spark.plans.inspect import plan_summary
from textract_farmdata_pipeline_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


class TestJoinStrategies:
    def test_star_schema_dims_all_broadcast(self, spark):
        s = plan_summary(QUERIES["revenue_by_region"](spark, SF))
        assert s["bhj"] == 4, "customer/nation/region/orders-side must broadcast"
        assert s["smj"] == 0 and s["shj"] == 0, "no shuffle joins in a star rollup"
        assert s["exchanges"] == 1, "only the final groupBy may shuffle"

    def test_q7_double_dimension_role_joins_broadcast(self, spark):
        s = plan_summary(QUERIES["volume_shipping_pairs"](spark, SF))
        assert s["smj"] == 1, "lineitem⋈orders is fact-fact: must sort-merge, never broadcast"
        assert s["bhj"] == 4, "supplier/customer/nation×2 broadcast; orders must NOT be a 5th"

    def test_anti_and_semi_joins_broadcast(self, spark):
        for name in ("customers_without_orders", "customers_with_big_orders"):
            s = plan_summary(QUERIES[name](spark, SF))
            assert s["exchanges"] == 0, f"{name}: broadcast semi/anti join, no shuffle"

    def test_q16_denylist_is_broadcast_anti(self, spark):
        s = plan_summary(QUERIES["supplier_count_by_part_attrs"](spark, SF))
        assert s["smj"] == 0
        assert s["bhj"] >= 2  # denylist anti + part dimension


class TestPushdownAndPruning:
    def test_q6_all_predicates_reach_scan(self, spark):
        s = plan_summary(QUERIES["forecast_revenue_delta"](spark, SF))
        assert s["pushed_filters"]
        assert s["exchanges"] == 1  # single-partition final combine only
        assert set(s["read_columns"]) == {
            "l_extendedprice",
            "l_discount",
            "l_quantity",
            "l_shipdate",
        }, "column pruning must reach the parquet ReadSchema"

    def test_q1_prunes_to_needed_columns(self, spark):
        s = plan_summary(QUERIES["tpch_q1_pricing_summary"](spark, SF))
        assert s["pushed_filters"]
        assert s["exchanges"] == 1
        assert "l_orderkey" not in s["read_columns"], "unused key columns pruned"

    def test_returnflag_filter_pushed(self, spark):
        s = plan_summary(QUERIES["returned_items_report"](spark, SF))
        assert s["pushed_filters"]
        assert s["smj"] == 0


class TestShuffleBudget:
    def test_hash_sample_is_pure_filter(self, spark):
        s = plan_summary(QUERIES["doc_hash_sample"](spark, SF))
        assert s["exchanges"] == 0, "deterministic sampling must not shuffle"

    def test_mixture_resample_no_corpus_shuffle(self, spark):
        s = plan_summary(QUERIES["doc_mixture_resample"](spark, SF))
        # rates (tiny) may shuffle to aggregate; the corpus side must
        # join them via broadcast, never sort-merge.
        assert s["smj"] == 0 and s["shj"] == 0
        assert s["bhj"] >= 1

    def test_unpivot_no_shuffle(self, spark):
        s = plan_summary(QUERIES["part_metrics_unpivot"](spark, SF))
        assert s["exchanges"] == 0, "wide->long is a Generate, not an exchange"

    def test_q2_reuses_partkey_partitioning(self, spark):
        # agg on (l_partkey, l_suppkey) then window on l_partkey: the
        # window needs its own exchange (key prefix != same key), but
        # the dimension joins must not add shuffles.
        s = plan_summary(QUERIES["min_cost_supplier_per_part"](spark, SF))
        assert s["smj"] == 0
        assert s["exchanges"] <= 2


class TestPythonBoundary:
    def test_relational_queries_stay_jvm_side(self, spark):
        for name in (
            "tpch_q1_pricing_summary",
            "revenue_by_region",
            "large_order_customers",
            "doc_token_stats",
            "doc_tfidf_top_terms",
            "corpus_top_bigrams",
        ):
            s = plan_summary(QUERIES[name](spark, SF))
            assert s["python_eval"] == 0, f"{name} must not leave the JVM"


class TestPartitionPruning:
    def test_partitioned_layout_prunes_at_scan(self, spark, tmp_path):
        """Hive-partitioned writes are the 100 TB layout contract: a
        filter on the partition column must become a PartitionFilter
        (directories never listed), not a row filter."""
        import re

        from textract_farmdata_pipeline_spark.plans.inspect import plan_text

        src = spark.range(1000).selectExpr(
            "id", "CAST(id % 4 AS STRING) AS part_key", "id * 2 AS value"
        )
        path = str(tmp_path / "partitioned")
        src.write.partitionBy("part_key").parquet(path)

        pruned = spark.read.parquet(path).filter("part_key = '2'")
        text = plan_text(pruned)
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
        assert m and "part_key" in m.group(1), "filter must prune partitions"
        assert pruned.count() == 250


class TestZorderLayout:
    def test_zorder_files_have_compact_two_dim_ranges(self, spark, tmp_path):
        """Writing z-ordered must shrink per-file (x-range * y-range)
        boxes vs a single-column sort — that area is exactly what
        parquet min/max pruning can skip for two-column predicates."""
        from pyspark.sql import functions as F

        from textract_farmdata_pipeline_spark.operators.zorder import (
            write_zordered,
            zorder_key,
        )

        n_files = 16
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        zp = str(tmp_path / "zorder")
        write_zordered(df, zp, zorder_key([F.col("x"), F.col("y")], bits=6), n_files)
        lp = str(tmp_path / "linear")
        df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(lp)

        def mean_box_area(path):
            per_file = (
                spark.read.parquet(path)
                .withColumn("f", F.input_file_name())
                .groupBy("f")
                .agg(
                    ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).alias("area")
                )
            )
            rows = per_file.collect()
            return sum(r["area"] for r in rows) / len(rows)

        z_area, lin_area = mean_box_area(zp), mean_box_area(lp)
        # 64x64 grid in 16 files: x-sort gives 4x64 stripes, z-order
        # 16x16 tiles — same area, but never worse; the pruning win
        # shows up in the file-count test below.
        assert z_area <= lin_area * 1.05

    def test_zorder_prunes_both_dimensions(self, spark, tmp_path):
        """On a square grid, a y-predicate scan touches only the
        z-tiles whose y-range covers it; under x-sort every file spans
        all y values, so nothing prunes."""
        from pyspark.sql import functions as F

        from textract_farmdata_pipeline_spark.operators.zorder import (
            write_zordered,
            zorder_key,
        )

        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        zp = str(tmp_path / "z2")
        write_zordered(df, zp, zorder_key([F.col("x"), F.col("y")], bits=6), 16)
        lp = str(tmp_path / "l2")
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lp)

        def files_containing(path, pred):
            return (
                spark.read.parquet(path)
                .filter(pred)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .count()
            )

        z_files = files_containing(zp, "y = 3")
        l_files = files_containing(lp, "y = 3")
        assert z_files < l_files, (z_files, l_files)


class TestRound2PlanShapes:
    def test_pack_spans_two_level_prefix_sum(self, spark):
        """The packing plan must keep the corpus-sized window keyed by
        bucket (parallel) and push only the tiny bucket-totals table
        through the single-partition window; the offsets re-enter via
        broadcast, never a corpus shuffle."""
        s = plan_summary(QUERIES["doc_pack_sequences"](spark, SF))
        assert s["bhj"] >= 1, "bucket offsets must broadcast back"
        assert s["smj"] == 0 and s["shj"] == 0
        # bucket window shuffle + bucket-totals aggregate only
        assert s["exchanges"] <= 3

    def test_merge_is_one_join_no_python(self, spark):
        s = plan_summary(QUERIES["orders_merge_snapshot"](spark, SF))
        assert s["python_eval"] == 0, "MERGE core must stay JVM-side"
        n_joins = s["bhj"] + s["smj"] + s["shj"] + s["bnlj"]
        assert n_joins == 1, "exactly one full-outer join classifies all rows"

    def test_salted_enrich_spreads_hot_keys(self, spark):
        s = plan_summary(QUERIES["events_salted_enrich"](spark, SF))
        # dim replicated ×salt then broadcast: the fact side never
        # shuffles on the (skewable) raw key
        assert s["bhj"] >= 1
        assert s["smj"] == 0


class TestAQESkewSplit:
    def test_skewed_partition_is_split_at_runtime(self, spark):
        """AQE skew-join evidence: a hot key whose shuffle partition
        dwarfs the median gets split into multiple reducer tasks in the
        FINAL adaptive plan — the runtime backstop behind the explicit
        salting in operators/skew.py."""
        from pyspark.sql import functions as F

        # payload must be INCOMPRESSIBLE: skew detection reads compressed
        # map-output sizes, and a constant pad lz4-compresses to ~nothing
        pad = F.sha2(F.col("id").cast("string"), 256)
        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% of rows on key 0
            .otherwise((F.col("id") % 50) + 1)
            .alias("k"),
            pad.alias("payload"),
        )
        dim = spark.range(0, 51).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        conf = spark.conf
        saved = {
            c: conf.get(c, None)
            for c in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            )
        }
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # AQE re-plans to broadcast with its OWN threshold; disable it
            # too or the skewed shuffle join never survives to runtime
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
            )
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
            conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            # max(payload) keeps the wide column alive through column
            # pruning so the fact-side shuffle is actually heavy
            joined = (
                fact.join(dim, "k")
                .groupBy("v")
                .agg(F.count("*").alias("n"), F.max("payload").alias("p"))
            )
            joined.collect()  # AQE finalizes only after execution
            final = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            for c, v in saved.items():
                if v is not None:
                    conf.set(c, v)
        assert "skew=true" in final, final[:2000]


class TestTpchBatch3PlanShapes:
    def test_q9_single_shuffle_join(self, spark):
        s = plan_summary(QUERIES["product_profit_by_nation"](spark, SF))
        assert s["bhj"] >= 3, "part/supplier/nation must broadcast"
        assert s["smj"] <= 1, "only lineitem x orders may shuffle-join"

    def test_q11_scalar_total_broadcast(self, spark):
        s = plan_summary(QUERIES["part_value_concentration"](spark, SF))
        assert s["smj"] == 0, "the 1-row total joins via broadcast nested loop"

    def test_q20_semi_join_broadcast(self, spark):
        s = plan_summary(QUERIES["excess_shipment_suppliers"](spark, SF))
        assert s["smj"] == 0, "qualified-supplier key set must broadcast"

    def test_q21_self_joins_share_orderkey_exchange(self, spark):
        df = QUERIES["waiting_supplier_ranking"](spark, SF)
        s = plan_summary(df)
        # three lineitem passes + orders all shuffle on l_orderkey; with
        # exchange reuse the plan must not exceed one exchange per input
        # plus the final group-by
        assert s["exchanges"] <= 5
        assert s["bhj"] >= 1, "supplier dimension must broadcast"

    def test_bm25_corpus_scored_via_broadcast_scalars(self, spark):
        s = plan_summary(QUERIES["doc_bm25_topk"](spark, SF))
        assert s["smj"] <= 1, "df/avgdl scalars broadcast; only doc-key joins shuffle"


class TestRound2Batch2PlanShapes:
    def test_retention_reuses_user_partitioning(self, spark):
        """distinct → min-agg → join all key on user_id: the cohort
        join must broadcast (cohorts ≤ users) and the whole matrix
        build stays within three exchanges."""
        s = plan_summary(QUERIES["user_retention_cohorts"](spark, SF))
        assert s["bhj"] == 1 and s["smj"] == 0
        assert s["exchanges"] <= 3
        assert set(s["read_columns"]) == {"ts", "user_id"}, "column pruning"

    def test_cube_is_one_expand_pass(self, spark):
        s = plan_summary(QUERIES["orders_cube_summary"](spark, SF))
        assert s["exchanges"] == 1, "CUBE expands map-side; one shuffle only"
        assert s["python_eval"] == 0

    def test_pareto_windows_run_on_aggregate_output(self, spark):
        """Supplier agg shuffles once; both windows (cumulative + grand
        total) run on the supplier-count-sized output, not the fact."""
        s = plan_summary(QUERIES["supplier_pareto_share"](spark, SF))
        assert s["exchanges"] <= 3
        assert s["smj"] == 0 and s["python_eval"] == 0

    def test_cum_distinct_parts_single_fact_join(self, spark):
        s = plan_summary(QUERIES["customer_cum_distinct_parts"](spark, SF))
        assert s["python_eval"] == 0
        assert s["bhj"] + s["smj"] + s["shj"] == 1, "one orders x lineitem join"
        assert s["exchanges"] <= 4

    def test_pmi_single_corpus_shuffle(self, spark):
        """Vocabulary is materialized to a local table (≤24 rows), so
        the corpus is scanned at pair-build time exactly once and pairs
        expand in-array — no self-join, no second corpus exchange."""
        s = plan_summary(QUERIES["corpus_word_pmi"](spark, SF))
        assert s["smj"] == 0 and s["shj"] == 0, "vocab joins must broadcast"
        assert s["exchanges"] <= 4
        assert s["python_eval"] == 0

    def test_normalize_dedup_stays_jvm(self, spark):
        s = plan_summary(QUERIES["doc_normalize_dedup"](spark, SF))
        assert s["python_eval"] == 0
        assert s["exchanges"] <= 2, "two distincts share the source key"


class TestR06Plans:
    def test_containment_joins_all_equality_keyed(self, spark):
        """Both containment operators must candidate-generate through
        equality joins on prefix/posting tokens — never a nested-loop
        or cartesian pass over document pairs."""
        for name in ("dedup_containment_prefix", "dedup_containment_map"):
            s = plan_summary(QUERIES[name](spark, SF))
            assert s["bnlj"] == 0, name
            assert s["python_eval"] == 0, name

    def test_source_overlap_shingle_join_no_nested_loop(self, spark):
        s = plan_summary(QUERIES["corpus_source_overlap"](spark, SF))
        assert s["bnlj"] == 0 and s["python_eval"] == 0

    def test_ivf_ingest_delta_jvm_only(self, spark):
        """Maintenance is two encode scans into two k_coarse-row
        aggregates — all JVM, no Python island, no nested loop over
        the corpus."""
        s = plan_summary(QUERIES["embedding_ivf_ingest_delta"](spark, SF))
        assert s["python_eval"] == 0
        assert s["bnlj"] == 0

    def test_quantile_sketch_validation_is_broadcast(self, spark):
        """The 9-threshold rank validation is an inequality join and
        must run as a BROADCAST nested loop (9-row side shipped), never
        a shuffled cartesian of the events table."""
        from textract_farmdata_pipeline_spark.plans.inspect import plan_text

        df = QUERIES["events_quantile_sketch"](spark, SF)
        s = plan_summary(df)
        assert s["bnlj"] >= 1
        assert "CartesianProduct" not in plan_text(df)
        assert s["python_eval"] == 0

    def test_matryoshka_reference_is_local_relation(self, spark):
        """The full-dim reference set enters as a materialized bounded
        relation (collected once), not as a re-executed scoring plan
        per truncated dim."""
        from textract_farmdata_pipeline_spark.plans.inspect import plan_text

        df = QUERIES["embedding_matryoshka_recall"](spark, SF)
        text = plan_text(df)
        # createDataFrame(collected rows) plans as Scan ExistingRDD —
        # the reference is a materialized bounded relation either way
        assert "Scan ExistingRDD" in text or "LocalTableScan" in text
        assert plan_summary(df)["python_eval"] == 0


class TestRound11PlanShapes:
    """Plan pins for the r11 operators: every one stays JVM-side, and
    the only exchanges are the ones the semantics require."""

    def test_url_dedup_one_canonical_exchange(self, spark):
        """Canonicalization is map-side codegen; the keep-first window
        is the ONE exchange (hash on the canonical string).  No joins,
        no Python."""
        s = plan_summary(QUERIES["doc_url_dedup"](spark, SF))
        assert s["exchanges"] == 1
        assert s["bhj"] + s["smj"] + s["shj"] + s["bnlj"] == 0
        assert s["python_eval"] == 0

    def test_weighted_sample_no_exchange(self, spark):
        """A-ES top-k plans as distributed TakeOrdered — ZERO
        exchanges: per-partition heads, no global sort, and the k-row
        rank collapses into the take."""
        from textract_farmdata_pipeline_spark.plans.inspect import plan_text

        df = QUERIES["doc_weighted_sample"](spark, SF)
        s = plan_summary(df)
        assert s["exchanges"] == 0
        assert "TakeOrdered" in plan_text(df)
        assert s["python_eval"] == 0

    def test_refined_prune_one_rank_exchange(self, spark):
        """The returned plan roots on the staged assignment (training
        pass already ran); rescoring is map-side against the broadcast
        refined book and the per-cell rank is the one exchange."""
        s = plan_summary(QUERIES["embedding_prototype_prune_refined"](spark, SF))
        assert s["exchanges"] == 1
        assert s["python_eval"] == 0

    def test_ccnet_buckets_one_rank_exchange(self, spark):
        """The returned plan roots on the range-staged rank input; the
        per-(range, lang) local window is the one exchange, and the
        NTILE parameters are literals (no join back)."""
        s = plan_summary(QUERIES["doc_ccnet_buckets"](spark, SF))
        assert s["exchanges"] == 1
        assert s["bhj"] + s["smj"] + s["shj"] + s["bnlj"] == 0
        assert s["python_eval"] == 0
