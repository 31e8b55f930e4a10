"""Data-layout jobs: compaction narrows per-file key ranges; Morton
clustering narrows BOTH dimensions simultaneously."""

import glob
import os

from pyspark.sql import functions as F

from hbase_to_mongo_export_spark.plans.layout import compact, morton_cluster
from hbase_to_mongo_export_spark.sources.catalog import load_table


def _per_file_spans(spark, path, col):
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        r = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        spans.append((r.lo, r.hi))
    return spans


class TestCompaction:
    def test_compact_produces_target_files_with_disjoint_ranges(
        self, spark, sf_dir, tmp_path
    ):
        orders = load_table(spark, sf_dir, "orders")
        out = str(tmp_path / "orders_compact")
        compact(orders, out, sort_col="o_orderkey", target_files=4)
        files = glob.glob(os.path.join(out, "part-*.parquet"))
        assert len(files) == 4
        spans = sorted(_per_file_spans(spark, out, "o_orderkey"))
        # range partitioning ⇒ files cover non-overlapping key intervals
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2
        # and nothing was lost
        assert spark.read.parquet(out).count() == orders.count()

    def test_max_records_per_file_splits(self, spark, sf_dir, tmp_path):
        nation = load_table(spark, sf_dir, "nation")
        out = str(tmp_path / "nation_split")
        compact(nation, out, target_files=1, max_records_per_file=10)
        files = glob.glob(os.path.join(out, "part-*.parquet"))
        assert len(files) >= 3  # 25 rows / 10 per file


class TestBucketExpr:
    """The approx-quantile bucket map (the scale-safe replacement for the
    global-window ntile) must agree exactly with a reference binary
    search over the same edges — including duplicate-heavy edges."""

    def _check(self, spark, df):
        import numpy as np

        from hbase_to_mongo_export_spark.plans.layout import (
            bucket_expr,
            quantile_edges,
        )

        edges = quantile_edges(df, ["v"], 256)["v"]
        got = df.select("v", bucket_expr("v", edges).alias("b")).collect()
        arr = np.array(edges)
        for r in got:
            assert r["b"] == int(np.searchsorted(arr, r["v"], side="right")), r

    def test_uniform_values(self, spark):
        df = spark.range(4000).select((F.col("id") % 997).cast("double").alias("v"))
        self._check(spark, df)

    def test_heavy_duplicate_skew(self, spark):
        # 90% of rows share one value: edges collapse but bucket ids stay
        # rank-proportional, so the skewed dimension still spreads
        df = spark.range(4000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0.0))
            .otherwise(F.col("id").cast("double"))
            .alias("v")
        )
        self._check(spark, df)

    def test_null_maps_to_bucket_zero(self, spark):
        from hbase_to_mongo_export_spark.plans.layout import bucket_expr

        df = spark.createDataFrame([(None,), (5.0,)], "v double")
        got = {r["v"]: r["b"] for r in df.select(
            "v", bucket_expr("v", [1.0, 4.0, 9.0]).alias("b")
        ).collect()}
        assert got[None] == 0 and got[5.0] == 2

    def test_non_numeric_column_rejected(self, spark):
        from hbase_to_mongo_export_spark.plans.layout import morton_clustered

        df = spark.createDataFrame([("a", 1.0)], "s string, v double")
        import pytest

        with pytest.raises(ValueError, match="must be numeric"):
            morton_clustered(df, "s", "v")


class TestMortonCodeN:
    def test_bit_interleave_positions(self, spark):
        """bit i of column j lands at position i*N + j — checked against
        a hand-computed 3-column example."""
        from hbase_to_mongo_export_spark.plans.layout import morton_code_n

        df = spark.createDataFrame([(0b101, 0b011, 0b110)], "a long, b long, c long")
        got = df.select(
            morton_code_n([F.col("a"), F.col("b"), F.col("c")], bits=3).alias("z")
        ).first()["z"]
        expect = 0
        for i in range(3):
            expect |= ((0b101 >> i) & 1) << (3 * i)
            expect |= ((0b011 >> i) & 1) << (3 * i + 1)
            expect |= ((0b110 >> i) & 1) << (3 * i + 2)
        assert got == expect

    def test_overflow_and_arity_guards(self, spark):
        from hbase_to_mongo_export_spark.plans.layout import morton_code_n

        import pytest

        with pytest.raises(ValueError, match="at least two"):
            morton_code_n([F.col("a")])
        with pytest.raises(ValueError, match="overflows"):
            morton_code_n([F.col("a")] * 8, bits=8)

    def test_three_column_clustering_narrows_every_dim(self, spark, sf_dir, tmp_path):
        from hbase_to_mongo_export_spark.plans.layout import morton_clustered
        from hbase_to_mongo_export_spark.sources.catalog import load_table

        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        out = str(tmp_path / "orders_z3")
        (
            morton_clustered(orders, "o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(8, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(out)
        )
        assert spark.read.parquet(out).count() == orders.count()
        glob_spans = orders.agg(
            (F.max("o_orderkey") - F.min("o_orderkey")).alias("k"),
            (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("p"),
        ).first()
        for col, dom in (("o_orderkey", glob_spans.k),
                         ("o_custkey", glob_spans.c),
                         ("o_totalprice", glob_spans.p)):
            spans = _per_file_spans(spark, out, col)
            avg = sum(hi - lo for lo, hi in spans) / len(spans)
            # with 8 files and 3 dims, each dim's mean span must stay
            # meaningfully under the full domain (2^(1/3) split per dim)
            assert avg < 0.85 * dom, (col, avg, dom)


class TestMortonClustering:
    def test_zorder_narrows_both_dimensions(self, spark, sf_dir, tmp_path):
        """After Z-ordering on (o_custkey, o_totalprice), a typical file
        spans a small fraction of BOTH value domains — the property that
        lets parquet min/max stats prune scans on either predicate."""
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        out = str(tmp_path / "orders_z")
        morton_cluster(orders, "o_custkey", "o_totalprice", out, target_files=16)

        assert spark.read.parquet(out).count() == orders.count()
        glob_c = orders.agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("p"),
        ).first()
        spans_c = _per_file_spans(spark, out, "o_custkey")
        spans_p = _per_file_spans(spark, out, "o_totalprice")
        avg_c = sum(hi - lo for lo, hi in spans_c) / len(spans_c)
        avg_p = sum(hi - lo for lo, hi in spans_p) / len(spans_p)
        # 16 files: an unclustered layout gives avg span ≈ full domain in
        # at least one dimension; Z-order keeps the mean span of EACH
        # dimension well under the full domain.
        assert avg_c < 0.6 * glob_c.c
        assert avg_p < 0.6 * glob_c.p
