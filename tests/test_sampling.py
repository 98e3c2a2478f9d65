"""Deterministic sampling/split operators: reproducibility is the
whole contract — every test here would fail for DataFrame.sample."""

import pytest
from pyspark.sql import functions as F

from jepl_spark.operators import sampling as S


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).cast("string").alias("lang"),
            (F.col("id") * 7 % 101).alias("score"),
        )
        .persist()
    )


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


class TestHashSample:
    def test_partitioning_invariant(self, docs):
        a = _ids(S.hash_sample(docs, "doc_id", 0.25))
        b = _ids(S.hash_sample(docs.repartition(17, "lang"), "doc_id", 0.25))
        c = _ids(S.hash_sample(docs.coalesce(1), "doc_id", 0.25))
        assert a == b == c and len(a) > 0

    def test_fraction_accuracy(self, docs):
        n = S.hash_sample(docs, "doc_id", 0.25).count()
        assert 0.18 * 2000 < n < 0.32 * 2000  # ±~7pp at n=2000

    def test_nested_monotone(self, docs):
        """A 10% sample is a subset of the 25% sample (same seed) —
        the property that lets a pipeline grow its sample later."""
        small = set(_ids(S.hash_sample(docs, "doc_id", 0.10)))
        big = set(_ids(S.hash_sample(docs, "doc_id", 0.25)))
        assert small <= big

    def test_seed_draws_independent_sample(self, docs):
        a = set(_ids(S.hash_sample(docs, "doc_id", 0.25, seed="a")))
        b = set(_ids(S.hash_sample(docs, "doc_id", 0.25, seed="b")))
        assert a != b

    def test_bad_fraction_rejected(self, docs):
        with pytest.raises(ValueError):
            S.hash_sample(docs, "doc_id", 1.5)


class TestHashSplit:
    WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_disjoint_exhaustive(self, docs):
        out = S.hash_split(docs, "doc_id", self.WEIGHTS)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] + counts["test"]

    def test_membership_stable_under_corpus_growth(self, docs):
        """A row's split does not change when the corpus doubles —
        eval-set contamination safety."""
        half = docs.where(F.col("doc_id") < 1000)
        full_map = {
            r["doc_id"]: r["split"]
            for r in S.hash_split(docs, "doc_id", self.WEIGHTS).collect()
        }
        half_map = {
            r["doc_id"]: r["split"]
            for r in S.hash_split(half, "doc_id", self.WEIGHTS).collect()
        }
        assert all(full_map[k] == v for k, v in half_map.items())

    def test_weights_must_sum_to_one(self, docs):
        with pytest.raises(ValueError):
            S.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


class TestStratified:
    def test_per_stratum_rates(self, docs):
        out = S.stratified_hash_sample(
            docs, "doc_id", "lang", {"0": 1.0, "1": 0.2}, default_fraction=0.0
        )
        got = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert got["0"] == 400  # keep-all stratum is exact
        assert 40 < got.get("1", 0) < 140
        assert set(got) == {"0", "1"}  # default 0 drops the rest

    def test_null_ids_drop_out(self, docs):
        """NULL ids hash to NULL (NULL-propagating concat) and drop out
        of every stratum, instead of all colliding on one sentinel hash
        that selects them all-or-none."""
        nulled = docs.withColumn(
            "doc_id",
            F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("doc_id")),
        )
        out = S.stratified_hash_sample(
            nulled, "doc_id", "lang", {"0": 1.0, "1": 1.0}
        )
        assert out.where(F.col("doc_id").isNull()).count() == 0
        # non-null rows of a keep-all stratum are all present
        assert (
            out.where(F.col("lang") == "0").count()
            == nulled.where(
                (F.col("lang") == "0") & F.col("doc_id").isNotNull()
            ).count()
        )

    def test_stratum_rates_independent(self, docs):
        """Raising lang-1's rate must not change which lang-0 rows
        are kept (per-stratum seeded hash)."""
        a = S.stratified_hash_sample(docs, "doc_id", "lang", {"0": 0.5, "1": 0.1})
        b = S.stratified_hash_sample(docs, "doc_id", "lang", {"0": 0.5, "1": 0.9})
        a0 = _ids(a.where(F.col("lang") == "0"))
        b0 = _ids(b.where(F.col("lang") == "0"))
        assert a0 == b0 and len(a0) > 0


class TestReservoir:
    def test_k_per_group_partitioning_invariant(self, docs):
        a = S.deterministic_reservoir(docs, "doc_id", 7, group_by="lang")
        b = S.deterministic_reservoir(
            docs.repartition(13), "doc_id", 7, group_by="lang"
        )
        ra = sorted((r["lang"], r["doc_id"]) for r in a.collect())
        rb = sorted((r["lang"], r["doc_id"]) for r in b.collect())
        assert ra == rb
        per = {}
        for lang, _ in ra:
            per[lang] = per.get(lang, 0) + 1
        assert all(v == 7 for v in per.values())

    def test_rank_prefix_property(self, docs):
        """k=3 rows are exactly the rank ≤ 3 prefix of the k=7 sample —
        shrinking k never resamples."""
        k7 = S.deterministic_reservoir(
            docs, "doc_id", 7, group_by="lang", rank_col="rk"
        )
        k3 = S.deterministic_reservoir(docs, "doc_id", 3, group_by="lang")
        prefix = sorted(
            (r["lang"], r["doc_id"]) for r in k7.where("rk <= 3").collect()
        )
        got = sorted((r["lang"], r["doc_id"]) for r in k3.collect())
        assert prefix == got

    def test_global_reservoir(self, docs):
        assert S.deterministic_reservoir(docs, "doc_id", 11).count() == 11

    def test_bad_k(self, docs):
        with pytest.raises(ValueError):
            S.deterministic_reservoir(docs, "doc_id", 0)


class TestNullIds:
    def test_null_ids_drop_from_sample_and_reservoir(self, spark):
        df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id: int")
        assert None not in {
            r["doc_id"] for r in S.hash_sample(df, "doc_id", 1.0).collect()
        }
        got = S.deterministic_reservoir(df, "doc_id", 10).collect()
        assert sorted(r["doc_id"] for r in got) == [1, 2]

    def test_null_ids_get_null_split(self, spark):
        df = spark.createDataFrame([(1,), (None,)], "doc_id: int")
        out = {r["doc_id"]: r["split"]
               for r in S.hash_split(df, "doc_id",
                                     {"a": 0.5, "b": 0.5}).collect()}
        assert out[None] is None and out[1] in ("a", "b")


# -- epoch mixing -------------------------------------------------------------


def _mix_df(spark, n=1000):
    return spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(n)], ["doc_id", "source"]
    )


def test_epoch_mix_counts_and_weights(spark):
    from jepl_spark.operators.sampling import epoch_mix

    df = _mix_df(spark)
    out = epoch_mix(df, {"src0": 2.5, "src1": 0.5, "src2": 0.0})
    by = {r["source"]: r["count"]
          for r in out.groupBy("source").count().collect()}
    assert by.get("src2") is None           # weight 0 drops the source
    assert by["src3"] == 250                # default weight 1.0
    assert 500 <= by["src0"] <= 750         # 2 full + ~half a third
    assert 0 < by["src1"] < 250             # ~half of one epoch
    # every full epoch present: each src0 row appears at least twice
    twice = (
        out.where(F.col("source") == "src0")
        .groupBy("doc_id").count().where("count < 2").count()
    )
    assert twice == 0


def test_epoch_mix_deterministic_and_nested(spark):
    from jepl_spark.operators.sampling import epoch_mix

    df = _mix_df(spark)
    w = {"src0": 2.5, "src1": 0.5, "src2": 0.0}
    a = sorted(map(tuple,
                   epoch_mix(df, w).select("doc_id", "epoch").collect()))
    b = sorted(map(tuple,
                   epoch_mix(df.repartition(13), w)
                   .select("doc_id", "epoch").collect()))
    assert a == b  # partition-independent
    # raising a weight only ADDS copies (thresholds nest)
    s3 = set(map(tuple,
                 epoch_mix(df, {**w, "src0": 2.8})
                 .select("doc_id", "epoch").collect()))
    assert set(a) <= s3


def test_epoch_mix_validation(spark):
    import pytest

    from jepl_spark.operators.sampling import epoch_mix

    df = _mix_df(spark, 4)
    with pytest.raises(ValueError):
        epoch_mix(df, {"src0": -1.0})
    with pytest.raises(ValueError):
        epoch_mix(df, {}, default_weight=-0.1)
    with pytest.raises(ValueError):
        epoch_mix(df.withColumn("epoch", F.lit(0)), {"src0": 2.0})
