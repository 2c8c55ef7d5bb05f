"""Double Metaphone parity against the published test-vector set (Philips
2000 reference implementation outputs, as circulated in the aspell /
metaphone test suites), plus the Spark level/UDF surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.functions.phonetic import (
    double_metaphone,
    qgram_tokenise,
    with_phonetic_column,
)

# (input, primary, secondary) — published double-metaphone vectors
VECTORS = [
    ("smith", "SM0", "XMT"), ("schmidt", "XMT", "SMT"),
    ("katherine", "K0RN", "KTRN"), ("catherine", "K0RN", "KTRN"),
    ("thomas", "TMS", "TMS"), ("jose", "HS", "HS"),
    ("san jose", "SNHS", "SNHS"), ("wasserman", "ASRM", "FSRM"),
    ("cabrillo", "KPRL", "KPR"), ("gallegos", "KLKS", "KKS"),
    ("caesar", "SSR", "SSR"), ("chianti", "KNT", "KNT"),
    ("czerny", "SRN", "XRN"), ("focaccia", "FKX", "FKX"),
    ("bellocchio", "PLX", "PLX"), ("bacchus", "PKS", "PKS"),
    ("accident", "AKST", "AKST"), ("edge", "AJ", "AJ"),
    ("edgar", "ATKR", "ATKR"), ("ghost", "KST", "KST"),
    ("school", "SKL", "SKL"), ("thumb", "0M", "TM"),
    ("dumb", "TM", "TM"), ("broughton", "PRTN", "PRTN"),
    ("rough", "RF", "RF"), ("snider", "SNTR", "XNTR"),
    ("schneider", "XNTR", "SNTR"), ("arnow", "ARN", "ARNF"),
    ("filipowicz", "FLPT", "FLPF"), ("breaux", "PR", "PR"),
    ("wachtler", "AKTL", "FKTL"), ("tagliaro", "TKLR", "TLR"),
    ("biaggi", "PJ", "PK"), ("island", "ALNT", "ALNT"),
    ("sugar", "XKR", "SKR"), ("michael", "MKL", "MXL"),
    ("xavier", "SF", "SFR"), ("knight", "NT", "NT"),
    ("wright", "RT", "RT"), ("pierce", "PRS", "PRS"),
    ("ghiradelli", "JRTL", "JRTL"), ("hugh", "H", "H"),
]


@pytest.mark.parametrize("word,pri,sec", VECTORS)
def test_double_metaphone_vectors(word, pri, sec):
    assert double_metaphone(word) == (pri, sec)


def test_double_metaphone_edge_inputs():
    assert double_metaphone(None) == ("", "")
    assert double_metaphone("") == ("", "")
    assert double_metaphone("123!?") == ("", "")
    assert double_metaphone("o'brien") == double_metaphone("OBRIEN")


def test_phonetic_udf_and_join(spark):
    df = spark.createDataFrame(
        [("1", "smith"), ("2", "smyth"), ("3", "jones")], "id string, name string")
    out = {r["id"]: r["dm_name"]
           for r in with_phonetic_column(df, "name").collect()}
    assert out["1"] == out["2"] == "SM0"   # smith/smyth phonetic-equal
    assert out["3"] == "JNS"


def test_dmetaphone_comparison_level(spark):
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )

    rows = [("1", "k", "smith"), ("2", "k", "smyth"), ("3", "k", "jones")]
    df = spark.createDataFrame(rows, "unique_id string, k string, name string")
    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("dmetaphone", m=0.5, u=0.05),
                ComparisonLevel("else", m=0.1, u=0.9),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
    )
    pairs = block_using_rules(df, s)
    cv = {(r["unique_id_l"], r["unique_id_r"]): r["gamma_name"]
          for r in compute_comparison_vectors(pairs, df, s).collect()}
    # gammas are best-first: exact=2, dmetaphone=1, else=0
    assert cv[("1", "2")] == 1   # phonetic-equal, not exact
    assert cv[("1", "3")] == 0


def test_qgram_tokenise(spark):
    df = spark.createDataFrame([("abcd",), ("a",)], "t string")
    got = [r[0] for r in df.select(qgram_tokenise(F.col("t"), 2)).collect()]
    assert got[0] == ["ab", "bc", "cd"]
    assert got[1] == ["a"]


def test_registered_udf_surface(spark):
    """SQL-callable names mirror the reference JAR registrations."""
    from memory_optimized_splink_spark.functions.phonetic import (
        register_phonetic_udfs,
    )
    register_phonetic_udfs(spark)
    row = spark.sql(
        "select Dmetaphone('smith') p, DmetaphoneAlt('smith') s, "
        "QgramTokeniser('abcd') q").collect()[0]
    assert row["p"] == "SM0" and row["s"] == "XMT"
    assert row["q"] == ["ab", "bc", "cd"]
    # UDF output equals the native expression
    from memory_optimized_splink_spark.functions.phonetic import (
        qgram_tokenise,
    )
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("Hello",), ("a",)], "t string")
    native = [r[0] for r in df.select(qgram_tokenise(F.col("t"))).collect()]
    viaudf = [r[0] for r in spark.sql(
        "select QgramTokeniser(t) from {df}", df=df).collect()]
    assert native == viaudf
