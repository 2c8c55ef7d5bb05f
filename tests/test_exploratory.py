"""Exploratory comparator helpers: golden values vs DuckDB (the reference's
backend for similarity_analysis) and vs Spark's soundex builtin."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from memory_optimized_splink_spark.exploratory import (
    comparator_score,
    comparator_score_chart,
    comparator_score_df,
    comparator_score_threshold_chart,
    phonetic_match_chart,
    phonetic_transform,
    phonetic_transform_df,
    soundex,
)

# the reference docstrings' own examples plus edge cases
DATA = {
    "string1": ["Stephen", "Stephen", "Stephen", "Richard", "aaa", ""],
    "string2": ["Stephen", "Steven", "Stephan", "iRchard", "bbb", "x"],
}


def test_comparator_score_df_matches_duckdb():
    got = comparator_score_df(DATA, "string1", "string2", decimal_places=4)
    con = duckdb.connect()
    tbl = pd.DataFrame(DATA)  # noqa: F841
    ref = con.execute("""
        select levenshtein(string1, string2) lev,
               damerau_levenshtein(string1, string2) dl,
               round(jaro_similarity(string1, string2), 4) j,
               round(jaro_winkler_similarity(string1, string2), 4) jw,
               case when len(string1) > 0 and len(string2) > 0
                    then round(jaccard(string1, string2), 4) end jac
        from tbl""").fetchdf()
    assert (got.levenshtein_distance.to_numpy() == ref.lev.to_numpy()).all()
    assert (got.damerau_levenshtein_distance.to_numpy()
            == ref.dl.to_numpy()).all()
    assert np.allclose(got.jaro_similarity, ref.j)
    assert np.allclose(got.jaro_winkler_similarity, ref.jw)
    # duckdb's jaccard ERRORS on empty strings; ours returns 0.0 there
    mask = ref.jac.notna()
    assert np.allclose(got.jaccard_similarity[mask], ref.jac[mask])
    assert (got.jaccard_similarity[~mask] == 0.0).all()


def test_comparator_score_single_pair():
    row = comparator_score("Richard", "iRchard").iloc[0]
    # one transposition of adjacent chars: DL=1, lev=2
    assert row["damerau_levenshtein_distance"] == 1
    assert row["levenshtein_distance"] == 2
    assert 0.9 < row["jaro_winkler_similarity"] <= 1.0


def test_charts_are_vegalite_specs():
    charts = comparator_score_chart(DATA, "string1", "string2")
    for key in ("similarity", "distance"):
        spec = charts[key]
        assert spec["$schema"].startswith("https://vega.github.io/schema")
        assert spec["data"]["values"]
        assert {"x", "y", "color"} <= set(spec["encoding"])
    tspec = comparator_score_threshold_chart(
        DATA, "string1", "string2",
        similarity_threshold=0.8, distance_threshold=2)
    cond = tspec["similarity"]["encoding"]["color"]["condition"]
    assert "0.8" in cond["test"]


def test_soundex_matches_spark_builtin(spark):
    from pyspark.sql import functions as F

    words = ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
             "Pfister", "Honeyman", "Stephen", "Steven", "Wu", "H",
             "O'Brien", "McDonald", "Lee-Smith"]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    expected = {r["w"]: r["sx"] for r in
                sdf.select("w", F.soundex("w").alias("sx")).collect()}
    for w in words:
        assert soundex(w) == expected[w], w


def test_phonetic_transform_and_chart():
    t = phonetic_transform("Stephen")
    assert t["soundex"] == soundex("Stephen")
    assert isinstance(t["dmetaphone"], tuple)
    df = phonetic_transform_df(DATA, "string1", "string2")
    assert list(df.columns) == ["string1", "string2", "soundex",
                                "dmetaphone"]
    # Stephen/Stephen agree on everything
    assert df.iloc[0]["soundex"][0] == df.iloc[0]["soundex"][1]
    spec = phonetic_match_chart(DATA, "string1", "string2")
    recs = spec["data"]["values"]
    exact = [r for r in recs if r["strings_to_compare"]
             == "Stephen, Stephen"]
    assert all(r["match"] == 1 for r in exact) and exact
