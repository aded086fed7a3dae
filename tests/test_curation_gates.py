"""Round-6 curation gates: Gopher rules, C4 line filters, UniMax mixture.

Each test builds a SYNTHETIC documents parquet crafted so every rule
discriminates (the lorem fixture trips only a subset — e.g. Gopher's
stopword rule fails all 500 docs because the vocabulary contains only
'the' of the eight required words), then asserts exact expected counts
AND replays the DuckDB oracle on the same parquet — a cross-engine check
on a data distribution the sf harness never exercises.
"""

from __future__ import annotations

import duckdb
import pytest

from sentiment_analysis_bigdata_spark.workloads import scale_q, text_q


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(sql, sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, sorted(map(tuple, res.fetchall()))


def _assert_matches_oracle(df, sql, sf_dir):
    got = sorted(map(tuple, df.collect()))
    cols, want = _oracle(sql, sf_dir)
    assert df.columns == cols
    assert got == want


class TestGopherQualityGate:
    def test_each_rule_discriminates(self, spark, tmp_path):
        filler = " ".join(["word"] * 58)
        rows = [
            ("syn", f"the and {filler}"),                       # passes all
            ("syn", "the and just ten small words here now ok yes"),  # wc < 50
            ("syn", "the and " + " ".join(["ab"] * 60)),        # mean len < 3
            ("syn", "the and " + " ".join(["word"] * 50) + " " + " ".join(["#"] * 10)),  # symbols
            ("syn", "the and " + " ".join(["word"] * 30) + " " + " ".join(["123"] * 30)),  # alpha
            ("syn", " ".join(["word"] * 60)),                   # no stopwords
        ]
        sf = _write_docs(spark, tmp_path, rows)
        out = text_q.q_gopher_quality_gate(spark, sf)
        row = out.collect()[0].asDict()
        assert row == {
            "source": "syn",
            "n_docs": 6,
            "n_pass": 1,
            "n_fail_word_count": 1,
            "n_fail_mean_word_len": 1,
            "n_fail_symbol_ratio": 1,
            "n_fail_alpha": 1,
            "n_fail_stopwords": 1,
        }
        _assert_matches_oracle(out, text_q.SQL_GOPHER_QUALITY_GATE, sf)

    def test_fixture_stopword_rule_dominates(self, spark):
        # documented fixture property: the lorem vocabulary has only one
        # of Gopher's eight required stopwords, so every doc fails there
        out = text_q.q_gopher_quality_gate(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert sum(r["n_fail_stopwords"] for r in rows) == sum(
            r["n_docs"] for r in rows
        )
        assert sum(r["n_pass"] for r in rows) == 0


class TestC4LineFilters:
    def test_planted_structure_discriminates(self, spark):
        out = text_q.q_c4_line_filters(spark, "/root/testdata/sf0.001")
        t = out.groupBy().sum().collect()[0]
        n_lines, kept = t["sum(n_lines)"], t["sum(n_lines_kept)"]
        assert 0 < kept < n_lines
        assert t["sum(n_fail_punct)"] > 0
        assert t["sum(n_fail_short)"] > 0
        assert t["sum(n_fail_policy)"] > 0
        assert 0 < t["sum(n_docs_kept)"] < t["sum(n_docs)"]

    def test_synthetic_cross_engine(self, spark, tmp_path):
        rows = [
            ("a", " ".join(f"w{i}" for i in range(37))),
            ("a", " ".join(f"x{i}" for i in range(8))),
            ("b", " ".join(f"y{i}" for i in range(95))),
            ("b", "   "),  # whitespace-only doc: zero lines on BOTH engines
        ]
        sf = _write_docs(spark, tmp_path, rows)
        out = text_q.q_c4_line_filters(spark, sf)
        got = {r["source"]: r.asDict() for r in out.collect()}
        # a line-less doc contributes zero lines on BOTH engines and so
        # drops out of the line-grain report entirely (n_docs counts docs
        # WITH lines) — without the empty-doc guard Spark would fabricate
        # two bogus lines for it (sequence(0,-1) counts down) and diverge
        assert got["b"]["n_docs"] == 1
        _assert_matches_oracle(out, text_q.SQL_C4_LINE_FILTERS, sf)


class TestUnimaxMixture:
    def test_water_filling_closed_form(self, spark, tmp_path):
        # capacities: a=200, b=2000, c=2000; budget = 19*2100//10 = 3990
        # -> a capped at 2 epochs; b, c uncapped at level (3990-200)//2
        rows = (
            [("a", " ".join(["tok"] * 50))] * 2
            + [("b", " ".join(["tok"] * 100))] * 10
            + [("c", " ".join(["tok"] * 100))] * 10
        )
        sf = _write_docs(spark, tmp_path, rows)
        out = scale_q.q_unimax_mixture(spark, sf)
        got = {r["source"]: r.asDict() for r in out.collect()}
        assert got["a"]["capped"] is True
        assert got["a"]["allocated"] == 200 and got["a"]["epochs"] == 2.0
        for s in ("b", "c"):
            assert got[s]["capped"] is False
            assert got[s]["allocated"] == (3990 - 200) // 2
            assert got[s]["epochs"] == pytest.approx(1895 / 1000)
        assert sum(r["allocated"] for r in got.values()) <= 3990
        _assert_matches_oracle(out, scale_q.SQL_UNIMAX_MIXTURE, sf)

    def test_fixture_has_both_capped_and_uncapped(self, spark):
        rows = scale_q.q_unimax_mixture(spark, "/root/testdata/sf0.001").collect()
        capped = [r for r in rows if r["capped"]]
        assert 0 < len(capped) < len(rows)
        for r in capped:
            assert r["epochs"] == 2.0
        # every uncapped source receives the same integer level
        levels = {r["allocated"] for r in rows if not r["capped"]}
        assert len(levels) == 1
