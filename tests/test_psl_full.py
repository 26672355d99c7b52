"""The vendored real-content PSL snapshot (r10 verdict task 4): prove
that swapping the 23-row fixture for the ~1k-rule real list changes
the rule-table CONTENTS, never the plan — identical operator
sequence, same extraction results on every host the oracle derives
independently, bounded broadcast.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from spec_search_spark.operators.psl import (
    PSL_RULES,
    PSL_EXTRACT_SQL,
    full_psl_rules,
    parse_psl_file,
    psl_domain_extract,
    psl_rules_df,
    with_psl_domain,
)


@pytest.fixture(scope="module")
def full_rules():
    return full_psl_rules()


def test_snapshot_parses_and_is_superset_shaped(full_rules):
    """The snapshot loads through the upstream-format parser, is an
    order of magnitude bigger than the fixture, contains every fixture
    rule the synthetic hosts depend on, and covers every rule shape."""
    assert len(full_rules) > 900
    assert len(full_rules) == len(set(full_rules))
    for r in PSL_RULES:
        assert r in full_rules, f"fixture rule {r} missing from snapshot"
    assert any(r.startswith("*.") for r in full_rules)
    assert any(r.startswith("!") for r in full_rules)
    # 4-label rule present (drives the explode width to 4)
    assert "pvt.k12.ma.us" in full_rules
    for r in full_rules:
        key = r[1:] if r.startswith("!") else r
        assert re.fullmatch(r"[a-z0-9*]([a-z0-9.\-*]*[a-z0-9])?", key), r


def test_plan_shape_identical_under_full_list(spark, full_rules):
    """The engine's physical operator SEQUENCE must not depend on the
    rule table: only the candidate-array literal (explode width) and
    the broadcast LocalRelation contents may differ."""
    hosts = spark.createDataFrame(
        [(i, h) for i, h in enumerate(["a.example.com", "b.example.co.uk"])],
        "id long, host string",
    )

    def op_seq(df) -> list[str]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        ops = []
        for line in plan.splitlines():
            m = re.search(r"^[\s:+\-*(0-9)]*([A-Za-z]+)", line)
            if m:
                ops.append(m.group(1))
        return ops

    fixture_ops = op_seq(with_psl_domain(hosts, spark))
    full_ops = op_seq(with_psl_domain(hosts, spark, rules=full_rules))
    assert fixture_ops == full_ops


def test_extraction_agrees_with_fixture_on_shared_rules(spark, full_rules):
    """On hosts governed by rules present in BOTH tables, the full
    list must produce byte-identical extractions; on hosts whose TLD
    only the full list knows, it must upgrade the implicit-`*` default
    to the real rule."""
    cases = [
        # (host, expected suffix under FULL list, expected domain)
        ("a.example.com", "com", "example.com"),
        ("B.Example.CO.UK", "co.uk", "example.co.uk"),  # case-insensitive
        ("x.city.kobe.jp", "kobe.jp", "city.kobe.jp"),  # exception
        ("x.y.kobe.jp", "y.kobe.jp", "x.y.kobe.jp"),  # wildcard
        ("foo.k12.ma.us", "k12.ma.us", "foo.k12.ma.us"),
        ("a.pvt.k12.ma.us", "pvt.k12.ma.us", "a.pvt.k12.ma.us"),  # 4-label
        ("app.github.io", "github.io", "app.github.io"),  # private section
        ("x.unknowntld", "unknowntld", "x.unknowntld"),  # implicit '*'
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(cases)], "id long, host string"
    )
    got = {
        r["id"]: (r["public_suffix"], r["domain"])
        for r in with_psl_domain(df, spark, rules=full_rules).collect()
    }
    for i, (host, suffix, domain) in enumerate(cases):
        assert got[i] == (suffix, domain), (host, got[i])
    # fixture agreement on fixture-covered hosts (the first five cases
    # — case 5's `pvt.k12.ma.us` rule exists only in the snapshot, so
    # the fixture correctly stops one label earlier there)
    got_fix = {
        r["id"]: (r["public_suffix"], r["domain"])
        for r in with_psl_domain(df, spark).collect()
    }
    for i in range(5):
        assert got_fix[i] == got[i], cases[i]


def test_registered_query_green_under_full_list(spark, sf_dir, monkeypatch):
    """psl_domain_extract's DuckDB oracle derives expected values
    independently of the rule table — it must stay green when the
    engine runs the full snapshot (SPARK_GRAFT_PSL_FULL=1)."""
    monkeypatch.setenv("SPARK_GRAFT_PSL_FULL", "1")
    got = {
        r["htype"]: (
            r["n_hosts"],
            r["n_suffixes"],
            r["n_domains"],
            r["n_null_domain"],
            r["sample_domain"],
        )
        for r in psl_domain_extract(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        r[0]: tuple(r[1:]) for r in con.sql(PSL_EXTRACT_SQL).fetchall()
    }
    assert got == want


def test_broadcast_stays_bounded(spark, full_rules):
    """The full rule table must remain a trivially broadcastable dim:
    well under the 10 MB the bench note promises."""
    df = psl_rules_df(spark, full_rules)
    rows = df.collect()
    assert len(rows) == len(full_rules)
    approx_bytes = sum(len(r["rule"]) + 16 for r in rows)
    assert approx_bytes < 1_000_000  # ~40 KB measured; 10 MB promised


def test_parse_psl_file_skips_comments(tmp_path):
    p = tmp_path / "mini.dat"
    p.write_text("// comment\n\ncom\n*.ck\n!www.ck\n// end\n")
    assert parse_psl_file(str(p)) == ("com", "*.ck", "!www.ck")
