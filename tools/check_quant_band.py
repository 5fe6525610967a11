#!/usr/bin/env python3
"""Regime-aware oracle check for the VALUE-EXACT quantile queries above
the sketch's sample capacity.

The quantile-view oracles (`corpus_view_quantile`, `corpus_card_live_q`)
compare served values to DuckDB's exact `quantile_cont` at 6dp — valid
while every group holds <= K=4096 occurrences, where the deterministic
bottom-k sample IS the multiset (true at the sf0.01 gate and at sf0.1;
`tools/check_oracle.py` stays the gate there). Above capacity the sample
is a uniform subset and the served value is an ESTIMATE whose rank error
concentrates at sqrt(p(1-p)/K); this checker applies the per-group
regime-aware test the exact hash cannot:

  occurrences <= K  ->  |served - exact_p| <= 1e-6   (the exact regime)
  occurrences  > K  ->  served in [exact_{p-4s}, exact_{p+4s}],
                        s = sqrt(p(1-p)/K)           (the sampled regime)

The 4-sigma rank band is a ~1-in-16k two-sided bound per group, and the
sketch sample is a PURE FUNCTION of the input set (bottom-k by a
deterministic hash), so a pass is reproducible, not flaky.

Usage: python3 tools/check_quant_band.py <sfDir> <verifyOutDir>
Checks whichever of the two queries has output under <verifyOutDir>.
"""
import sys, os, glob, math
import duckdb
import pandas as pd

K = 4096
NSIGMA = 4.0

LIFECYCLE_V = """
  WITH v AS (SELECT doc_id,
      CASE WHEN doc_id % 27 = 2 THEN text || ' re'
           WHEN doc_id % 10 = 1 THEN text || ' u1'
           ELSE text END AS text,
      coalesce(lang, 'und') AS card_lang
    FROM read_parquet('{docs}')
    WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
"""

def clamp(p):
    return min(1.0, max(0.0, p))

def bands_sql(docs, group_expr, value_expr, quants):
    """Per-group occurrence count + exact/lo/hi quantiles for each (name, p)."""
    cols = []
    for name, p in quants:
        s = math.sqrt(p * (1 - p) / K)
        lo, hi = clamp(p - NSIGMA * s), clamp(p + NSIGMA * s)
        cols.append(f"quantile_cont({value_expr[name]}, {p}) AS {name}_exact")
        cols.append(f"quantile_cont({value_expr[name]}, {lo}) AS {name}_lo")
        cols.append(f"quantile_cont({value_expr[name]}, {hi}) AS {name}_hi")
    return (LIFECYCLE_V.format(docs=docs) +
            f"SELECT {group_expr} AS grp, count(*) AS n_occ, " +
            ", ".join(cols) + " FROM v GROUP BY 1")

def check_group(name, grp, n_occ, served, exact, lo, hi):
    if pd.isna(served):
        return f"{name}[{grp}]: served value is null"
    if n_occ <= K:
        if abs(served - exact) > 1e-6:
            return (f"{name}[{grp}]: EXACT regime (n={n_occ}) but "
                    f"served {served} != exact {exact}")
        return None
    if not (min(lo, hi) - 1e-6 <= served <= max(lo, hi) + 1e-6):
        return (f"{name}[{grp}]: SAMPLED regime (n={n_occ}) served "
                f"{served} outside [{lo}, {hi}] (exact {exact})")
    return None

def load_spark(outdir, q):
    files = glob.glob(f"{outdir}/{q}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files])

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    docs = f"{sfdir}/documents.parquet"
    if os.path.isdir(docs):  # Spark-written fixture: a dir of part files
        docs = f"{docs}/*.parquet"
    con = duckdb.connect()
    failures, checked = [], 0

    spark = load_spark(outdir, "corpus_view_quantile")
    if spark is not None:
        quants = [("p50_chars", 0.5), ("p90_load", 0.9)]
        vals = {"p50_chars": "CAST(length(text) AS DOUBLE)",
                "p90_load": ("CAST(length(text) + CASE WHEN doc_id % 9 = 2 "
                             "THEN 100000 ELSE 0 END AS DOUBLE)")}
        bands = con.execute(bands_sql(docs, "CAST(doc_id % 7 AS INTEGER)",
                                      vals, quants)).df().set_index("grp")
        for _, row in spark.iterrows():
            # a served group absent from the recomputed set is a FAIL line,
            # not a KeyError traceback (drifted/phantom group)
            if row["bucket"] not in bands.index:
                failures.append(f"corpus_view_quantile[{row['bucket']}]: "
                                f"served group absent from oracle set")
                continue
            b = bands.loc[row["bucket"]]
            # the additive measures stay EXACT in every regime
            exp = con.execute(LIFECYCLE_V.format(docs=docs) +
                f"SELECT count(*) AS n, sum(CAST(length(text) AS BIGINT)) AS c "
                f"FROM v WHERE CAST(doc_id % 7 AS INTEGER) = {row['bucket']}"
            ).fetchone()
            if int(row["n_docs"]) != exp[0] or int(row["chars"]) != exp[1]:
                failures.append(f"corpus_view_quantile[{row['bucket']}]: "
                                f"exact cols drifted ({row['n_docs']}/{row['chars']} "
                                f"vs {exp[0]}/{exp[1]})")
            for name, _ in quants:
                err = check_group("corpus_view_quantile", row["bucket"],
                                  b["n_occ"], row[name], b[f"{name}_exact"],
                                  b[f"{name}_lo"], b[f"{name}_hi"])
                checked += 1
                if err: failures.append(err)
        regimes = (bands["n_occ"] > K).sum()
        print(f"corpus_view_quantile: {len(bands)} groups, "
              f"{regimes} above capacity, {checked} values checked")

    spark = load_spark(outdir, "corpus_card_live_q")
    if spark is not None:
        quants = [("p50_chars", 0.5), ("p95_chars", 0.95)]
        vals = {"p50_chars": "CAST(length(text) AS DOUBLE)",
                "p95_chars": "CAST(length(text) AS DOUBLE)"}
        bands = con.execute(bands_sql(docs, "card_lang", vals, quants)
                            ).df().set_index("grp")
        n0 = checked
        for _, row in spark.iterrows():
            metric, value = row["metric"], row["value"]
            kind, lang = metric.split(":", 1)
            if kind == "docs":
                exp = con.execute(LIFECYCLE_V.format(docs=docs) +
                    f"SELECT count(*) FROM v WHERE card_lang = '{lang}'"
                ).fetchone()[0]
                if abs(value - exp) > 1e-6:
                    failures.append(f"corpus_card_live_q[docs:{lang}]: "
                                    f"{value} != exact {exp}")
                continue
            if lang not in bands.index:
                failures.append(f"corpus_card_live_q[{metric}]: "
                                f"served group absent from oracle set")
                continue
            b = bands.loc[lang]
            err = check_group("corpus_card_live_q", metric, b["n_occ"],
                              value, b[f"{kind}_exact"],
                              b[f"{kind}_lo"], b[f"{kind}_hi"])
            checked += 1
            if err: failures.append(err)
        regimes = (bands["n_occ"] > K).sum()
        print(f"corpus_card_live_q: {len(bands)} groups, "
              f"{regimes} above capacity, {checked - n0} values checked")

    for f in failures:
        print(f"FAIL {f}")
    print(f"== {'FAIL' if failures else 'PASS'} "
          f"({checked} banded values, {len(failures)} failures) ==")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
