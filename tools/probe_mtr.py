"""Batch-probe uncovered reference MTR files: run every SELECT
designate through run_script AND build_oracle_sql side-by-side and
report per-file readiness — the triage loop for growing the verbatim
battery.  Usage: python tools/probe_mtr.py file1.test file2.test ...
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stonedb_spark import get_spark  # noqa: E402
from stonedb_spark.dialect import (  # noqa: E402
    _IGNORED,
    build_oracle_sql,
    run_script,
    split_mtr,
)
from stonedb_spark.testing import compare_frames  # noqa: E402

REF = "/root/reference/mysql-test/suite/tianmu/t"


def n_selects(script: str) -> int:
    return sum(
        1
        for st in split_mtr(script)
        if re.match(r"^\s*\(?\s*SELECT\b", st.text, re.I)
        and not st.expect_error
        and not _IGNORED.match(st.text)
        and not re.search(r"\bINTO\s+OUTFILE\b", st.text, re.I)
    )


def main() -> None:
    spark = get_spark("probe-mtr")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for fname in sys.argv[1:]:
        path = os.path.join(REF, fname)
        script = open(path, errors="replace").read()
        try:
            n = n_selects(script)
        except Exception as exc:  # noqa: BLE001
            print(f"== {fname}: SPLIT-ERR {str(exc)[:120]!r}", flush=True)
            continue
        if n == 0:
            print(f"== {fname}: 0 selects", flush=True)
            continue
        oks, issues = [], []
        for d in range(n):
            try:
                sdf = run_script(spark, script, d, None).toPandas()
            except Exception as exc:  # noqa: BLE001
                issues.append((d, "spark", str(exc)[:160]))
                continue
            try:
                odf = con.execute(build_oracle_sql(script, d, None)).df()
            except Exception as exc:  # noqa: BLE001
                issues.append((d, "oracle", str(exc)[:160]))
                continue
            sdf.columns = [f"c{i}" for i in range(len(sdf.columns))]
            odf.columns = [f"c{i}" for i in range(len(odf.columns))]
            try:
                probs = compare_frames(sdf, odf)
            except Exception as exc:  # noqa: BLE001
                issues.append((d, "compare", str(exc)[:160]))
                continue
            if probs:
                issues.append((d, "mismatch", str(probs[:2])[:160]))
            else:
                oks.append(d)
        tag = "ALL-GREEN" if not issues else f"{len(oks)}/{n} green"
        print(f"== {fname}: {tag}", flush=True)
        for d, kind, msg in issues[:4]:
            print(f"   #{d} {kind}: {msg}".replace("\n", " "), flush=True)


if __name__ == "__main__":
    main()
