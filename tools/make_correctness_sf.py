#!/usr/bin/env python3
"""Run local_check at a ladder scale factor and write CORRECTNESS.sfN.json.

Usage: make_correctness_sf.py <sfDir> <verifyOutDir> <sfLabel> <outFile>
       [skip=q22_jaccard_topk,q87_cross_corpus_dedup,q113_collapsed_jaccard]

The named queries are the documented oracle-capacity limits: q22/q87's
full DuckDB oracles are quadratic SQL infeasible at replica-corpus scale,
and q113 replays q22's oracle verbatim so it inherits the same limit.
Instead of SKIPPING them, this tool now verifies each through the O(k)
SAMPLED oracle (SparkEntry.sampledOracleSql, dumped to the verify dir by
`runMain graft.tools.SampledCheck <sfDir> <verifyOutDir>`):

- q22/q113: (a) VALUE check — recompute the exact bigram jaccard of
  exactly the k reported pairs in DuckDB and compare value-exact;
  (b) BOUNDARY check — no unreported pair orders before the worst
  reported one. When the worst reported jac is 1.0 (the replica-ladder
  regime) the boundary is proven EXACTLY via the shingle-set collapse
  (jac=1.0 ⟺ identical distinct-shingle sets); otherwise it falls back
  to the q19 banded screen (per-pair recall 1−(1−j⁴)³ at j = worst jac,
  recorded in the artifact).
- q87: re-run the aggregate with the NEW side restricted to the
  doc_id%101==7 sliver (base corpus intact) on BOTH engines — exact
  agreement on the sampled aggregate (the Spark side is the
  `q87_sampled/` parquet SampledCheck writes).

If the SampledCheck artifacts are missing, the three fall back to the old
documented SKIP.

Dev-only tooling (like local_check.py): the shipped Scala library has no
Python dependency.
"""
import datetime
import glob
import io
import json
import sys
from contextlib import redirect_stdout

import duckdb
import pandas as pd

import local_check

DEFAULT_SAMPLED = ("q22_jaccard_topk", "q87_cross_corpus_dedup", "q113_collapsed_jaccard")


def read_out(out_dir: str, name: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"{out_dir}/{name}: no spark output")
    return pd.concat([pd.read_parquet(f) for f in files])


def sampled_check(sf_dir: str, out_dir: str, names) -> dict:
    """Verify the quadratic-oracle queries through the sampled path.
    Returns {query: {"status": ..., "detail": ...}}."""
    sql_path = f"{out_dir}/sampled_oracle_sql.json"
    try:
        sql = json.load(open(sql_path))
    except FileNotFoundError:
        return {n: {"status": "skip",
                    "detail": "sampled_oracle_sql.json missing — run "
                              "graft.tools.SampledCheck first"} for n in names}
    con = duckdb.connect()
    for t in local_check.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    for name in names:
        try:
            if name == "q87_cross_corpus_dedup":
                got = local_check.normalize(read_out(out_dir, "q87_sampled"))
                exp = local_check.normalize(con.execute(sql["q87_sampled"]).fetchdf())
                ok = got.equals(exp)
                results[name] = {
                    "status": "sampled_oracle" if ok else "fail",
                    "boundary_strength": "exact",
                    "detail": f"new side restricted to doc_id%101==7 "
                              f"({len(got)} source rows), base corpus intact; "
                              f"exact aggregate match={ok}"}
                continue
            # q22 / q113: value + boundary on the reported top-k pairs
            rep = read_out(out_dir, name).reset_index(drop=True)
            con.register("reported", rep)
            vals = con.execute(sql["q22_reported_values"]).fetchdf()
            a = local_check.normalize(rep)
            b = local_check.normalize(vals)
            value_ok = (list(a.columns) == list(b.columns) and len(a) == len(b)
                        and all((a[c].values == b[c].values).all() for c in a.columns))
            worst = rep.sort_values(["jac", "id_a", "id_b"],
                                    ascending=[False, True, True]).iloc[-1]
            wj, wa, wb = float(worst["jac"]), int(worst["id_a"]), int(worst["id_b"])
            if wj == 1.0:
                bsql, device = sql["q22_boundary_exact"], "exact (shingle-set collapse)"
                strength = "exact"
            else:
                rec = 1 - (1 - wj**4)**3
                device = f"banded screen, per-pair recall {rec:.6f}"
                strength = "screen"
                if rec < 0.9:
                    # an LSH screen below the band sensitivity proves little;
                    # say so — the VALUE check on the reported pairs remains
                    # exact either way, and at sf<=0.01 the full quadratic
                    # oracle runs anyway. The WEAK grade is machine-readable
                    # (distinct status + boundary_strength), not prose-only.
                    device += " (WEAK at this jac - boundary advisory only)"
                    strength = "weak_screen"
                bsql = sql["q22_boundary_screen"]
            bsql = (bsql.replace("{worst_jac}", repr(wj))
                        .replace("{worst_ida}", str(wa))
                        .replace("{worst_idb}", str(wb)))
            dominating = con.execute(bsql).fetchdf()
            boundary_ok = len(dominating) == 0
            ok = value_ok and boundary_ok
            status = ("fail" if not ok else
                      "sampled_oracle_weak" if strength == "weak_screen"
                      else "sampled_oracle")
            results[name] = {
                "status": status,
                "boundary_strength": strength,
                "detail": f"k={len(rep)} reported pairs value-exact={value_ok}; "
                          f"boundary[{device}] at worst=({wj},{wa},{wb}) "
                          f"dominating_unreported={len(dominating)}"}
            con.unregister("reported")
        except Exception as e:
            results[name] = {"status": "fail",
                             "detail": f"{type(e).__name__}: {e}"}
    return results


def main() -> int:
    sf_dir, out_dir, sf_label, out_file = sys.argv[1:5]
    sampled = tuple(sys.argv[5].split(",")) if len(sys.argv) > 5 else DEFAULT_SAMPLED
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = local_check.main(sf_dir, out_dir, skip=sampled)
    report = buf.getvalue()
    sys.stdout.write(report)
    queries = {}
    for line in report.splitlines():
        parts = line.split()
        if len(parts) >= 2 and parts[0] in ("PASS", "FAIL", "SKIP"):
            queries[parts[1]] = {"status": parts[0].lower()}
    for name, res in sampled_check(sf_dir, out_dir, sampled).items():
        queries[name] = res
        print(f"{res['status'].upper()} {name}: {res['detail']}")
        if res["status"] == "fail":
            rc = 1
    # q111 has no SQL oracle by design (checksum-backed media audit) —
    # record it explicitly instead of letting it vanish from the map
    if "q111_media_pipeline" not in queries:
        queries["q111_media_pipeline"] = {
            "status": "spark-only",
            "detail": "no SQL oracle by design; order-free bit_xor(phash) "
                      "golden pinned in DomainPipelineSpec"}
    counts = {}
    for qq in queries.values():
        counts[qq["status"]] = counts.get(qq["status"], 0) + 1
    doc = {
        "sf": float(sf_label) if "." in sf_label else int(sf_label),
        "generated": datetime.date.today().isoformat(),
        "pass": counts.get("pass", 0),
        "fail": counts.get("fail", 0),
        "skip": counts.get("skip", 0),
        "sampled_oracle": counts.get("sampled_oracle", 0),
        "sampled_oracle_weak": counts.get("sampled_oracle_weak", 0),
        "spark_only": counts.get("spark-only", 0),
        "note": (
            "local run (driver grades at sf0.01); full current query surface. "
            "sampled_oracle rows are the documented quadratic-SQL queries "
            "verified through SparkEntry.sampledOracleSql: q22/q113 value-exact "
            "on the reported top-k pairs plus a boundary proof (exact "
            "shingle-set collapse when worst jac = 1.0, banded screen "
            "otherwise), q87 exact on the 1%-new-side restriction. A banded "
            "boundary screen with per-pair recall < 0.9 is graded "
            "sampled_oracle_weak (advisory screen, not a proof) with a "
            "boundary_strength field on every sampled row. q111 is "
            "the checksum-backed media audit (no SQL oracle by design)."
        ),
        "queries": dict(sorted(queries.items())),
    }
    with open(out_file, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out_file}: " + ", ".join(f"{v} {k}" for k, v in sorted(counts.items())))
    return rc


if __name__ == "__main__":
    sys.exit(main())
