#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir in verify_out_dir with an entry in
oracle_sql.json: run the SQL in DuckDB over views of the sf_dir parquet
tables, then compare row count, schema (column names sorted), and exact
values (columns sorted by name, rows in emitted order).

This is a strictly-harder check than any plausible driver comparison:
exact value equality in emitted row order, PLUS an oracle type-parity
gate: every oracle output column must land in the portable set
{BIGINT, DOUBLE, VARCHAR, DATE, TIMESTAMP, BOOLEAN} (BASELINE.md
"oracle contract"). DuckDB-native wide types (HUGEINT from bare
SUM(...)//n, DECIMAL from numeric-literal lists) hash differently from
Spark's BIGINT/DOUBLE under the driver's stricter value-typed compare
even when values are numerically identical — the r9 q174/q224 failure
class. canon() floats Decimals, so without this gate the divergence is
invisible locally.
"""
import json
import math
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle output columns must DESCRIBE to one of these (BASELINE.md
# "oracle contract"). TIMESTAMP covers WITH TIME ZONE variants.
PORTABLE_TYPES = re.compile(
    r"^(BIGINT|DOUBLE|VARCHAR|DATE|BOOLEAN|TIMESTAMP( WITH TIME ZONE)?)$")


def type_parity_errors(con, sql):
    """DESCRIBE the oracle SQL; return column/type pairs outside the
    portable set. Catches HUGEINT/DECIMAL before the value compare."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows if not PORTABLE_TYPES.match(r[1])]


# ROUND over a DOUBLE is engine- and version-dependent at
# representation boundaries (Spark rounds the exact binary value via
# BigDecimal HALF_UP; DuckDB rounds float-side, and its path has
# changed across builds) — the r10 q174 driver-mismatch class. After
# the round-11 sweep the oracle corpus expresses every share/score as
# raw IEEE or floor-quantized integer ppm/ppb, so the lint is an
# ALLOWLIST: the only two-arg ROUNDs permitted are over stddev_samp /
# corr (their ~1e-10 cross-engine fp agreement sits far inside a
# 4-6 digit rounding bucket; no exact alternative exists for either).
# Everything else — divisions, float casts, transcendentals, AND bare
# CTE aliases whose upstream definition the lint cannot see — fails.
# Single-arg ROUND (integer quantization of exact-decimal products,
# e.g. cents) stays allowed.
ROUND_ALLOWED = re.compile(r"^\s*(stddev_samp|corr)\s*\(", re.I)


def round_on_double_errors(sql):
    """Return the first argument of every two-arg ROUND(...) call not
    on the allowlist. Oracles must express shares as integer ppm/ppb
    (floor((x * 1000000) ...) or `//`) or emit the raw IEEE value
    un-rounded — both replay bit-identically; ROUND(double, n) does
    not."""
    errs = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg_all = sql[m.end():i - 1]
        first, depth = arg_all, 0
        for j, c in enumerate(arg_all):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                first = arg_all[:j]
                break
        else:
            continue  # single-arg ROUND: integer quantization, allowed
        if not ROUND_ALLOWED.match(first):
            errs.append(" ".join(first.split())[:90])
    return errs


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Dump-registration lint (VERDICT r11 #2, the q255 failure class):
    # every read_parquet('/tmp/... in an oracle SQL must be covered by
    # a dump path the SAME query registered on its QuerySpec (manifest
    # written by Verify as dumps.json). An unregistered read means the
    # artifact exists only if a co-selected query happens to dump it —
    # i.e. a fresh driver sandbox fails where a stale local /tmp passes.
    # Verify additionally deletes /tmp/graft_*_oracle at startup, so a
    # stale dump can't mask a missing registration here either.
    import os
    dumps = {}
    if os.path.exists(f"{out_dir}/dumps.json"):
        dumps = json.load(open(f"{out_dir}/dumps.json"))
    n_pass = n_fail = 0
    results = {}
    for name, sql in sorted(oracle.items()):
        tmp_reads = set(re.findall(r"read_parquet\('(/tmp/[^/']+)", sql))
        # name absent from dumps.json ⇒ query not selected in this
        # Verify invocation (SPARK_GRAFT_ONLY dev run) — nothing to lint
        registered = set(dumps[name]) if name in dumps else tmp_reads
        missing = tmp_reads - registered
        if missing:
            print(f"FAIL {name}: oracle reads unregistered /tmp artifact(s) "
                  f"{sorted(missing)} — register an OracleDump on the "
                  f"QuerySpec (registered: {sorted(registered)})")
            n_fail += 1
            results[name] = "fail"
            continue
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # not dumped (SPARK_GRAFT_ONLY-filtered Verify run) — skip
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
            bad_types = type_parity_errors(con, sql)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            results[name] = "fail"
            continue
        if bad_types:
            print(f"FAIL {name}: oracle type-parity: non-portable "
                  f"output types {bad_types} (cast to BIGINT/DOUBLE/"
                  f"VARCHAR/DATE/TIMESTAMP/BOOLEAN in the oracle SQL)")
            n_fail += 1
            results[name] = "fail"
            continue
        bad_rounds = round_on_double_errors(sql)
        if bad_rounds:
            print(f"FAIL {name}: ROUND over a DOUBLE-typed expression "
                  f"(engine/version-dependent at representation "
                  f"boundaries): {bad_rounds} — use integer ppm "
                  f"((x * 1000000) // y) or emit the raw value")
            n_fail += 1
            results[name] = "fail"
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} != {ecols}")
            n_fail += 1
            results[name] = "fail"
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            results[name] = "fail"
            continue
        g = got[gcols].values.tolist()
        e = exp[ecols].values.tolist()
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if [canon(x) for x in gr] != [canon(x) for x in er]:
                bad = (i, gr, er)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} != exp {bad[2]}")
            n_fail += 1
            results[name] = "fail"
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
            results[name] = "pass"
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # Committable artifact (VERDICT r13 #1b): an empty driver
    # CORRECTNESS file must never again leave a round without a
    # correctness record — every full selfcheck can persist its own.
    if len(sys.argv) > 3:
        import datetime
        json.dump({
            "n_pass": n_pass, "n_fail": n_fail,
            "n_oracle": len(oracle),
            "sf_dir": sf_dir,
            "utc": datetime.datetime.now(datetime.timezone.utc)
                .isoformat(timespec="seconds"),
            "queries": results,
        }, open(sys.argv[3], "w"), indent=1, sort_keys=True)
        print(f"wrote {sys.argv[3]}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
