#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOutDir> [--strict]

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
oracle_sql.json, loads the Spark result parquet, sorts columns by name,
and compares row-by-row (exact for ints/strings, tight tolerance for floats,
microsecond-equality for timestamps).

Values are fetched natively (fetchall), NOT via pandas: a nullable BIGINT
column becomes float64 in a DataFrame, which silently rounds 64-bit values
(e.g. pixel checksums) to 53-bit doubles — low-bit regressions would pass
locally and fail the driver's exact hash compare.

--strict compares floats BIT-EXACTLY (doubleToRawBits equality, the
driver's hash-compare standard) instead of with the 1e-9 tolerance — run
it before every round hand-off: a tolerance-passing, hash-failing float
is exactly the regression the default mode can mask.
"""
import sys, json, math, glob, struct
import datetime
import duckdb

STRICT = "--strict" in sys.argv

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # DATE vs TIMESTAMP-at-midnight are hash-equal on the driver (pandas
    # upcasts both to datetime64); mirror that here
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return datetime.datetime.combine(v, datetime.time())
    return v

def eq(a, b):
    a, b = norm(a), norm(b)
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if STRICT:  # the driver's standard: identical bits or bust
            return struct.pack("<d", fa) == struct.pack("<d", fb)
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def norm_type(t):
    """Collapse DuckDB type names into driver-hash equivalence classes.

    The driver hashes Python VALUES, so types that yield the same Python
    objects are equivalent: every <=64-bit signed int fetches as int
    (pandas int64), DATE and TIMESTAMP-at-midnight hash equal (see norm()).
    HUGEINT and DECIMAL are NOT folded into the int class — they fetch as
    distinct objects (int128 path / decimal.Decimal) and are exactly the
    classes that caused the r12 q170/q172 hash failures on value-identical
    results, which the value compare below cannot see (str(Decimal('5'))
    == str(5))."""
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "INT64"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t in ("DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"):
        return "DATETIME"
    return t

def fetch(con, sql):
    """(sorted column names, matching dtype classes, rows in that order).

    Types MUST come from rel.types, not rel.description: the DB-API
    description typecode is 'NUMBER' for every numeric (BIGINT, HUGEINT,
    DECIMAL all collapse), so a description-based lint can never fire on
    the exact ship-type class it exists to catch (r13 q187 shipped a
    HUGEINT oracle through a description-based check). rel.types reports
    the real logical types (BIGINT / HUGEINT / DECIMAL(10,2) / ...)."""
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [norm_type(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [[r[i] for i in order] for r in rel.fetchall()]
    return [cols[i] for i in order], [types[i] for i in order], rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ecols, etypes, exp = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # permanent oracle type-audit (runs on EVERY compare invocation,
        # before any spark-side check, so a HUGEINT/DECIMAL oracle is
        # flagged even when the spark output is absent): windowed SUMs
        # and // division silently promote to HUGEINT in DuckDB.
        obad = [c for c, t in zip(ecols, etypes) if t in ("DECIMAL", "HUGEINT")]
        if obad:
            print(f"FAIL {name}: ORACLE ships {obad} as DECIMAL/HUGEINT — "
                  f"cast in the oracle SQL (windowed SUM / // promote)")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        gcols, gtypes, got = fetch(con, f"SELECT * FROM read_parquet({files!r})")
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}")
            n_fail += 1
            continue
        if etypes != gtypes:
            mism = [f"{c}: spark={g} oracle={e}"
                    for c, g, e in zip(ecols, gtypes, etypes) if g != e]
            print(f"FAIL {name}: dtype mismatch ({'; '.join(mism)}) — "
                  f"value-identical results still hash-fail on the driver")
            n_fail += 1
            continue
        # ship-type lint on BOTH sides: DECIMAL and HUGEINT fetch as
        # distinct Python objects (decimal.Decimal / int128 path) and
        # hash-fail on the driver even when values are identical —
        # exactly the r12 q170/q172 (Spark side) and r13 q187 (oracle
        # side) failures. Flag them wherever they appear.
        banned = [(side, c)
                  for side, tys in (("spark", gtypes), ("oracle", etypes))
                  for c, g in zip(gcols, tys) if g in ("DECIMAL", "HUGEINT")]
        if banned:
            print(f"FAIL {name}: ships DECIMAL/HUGEINT column(s) {banned} — "
                  f"cast to BIGINT/DOUBLE/STRING at select time "
                  f"(ship-type lint, both sides)")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(exp)):
            for j, c in enumerate(ecols):
                if not eq(got[i][j], exp[i][j]):
                    bad = (i, c, got[i][j], exp[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # strip flags before reading positionals: `compare.py --strict <sf> <out>`
    # must not treat the flag as the sf dir. UNKNOWN flags are an error, not
    # a silent fall-through: a typo like --sttrict would otherwise run in
    # tolerance mode and defeat the strict hand-off check.
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a != "--strict"]
    if unknown:
        print(f"unknown flag(s): {unknown}")
        print(__doc__)
        sys.exit(2)
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(pos) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(pos[0], pos[1]))
