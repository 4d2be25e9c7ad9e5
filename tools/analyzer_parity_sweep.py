"""Regenerate ``functions/analyzer.py:_UNI_DIVERGENT_RANGES``.

Exhaustive per-codepoint sweep of BOTH engines the correctness gate runs:
Spark (Java regex + JVM full case mapping) and DuckDB (RE2 + utf8proc
simple case mapping), over every codepoint, comparing (a) membership in
the unicode-mode token class ``[\\p{L}\\p{M}\\p{Nd}]`` and (b) ``lower()``
output. The union of divergent codepoints — Unicode-14+ script additions
the JVM's tables cannot classify, plus caseless-mapping gaps like U+0130 —
is what the unicode-mode corpus guard refuses, because documents
containing them would mis-tokenize AND diverge from the oracle.

Greek final sigma (the one contextual mapping) is intentionally NOT in
the list: the analyzer folds ς→σ in-chain in both engines.

Run after a JVM / DuckDB upgrade:  python tools/analyzer_parity_sweep.py
Prints the replacement constant; paste it into functions/analyzer.py if
it changed (tests/test_analyzer.py re-checks a sample each CI run).
"""
from __future__ import annotations


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    cps = [c for c in range(0x20, 0x110000) if not (0xD800 <= c <= 0xDFFF)]
    df = spark.createDataFrame([(c, chr(c)) for c in cps],
                               "cp long, ch string")
    out = df.select(
        "cp",
        F.col("ch").rlike(r"^[\p{L}\p{M}\p{Nd}]$").alias("is_tok"),
        F.lower("ch").alias("low")).collect()
    spark.stop()
    spark_tok = {r.cp: bool(r.is_tok) for r in out}
    spark_low = {r.cp: r.low for r in out}

    con = duckdb.connect()
    con.execute("create table t(cp bigint, ch varchar)")
    con.executemany("insert into t values (?,?)",
                    [(c, chr(c)) for c in cps])
    duck = con.execute(
        r"select cp, regexp_full_match(ch, '[\p{L}\p{M}\p{Nd}]'),"
        " lower(ch) from t").fetchall()
    div = sorted(cp for cp, dtok, dlow in duck
                 if bool(dtok) != spark_tok[cp] or dlow != spark_low[cp])

    ranges: list[tuple[int, int]] = []
    start = prev = None
    for c in div:
        if start is None:
            start = prev = c
        elif c == prev + 1:
            prev = c
        else:
            ranges.append((start, prev))
            start = prev = c
    if start is not None:
        ranges.append((start, prev))

    print(f"# {len(div)} codepoints in {len(ranges)} ranges")
    print("_UNI_DIVERGENT_RANGES = (")
    cur = "    "
    lines = []
    for a, b in ranges:
        item = f"(0x{a:X}, 0x{b:X}), "
        if len(cur) + len(item) > 76:
            lines.append(cur.rstrip())
            cur = "    "
        cur += item
    lines.append(cur.rstrip())
    print("\n".join(lines))
    print(")")


if __name__ == "__main__":
    main()
