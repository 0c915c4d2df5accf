"""CLI for inspecting Parquet files, Spark-backed.

Verb parity with the reference CLI (/root/reference/polario/main.py:16-22):
``show``, ``schema``, ``json_head``, ``jsonl``, ``concat_csv``,
``write_csv`` — same argument shapes and refusal semantics (directories
rejected, existing outputs not overwritten), executed through a local-mode
SparkSession instead of Polars.

Usage: ``python -m polario_spark.cli <cmd> PATH [PATH ...]``
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from polario_spark import __version__

COMMANDS = ["show", "schema", "json_head", "jsonl", "concat_csv", "write_csv"]


def _get_spark():
    # imported lazily so `--version`/argparse errors don't pay JVM startup
    from polario_spark.session import get_spark

    return get_spark("polario_spark_cli")


def _json_rows(df):
    """One JSON string per row with nulls kept as explicit ``null`` —
    the reference emits ``to_dicts()`` rows, which carry every column;
    Spark's ``toJSON`` silently OMITS null fields, so a null-bearing row
    would lose keys relative to the reference's jsonl/json_head output."""
    from pyspark.sql import functions as F

    return df.select(
        F.to_json(
            F.struct(*df.columns), {"ignoreNullFields": "false"}
        ).alias("__j")
    )


def concat_csv(paths: list[Path]) -> int:
    """Concatenate schema-less CSVs (all columns string) into one parquet
    named after the first input (/root/reference/polario/main.py:50-62)."""
    spark = _get_spark()
    # the reference's pl.concat raises when file schemas differ; Spark's
    # multi-path CSV read would instead take the FIRST file's header and
    # silently misalign every other file's rows positionally — check the
    # headers up front and refuse on mismatch
    import csv as _csv

    def _header(p: Path) -> list[str]:
        # utf-8-sig: a UTF-8 BOM is file metadata, not the first header
        # cell. The reference's Polars reader skips it, so a BOM'd file
        # must concatenate with an unBOM'd one carrying the same header
        # (round-9 BOM probe — the plain reader refused the pair).
        with open(p, newline="", encoding="utf-8-sig") as fh:
            return next(_csv.reader(fh), [])

    first_header = _header(paths[0])
    for p in paths[1:]:
        other = _header(p)
        if other != first_header:
            raise ValueError(
                f"CSV headers do not match: {paths[0].name} has "
                f"{first_header}, {p.name} has {other}"
            )
    # header=true, no inferSchema -> every column is a string, matching the
    # reference's infer_schema_length=0. multiLine + doubled-quote escape
    # give RFC 4180 parsing — the reference's Polars reader handles quoted
    # embedded newlines and "" escapes; Spark's defaults (multiLine=false,
    # backslash escape) silently split such rows into garbage
    df = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv([str(p.absolute()) for p in paths])
    )
    # Spark's CSV reader keeps a UTF-8 BOM in the first column name;
    # strip it so the parquet schema matches the reference's
    # BOM-skipping reader
    if df.columns and df.columns[0].startswith("\ufeff"):
        renamed = [df.columns[0].lstrip("\ufeff"), *df.columns[1:]]
        df = df.toDF(*renamed)
    df.show()
    output = Path(paths[0].stem + ".parquet").absolute()
    if output.exists():
        raise ValueError(f"Output file {output} already exists")
    print("Writing to", output)
    # single parquet file like the reference's write_parquet
    df.coalesce(1).write.format("parquet").save(str(output) + ".dir")
    part = next(Path(str(output) + ".dir").glob("*.parquet"))
    part.rename(output)
    for leftover in Path(str(output) + ".dir").iterdir():
        leftover.unlink()
    Path(str(output) + ".dir").rmdir()
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="polario_spark commandline tool to inspect Parquet files"
    )
    parser.add_argument("--version", action="version", version=f"%(prog)s {__version__}")
    parser.add_argument("cmd", choices=COMMANDS, help="command to run")
    parser.add_argument("paths", metavar="PATH", type=Path, nargs="+")
    args = parser.parse_args(argv)

    if args.cmd == "concat_csv":
        return concat_csv(args.paths)

    spark = _get_spark()
    for path in args.paths:
        if path.is_dir():
            raise ValueError(
                "Input path must be a file. File an issue if you want dataset support."
            )
        df = spark.read.parquet(str(path.absolute()))
        if args.cmd == "show":
            df.show()
        elif args.cmd == "schema":
            df.printSchema()
        elif args.cmd == "json_head":
            rows = [
                json.loads(r["__j"]) for r in _json_rows(df.limit(5)).collect()
            ]
            json.dump(rows, sys.stdout, indent=2)
        elif args.cmd == "jsonl":
            for row in _json_rows(df).toLocalIterator():
                # re-serialize through json.dump for byte parity with the
                # reference (compact separators AND \uXXXX-escaped
                # non-ASCII — Spark's to_json emits raw UTF-8)
                json.dump(
                    json.loads(row["__j"]), sys.stdout, separators=(",", ":")
                )
                sys.stdout.write("\n")
        elif args.cmd == "write_csv":
            output = Path(path.name).with_suffix(".csv").absolute()
            if output.exists():
                print(f"Output file {output} already exists")
                continue
            # escape='"' writes RFC 4180 doubled quotes (the reference's
            # Polars write_csv format) instead of Spark's backslash default
            df.coalesce(1).write.option("header", "true").option(
                "escape", '"'
            ).csv(str(output) + ".dir")
            part = next(Path(str(output) + ".dir").glob("*.csv"))
            part.rename(output)
            for leftover in Path(str(output) + ".dir").iterdir():
                leftover.unlink()
            Path(str(output) + ".dir").rmdir()
    return 0


if __name__ == "__main__":
    sys.exit(main())
