"""CLI verb tests (reference surface: /root/reference/polario/main.py)."""

from __future__ import annotations

import json

import pytest

from polario_spark import cli


@pytest.fixture()
def parquet_file(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], schema="id long, name string"
    )
    out = tmp_path / "data"
    df.coalesce(1).write.parquet(str(out))
    return next(out.glob("*.parquet"))


def test_show_and_schema(parquet_file, capsys):
    assert cli.main(["show", str(parquet_file)]) == 0
    assert cli.main(["schema", str(parquet_file)]) == 0
    out = capsys.readouterr().out
    assert "name" in out


def test_json_head(parquet_file, capsys):
    assert cli.main(["json_head", str(parquet_file)]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 3
    assert {"id", "name"} == set(rows[0])


def test_jsonl(parquet_file, capsys):
    assert cli.main(["jsonl", str(parquet_file)]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["id"] for r in lines) == [1, 2, 3]


def test_directory_rejected(tmp_path):
    with pytest.raises(ValueError, match="must be a file"):
        cli.main(["show", str(tmp_path)])


def test_write_csv(parquet_file, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert cli.main(["write_csv", str(parquet_file)]) == 0
    out = tmp_path / parquet_file.with_suffix(".csv").name
    assert out.exists()
    header = out.read_text().splitlines()[0]
    assert header == "id,name"
    # refuses to overwrite
    assert cli.main(["write_csv", str(parquet_file)]) == 0
    assert "already exists" in capsys.readouterr().out


def test_concat_csv(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "x1.csv").write_text("a,b\n1,foo\n")
    (tmp_path / "x2.csv").write_text("a,b\n2,bar\n")
    assert cli.main(["concat_csv", "x1.csv", "x2.csv"]) == 0
    assert (tmp_path / "x1.parquet").is_file()
    with pytest.raises(ValueError, match="already exists"):
        cli.main(["concat_csv", "x1.csv", "x2.csv"])


def test_concat_csv_rfc4180_quoted_newlines(spark, tmp_path, monkeypatch):
    """The reference's Polars CSV reader parses RFC 4180: quoted fields
    may contain newlines and doubled quotes. Spark's defaults
    (multiLine=false, backslash escape) silently split such rows into
    garbage — the CLI must read them intact."""
    src = tmp_path / "rfc.csv"
    src.write_text('a,b\n"line1\nline2","he said ""hi"""\nplain,row\n')
    monkeypatch.chdir(tmp_path)
    assert cli.main(["concat_csv", str(src)]) == 0
    back = spark.read.parquet(str(tmp_path / "rfc.parquet"))
    rows = sorted(map(tuple, back.collect()))
    assert rows == [("line1\nline2", 'he said "hi"'), ("plain", "row")]
    # and write_csv must emit the same RFC format (doubled quotes), so a
    # full circle through the CLI is lossless. Run it from a second
    # directory — its output name (rfc.csv) would otherwise collide with
    # the source and be skipped.
    outdir = tmp_path / "out"
    outdir.mkdir()
    monkeypatch.chdir(outdir)
    assert cli.main(["write_csv", str(tmp_path / "rfc.parquet")]) == 0
    again = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(str(outdir / "rfc.csv"))
    )
    assert sorted(map(tuple, again.collect())) == rows


def test_concat_csv_refuses_mismatched_headers(tmp_path, monkeypatch):
    """The reference's pl.concat raises when input schemas differ; the
    Spark multi-path read would silently misalign the second file's rows
    under the first file's header — the CLI must refuse instead."""
    f1 = tmp_path / "f1.csv"
    f2 = tmp_path / "f2.csv"
    f1.write_text("a,b\n1,2\n")
    f2.write_text("b,c\n3,4\n")
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="headers do not match"):
        cli.main(["concat_csv", str(f1), str(f2)])
    # matching headers still concatenate
    f3 = tmp_path / "f3.csv"
    f3.write_text("a,b\n5,6\n")
    assert cli.main(["concat_csv", str(f1), str(f3)]) == 0


def test_json_verbs_keep_null_fields(spark, tmp_path, capsys):
    """The reference emits to_dicts() rows — every column present, nulls
    explicit. Spark's toJSON omits null fields, which would drop keys
    from jsonl/json_head output; the CLI must keep them."""
    df = spark.createDataFrame([(1, None), (2, "b")], "id long, name string")
    out = tmp_path / "nulls"
    df.coalesce(1).write.parquet(str(out))
    pq = next(out.glob("*.parquet"))
    assert cli.main(["jsonl", str(pq)]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert all(set(l) == {"id", "name"} for l in lines)
    assert {l["id"]: l["name"] for l in lines} == {1: None, 2: "b"}
    assert cli.main(["json_head", str(pq)]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert all(set(r) == {"id", "name"} for r in rows)


def test_concat_csv_strips_utf8_bom(spark, tmp_path, monkeypatch):
    """A UTF-8 BOM is file metadata, not data: the reference's Polars
    reader skips it, so a BOM'd CSV must (a) concatenate with an
    unBOM'd file carrying the same logical header and (b) produce a
    parquet whose first column name has no BOM. Pre-fix, the header
    check read the BOM into the first header cell and REFUSED the pair
    (round-9 BOM probe)."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "x1.csv").write_bytes(b"\xef\xbb\xbfa,b\r\n1,foo\r\n")
    (tmp_path / "x2.csv").write_text("a,b\n2,bar\n")
    assert cli.main(["concat_csv", "x1.csv", "x2.csv"]) == 0
    back = spark.read.parquet(str(tmp_path / "x1.parquet"))
    assert back.columns == ["a", "b"]
    assert sorted(map(tuple, back.collect())) == [("1", "foo"), ("2", "bar")]
