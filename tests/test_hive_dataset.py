"""Conformance tests for HiveDataset, ported from the reference suite
(/root/reference/tests/test_hive_dataset.py) to PySpark semantics."""

from __future__ import annotations

import os

import pytest

from polario_spark import HiveDataset, unwrap
from polario_spark.hive_dataset import to_relative_location_from

from tests.conftest import comparable_rows


def make_ds(spark, tmp_path, pcols=("p1", "p2"), **kw):
    return HiveDataset(spark, str(tmp_path / "ds"), list(pcols), **kw)


def test_roundtrip(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path, max_rows_per_fragment=1)
    ds.write(example_df_1)
    out = unwrap(ds.scan())
    # column order contract: sorted data cols then partition cols
    assert out.columns == ["v", "p1", "p2"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "string",
        "string",
    ]
    assert comparable_rows(out) == sorted(
        [(1, "1", "a"), (1, "1", "b"), (1, "2", "a"), (2, "2", "a")], key=repr
    )


def test_partition_dirs_on_disk(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    root = tmp_path / "ds"
    assert sorted(p.name for p in root.iterdir() if p.is_dir()) == ["p1=1", "p1=2"]
    assert sorted(p.name for p in (root / "p1=1").iterdir() if p.is_dir()) == [
        "p2=a",
        "p2=b",
    ]


def test_unpartitioned(spark, tmp_path, example_df_1):
    ds = HiveDataset(spark, str(tmp_path / "flat"))
    ds.write(example_df_1)
    out = unwrap(ds.scan())
    assert out.columns == ["p1", "p2", "v"]  # all data cols, sorted
    assert out.count() == 4
    # fragments live at the dataset root
    assert any(f.endswith(".parquet") for f in os.listdir(tmp_path / "flat"))


def test_max_rows_per_fragment(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path, max_rows_per_fragment=1)
    ds.write(example_df_1)
    frags = [
        f
        for f in os.listdir(tmp_path / "ds" / "p1=2" / "p2=a")
        if f.endswith(".parquet")
    ]
    assert len(frags) >= 2  # 2 rows, ≤1 row per fragment


def test_partitions_lexical_order(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    parts = list(ds.partitions())
    assert parts == [
        {"p1": "1", "p2": "a"},
        {"p1": "1", "p2": "b"},
        {"p1": "2", "p2": "a"},
    ]


def test_read_partitions_shapes(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    frames = list(ds.read_partitions())
    shapes = [(f.count(), len(f.columns)) for f in frames]
    assert shapes == [(1, 3), (1, 3), (2, 3)]
    # partition values come back as string literals
    first = frames[0].collect()[0]
    assert first.p1 == "1" and first.p2 == "a"


def test_read_partition_pruned(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    part = unwrap(ds.read_partition({"p1": "2", "p2": "a"}))
    assert comparable_rows(part) == [(1, "2", "a"), (2, "2", "a")]
    assert ds.read_partition({"p1": "9", "p2": "z"}) is None
    with pytest.raises(ValueError):
        ds.read_partition({"p1": "1"})  # missing key


def test_dynamic_partition_overwrite(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    update = spark.createDataFrame(
        [("1", "a", 99)], schema="p1 string, p2 string, v long"
    )
    ds.write(update)
    out = unwrap(ds.scan())
    # only partition (1,a) replaced; (1,b) and (2,a) intact
    assert comparable_rows(out) == sorted(
        [(99, "1", "a"), (1, "1", "b"), (1, "2", "a"), (2, "2", "a")], key=repr
    )


def test_idempotent_overwrite(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    ds.write(example_df_1)
    assert unwrap(ds.scan()).count() == 4


def test_append_accumulates(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    for _ in range(10):
        ds.append(example_df_1)
    assert unwrap(ds.scan()).count() == 44  # 11x 4 rows


def test_delete_partition(spark, tmp_path, example_df_1):
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    ds.delete_partition({"p1": "1", "p2": "a"})
    out = unwrap(ds.scan())
    assert comparable_rows(out) == sorted(
        [(1, "1", "b"), (1, "2", "a"), (2, "2", "a")], key=repr
    )


def test_empty_dataset_scan_none(spark, tmp_path):
    ds = make_ds(spark, tmp_path)
    assert ds.scan() is None
    assert list(ds.partitions()) == []


def test_validation_errors(spark, tmp_path):
    ds = make_ds(spark, tmp_path, pcols=("p1",))
    bad_type = spark.createDataFrame([(1, "x")], schema="p1 long, v string")
    with pytest.raises(ValueError, match="must be a string"):
        ds.write(bad_type)
    only_pcols = spark.createDataFrame([("1",)], schema="p1 string")
    with pytest.raises(ValueError, match="non-partition column"):
        ds.write(only_pcols)
    with pytest.raises(ValueError, match="non-partition column"):
        ds.append(only_pcols)
    missing_pcol = spark.createDataFrame([("x",)], schema="v string")
    with pytest.raises(ValueError, match="not found"):
        ds.write(missing_pcol)


def test_unsupported_url_scheme(spark):
    with pytest.raises(ValueError, match="Unsupported URL scheme"):
        HiveDataset(spark, "ftp://example.com/ds", ["p1"])


def test_schema_evolution(spark, tmp_path):
    """Fragments with different column subsets merge to the superset schema
    with typed nulls (/root/reference/tests/test_hive_dataset.py:166-198)."""
    ds = HiveDataset(spark, str(tmp_path / "evo"), ["p"])
    row_a = spark.createDataFrame([("1", "1", 1)], schema="p string, a string, b long")
    row_b = spark.createDataFrame([("2", "1")], schema="p string, a string")
    row_c = spark.createDataFrame([("1", 2)], schema="p string, b long")
    ds.write(row_a)
    ds.append(row_b)
    ds.append(row_c)
    p1 = unwrap(ds.read_partition({"p": "1"}))
    assert p1.columns == ["a", "b", "p"]
    assert comparable_rows(p1) == sorted(
        [("1", 1, "1"), (None, 2, "1")], key=repr
    )
    p2 = unwrap(ds.read_partition({"p": "2"}))
    rows = p2.collect()
    assert [r.a for r in rows] == ["1"]


def test_writeback_stability(spark, tmp_path, example_df_1):
    """read_partitions -> write each => dataset unchanged
    (/root/reference/tests/test_dataset.py:118-129)."""
    ds = make_ds(spark, tmp_path)
    ds.write(example_df_1)
    before = comparable_rows(unwrap(ds.scan()))
    for frame in list(ds.read_partitions()):
        ds.write(frame)
    assert comparable_rows(unwrap(ds.scan())) == before


def test_relative_path_dataset(spark, tmp_path, example_df_1, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ds = HiveDataset(spark, "target/banana", ["p1", "p2"])
    ds.write(example_df_1)
    assert unwrap(ds.scan()).count() == 4
    assert (tmp_path / "target" / "banana" / "p1=1").is_dir()


def test_to_relative_location_from():
    """The 8 path-math cases from /root/reference/tests/test_hive_dataset.py:198-226."""
    burl = "s3://a/b"
    f = to_relative_location_from
    assert f("s3://", burl, "s3://a/b/some_type=1") == "some_type=1"
    assert f("s3://", burl, "/a/b/2021/01/01") == "2021/01/01"
    assert f("s3://", burl, "a/b/2021/01/01.hello") == "2021/01/01.hello"
    assert f("s3://", burl, "a/b/2021/01/") == "2021/01/"
    assert f("s3://", burl, "a/b/a=1/b=2/") == "a=1/b=2/"
    assert f("s3://", burl, "s3://another/place/a=1") == "another/place/a=1"
    assert (
        f("", "relative/to/wd", "/absolute/from/root/relative/to/wd/place/a=1")
        == "place/a=1"
    )
    assert f("", "relative/to/wd", "/relative/to/wd/place/a=1") == "place/a=1"


def test_unwrap():
    assert unwrap(5) == 5
    with pytest.raises(ValueError):
        unwrap(None)


def test_compact_merges_fragments(spark, tmp_path, example_df_1):
    url = str(tmp_path / "compact_ds")
    ds = HiveDataset(spark, url, ["p1", "p2"], max_rows_per_fragment=1)
    ds.write(example_df_1)
    before = sorted(map(tuple, ds.scan().collect()))
    frag_counts = {
        rel: len(ds.url.list_parquet_files(ds.url.join(rel)))
        for rel in ds._partition_paths()
    }
    assert any(n > 1 for n in frag_counts.values())  # forced multi-fragment
    big = HiveDataset(spark, url, ["p1", "p2"])  # default 1M rows/fragment
    big.compact()
    after = sorted(map(tuple, big.scan().collect()))
    assert after == before
    for rel in big._partition_paths():
        assert len(big.url.list_parquet_files(big.url.join(rel))) == 1


def test_compact_single_partition(spark, tmp_path, example_df_1):
    url = str(tmp_path / "compact_one")
    ds = HiveDataset(spark, url, ["p1", "p2"], max_rows_per_fragment=1)
    ds.write(example_df_1)
    before = sorted(map(tuple, ds.scan().collect()))
    big = HiveDataset(spark, url, ["p1", "p2"])
    big.compact({"p1": "1", "p2": "a"})
    assert sorted(map(tuple, big.scan().collect())) == before
    assert len(big.url.list_parquet_files(big.url.join("p1=1/p2=a"))) == 1


def test_sorted_write_fragments(spark, tmp_path):
    import pyarrow.parquet as pq

    url = str(tmp_path / "sorted_ds")
    df = spark.range(0, 1000).selectExpr(
        "cast(id % 3 as string) AS p1",
        "cast((id * 7919) % 1000 as long) AS v",  # scrambled order
    )
    ds = HiveDataset(spark, url, ["p1"])
    ds.write(df, sort_by=["v"])
    for rel in ds._partition_paths():
        for frag in ds.url.list_parquet_files(ds.url.join(rel)):
            vals = pq.read_table(frag, columns=["v"])["v"].to_pylist()
            assert vals == sorted(vals), frag
    # data intact
    assert ds.scan().count() == 1000


def test_special_char_partition_values_roundtrip(spark, tmp_path):
    """Spark escapes '/', '=', '%', ':' etc. in partition directory
    names; the dataset's own path builders must follow the same rules or
    read_partition/delete_partition silently miss the directory the
    writer created. Spaces and unicode stay literal."""
    values = ["a/b", "a=b", "a%b", "a:b", "a b", "café"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "v long, p string"
    )
    ds = HiveDataset(spark, str(tmp_path / "esc"), ["p"])
    ds.write(df)
    # partition discovery must yield the ORIGINAL values, decoded
    assert sorted(d["p"] for d in ds.partitions()) == sorted(values)
    # pruned single-partition read by the raw value must hit
    for i, v in enumerate(values):
        part = ds.read_partition({"p": v})
        assert part is not None, v
        assert [(r.v, r.p) for r in part.collect()] == [(i, v)]
    # and the full scan agrees with the per-partition view
    assert sorted(r.p for r in unwrap(ds.scan()).collect()) == sorted(values)
    # delete by raw value must remove exactly that partition
    ds.delete_partition({"p": "a/b"})
    assert ds.read_partition({"p": "a/b"}) is None
    assert sorted(d["p"] for d in ds.partitions()) == sorted(
        v for v in values if v != "a/b"
    )


def test_escape_matches_spark_writer_layout(spark, tmp_path):
    """The escape function must reproduce Spark's on-disk directory
    names exactly — pin it against what the writer actually creates."""
    from polario_spark.hive_dataset import escape_partition_value

    values = [
        "a/b", "a=b", "a%b", "a*b", "a?b", "a'b", 'a"b', "a\\b", "a[b]^c{d",
        # control chars escape to %XX; astral-plane unicode stays literal
        # (round-9 probe — pinned so the two escape tables cannot drift)
        "a\nb", "a\tb", "a\rb", "a\x7fb", "e😀moji",
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "v long, p string"
    )
    df.write.partitionBy("p").parquet(str(tmp_path / "raw"), mode="overwrite")
    on_disk = sorted(
        d.name for d in (tmp_path / "raw").iterdir()
        if d.is_dir() and d.name.startswith("p=")
    )
    assert on_disk == sorted(f"p={escape_partition_value(v)}" for v in values)


def test_escape_unescape_property():
    """unescape(escape(v)) == v for arbitrary text, including '%' and
    hex-lookalike sequences; naive (unescaped) directory names written
    by other tools pass through unescape unchanged unless they contain
    a literal %XX."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polario_spark.hive_dataset import (
        escape_partition_value,
        unescape_partition_value,
    )

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def roundtrip(v):
        assert unescape_partition_value(escape_partition_value(v)) == v
        assert "/" not in escape_partition_value(v)

    roundtrip()


def test_unescape_passthrough_property():
    """Reference-layout passthrough as a PROPERTY (round-9, verdict item
    5), complementing the round-trip property above: any string with no
    '%' cannot contain a writer escape sequence, so unescape must be the
    identity on it; and a '%' followed by anything but uppercase hex of
    the writer-escapable set must also pass through untouched."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polario_spark.hive_dataset import unescape_partition_value as un

    @given(st.text(max_size=40).filter(lambda s: "%" not in s))
    @settings(max_examples=300, deadline=None)
    def no_percent_is_identity(v):
        assert un(v) == v

    no_percent_is_identity()

    # escapes of characters the writer never escapes: uppercase hex, but
    # the decoded char is outside the escapable set -> keep literal
    @given(st.sampled_from(["41", "61", "7A", "30", "20", "C3"]))
    @settings(max_examples=20, deadline=None)
    def non_escapable_hex_passthrough(hx):
        assert un(f"v%{hx}") == f"v%{hx}"

    non_escapable_hex_passthrough()


def test_unescape_only_decodes_spark_writer_sequences():
    """Round-8 interop fix: the reference writes partition values RAW, so
    a reference-written directory name containing a literal %XX must NOT
    be mutated by discovery. Only the sequences escape_partition_value
    itself produces (uppercase hex of the escapable set + controls)
    decode; lowercase hex and escapes of never-escaped characters pass
    through."""
    from polario_spark.hive_dataset import unescape_partition_value as un

    assert un("v%2F") == "v/"      # our writer's own output: decode
    assert un("v%2f") == "v%2f"    # lowercase: not ours, keep literal
    assert un("v%41") == "v%41"    # 'A' is never escaped: keep literal
    assert un("v%0A") == "v\n"     # control char: ours, decode
    assert un("100%") == "100%"    # dangling %: untouched
    assert un("%3D%3D") == "=="
