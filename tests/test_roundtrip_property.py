"""Property-based round-trip oracle: ANY small frame with string partition
columns must survive HiveDataset write -> scan unchanged (the reference's
core invariant, tests/test_hive_dataset.py:15-40, generalized from one
fixture to generated frames)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polario_spark.hive_dataset import HiveDataset

# partition values must be path-safe strings (the reference never escapes
# them; '=' and '/' are structurally reserved by the Hive layout)
pval = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-",
    min_size=1,
    max_size=8,
)
rows = st.lists(
    st.tuples(
        pval,
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=1,
    max_size=12,
)


@given(data=rows)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_any_frame_roundtrips(spark, tmp_path_factory, data):
    df = spark.createDataFrame(
        [(p, v, x) for p, v, x in data], schema="p1 string, v long, x double"
    )
    url = str(tmp_path_factory.mktemp("prop") / f"ds_{uuid.uuid4().hex[:8]}")
    ds = HiveDataset(spark, url, ["p1"])
    ds.write(df)
    back = ds.scan()
    assert back is not None
    want = sorted(map(tuple, df.select("p1", "v", "x").collect()))
    got = sorted(map(tuple, back.select("p1", "v", "x").collect()))
    assert got == want
    # partition column comes back as string, appended last
    assert back.columns == ["v", "x", "p1"]
    assert dict(back.dtypes)["p1"] == "string"
