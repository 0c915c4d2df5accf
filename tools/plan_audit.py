"""Physical-plan audit: for every registry query, dump scan pushdown and
join-strategy facts from explain(formatted) and flag anti-patterns:

- parquet scans with no pushed filters where the query filters base tables
- full-width ReadSchema (no column pruning)
- SortMergeJoin against a tiny dimension (should broadcast)
- row-at-a-time PythonUDF (BatchEvalPython) anywhere
"""
import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402
from polario_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
SKIP = {"streaming_events_hourly", "streaming_sliding_counts",
        "streaming_stateful_sessions", "streaming_dedup_counts", "streaming_click_attribution", "hive_roundtrip"}  # plans built inside

def main():
    spark = get_spark("plan_audit")
    for name, fn in entry_mod.queries().items():
        if name in SKIP:
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        joins = re.findall(r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b", plan)
        scans = len(re.findall(r"Scan parquet", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_n = sum(1 for p in pushed if p.strip())
        wide = []
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            ncols = len(m.group(1).split(",")) if m.group(1) else 0
            wide.append(ncols)
        pyudf = len(re.findall(r"BatchEvalPython", plan))
        arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
        exchanges = len(re.findall(r"\bExchange\b|\bShuffleExchange", plan))
        from collections import Counter
        jc = dict(Counter(joins))
        print(f"{name}: scans={scans} pushedScans={pushed_n} readCols={wide} "
              f"joins={jc} exch={exchanges} pyUDF={pyudf} arrowUDF={arrow}")
        if pyudf:
            print(f"  !! row-at-a-time Python UDF in {name}")
    spark.stop()

if __name__ == "__main__":
    main()
