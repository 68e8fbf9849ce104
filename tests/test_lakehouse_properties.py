"""Property-based test: random lakehouse op sequences vs an in-memory
reference model. The transaction log's whole job is that ANY interleaving
of append/overwrite/merge/optimize/vacuum leaves read() equal to the
obvious dict/list semantics — hypothesis searches op orders a
hand-written test wouldn't."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from retail_sales_etl_spark.load.lakehouse import LakehouseTable

# an op is ("append"|"overwrite"|"merge", rows) or ("optimize"|"vacuum",)
_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=4
)
_op = st.one_of(
    st.tuples(st.sampled_from(["append", "overwrite", "merge"]), _rows),
    st.tuples(st.sampled_from(["optimize", "vacuum"])),
)


def _df(spark, rows):
    return spark.createDataFrame([Row(id=i, val=v) for i, v in rows])


@given(st.lists(_op, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_log_replay_matches_reference_model(spark, ops):
    path = tempfile.mkdtemp(prefix="lh_prop_")
    shutil.rmtree(path, ignore_errors=True)
    table = LakehouseTable(spark, path)
    # reference: multiset for append/overwrite, dict-by-pk after merge
    ref: list[tuple[int, int]] = []
    versions = 0
    try:
        for op in ops:
            kind = op[0]
            if kind == "append":
                table.write(_df(spark, op[1]), mode="append")
                ref.extend(op[1])
                versions += 1
            elif kind == "overwrite":
                table.write(_df(spark, op[1]), mode="overwrite")
                ref = list(op[1])
                versions += 1
            elif kind == "merge":
                if versions == 0:
                    continue  # merge needs an existing table
                updates = {i: v for i, v in op[1]}  # last-wins inside batch
                urows = sorted(updates.items())
                table.merge(_df(spark, urows), primary_key=["id"])
                ref = [(i, v) for i, v in ref if i not in updates] + urows
                versions += 1
            elif kind == "optimize":
                if versions == 0:
                    continue
                table.optimize(target_files=1)
                versions += 1
            elif kind == "vacuum":
                if versions == 0:
                    continue
                table.vacuum(retain_versions=1)
            got = sorted((r.id, r.val) for r in table.read().collect())
            assert got == sorted(ref), f"after {kind}: {got} != {sorted(ref)}"
            assert table.latest_version() == versions
    finally:
        shutil.rmtree(path, ignore_errors=True)
