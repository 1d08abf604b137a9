"""Physical-plan shape assertions for entry-module queries whose scale
safety depends on a specific Catalyst strategy (not just on the rows being
right at sf0.01)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from conftest import SF_SMOKE


def test_hot_keys_uses_distributed_topk(spark):
    """cdc_hot_keys must compile to TakeOrderedAndProject (per-partition
    partial top-k + driver merge), never a single-partition global
    row_number window — at 10^10 (repo, path) groups the latter funnels the
    whole counts relation through one task. Pinned here because Spark's
    WindowGroupLimit rewrite does NOT fire on empty partition specs, which
    is exactly the trap a global-rank query falls into."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["cdc_hot_keys"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i].n_events >= rows[i + 1].n_events for i in range(len(rows) - 1))
