"""Model-based property test for the versioned-manifest protocol
(hypothesis): a random interleaving of publishes and rollbacks must keep
every committed version readable with exactly its published rows, the
LATEST pointer tracking the model's notion of current, and history
append-only.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from european_public_data_pipeline_spark.pipeline.manifest import (
    current_version,
    publish_version,
    read_version,
    rollback,
    versions,
)

# An op is either a publish of n in [1, 5] tagged rows, or a rollback to
# the i-th (mod #committed) already-committed version.
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("publish"), st.integers(min_value=1, max_value=5)),
        st.tuples(st.just("rollback"), st.integers(min_value=0, max_value=10)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_manifest_matches_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("manifest_prop") / "t")
    committed: dict[int, list[str]] = {}  # version -> tag list (the model)
    current: int | None = None
    seq = 0
    for op, arg in ops:
        if op == "publish":
            tags = [f"b{seq}_{j}" for j in range(arg)]
            seq += 1
            df = spark.createDataFrame([(t,) for t in tags], "v string")
            n = publish_version(df, path)
            assert n == (max(committed) + 1 if committed else 1)  # append-only
            committed[n] = tags
            current = n
        else:
            if not committed:
                continue
            vs = sorted(committed)
            target = vs[arg % len(vs)]
            rollback(spark, path, target)
            current = target
        # Invariants after every op:
        assert versions(spark, path) == sorted(committed)
        assert current_version(spark, path) == current
        assert sorted(r["v"] for r in read_version(spark, path).collect()) == sorted(
            committed[current]
        )
        # Time travel: EVERY committed version still reads exactly its rows.
        for v, tags in committed.items():
            got = sorted(r["v"] for r in read_version(spark, path, v).collect())
            assert got == sorted(tags), f"version {v} diverged"
