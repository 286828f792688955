"""Model-based property test for the versioned-table layer (SURVEY.md §5
build-side strategy (c)): hypothesis drives random transaction scripts
against BOTH VersionedTable and a plain in-memory dict model; after every
commit the table snapshot must equal the model, at the latest csn AND at
every historical csn (as-of reads replay the model's commit history).

This subsumes the reference's hand-written lifecycle cases
(/root/reference/src/system/instance.rs:599-762) with generated ones:
arbitrary interleavings of upsert/delete/rollback over a small key space,
which is where version-visibility bugs (wrong latest-per-key, tombstone
leaks, rollback bleed) actually hide."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from db_core_spark.plans import VersionedTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)

# One transaction = a few ops then commit or rollback.
op = st.one_of(
    st.tuples(st.just("upsert"), st.integers(0, 4), st.text("abc", min_size=1, max_size=3)),
    st.tuples(st.just("delete"), st.integers(0, 4)),
)
txn = st.tuples(st.lists(op, min_size=1, max_size=3), st.booleans())  # (ops, commit?)
script = st.lists(txn, min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(script=script)
def test_snapshots_equal_model_at_every_commit(spark, tmp_path_factory, script):
    path = tmp_path_factory.mktemp("vt_prop")
    vt = VersionedTable.create(spark, str(path / "tbl"), key_cols=["k"], schema=SCHEMA)

    model: dict[int, str] = {}
    history: list[tuple[int, dict[int, str]]] = []  # (csn, state after commit)

    for ops, do_commit in script:
        t = vt.begin()
        staged = dict(model)
        for o in ops:
            if o[0] == "upsert":
                _, k, v = o
                t.upsert(spark.createDataFrame([(k, v)], SCHEMA))
                staged[k] = v
            else:
                _, k = o
                if k in staged:
                    t.delete_keys([(k,)])
                    staged.pop(k)
                else:
                    t.delete_keys([(k,)])  # deleting absent key: tombstone no-op
        if do_commit:
            csn = t.commit()
            model = staged
            history.append((csn, dict(model)))
        else:
            t.rollback()  # model unchanged

    def as_dict(df):
        return {r.k: r.v for r in df.collect()}

    # latest snapshot == final model
    assert as_dict(vt.snapshot()) == model
    # every historical commit point replays exactly
    for csn, state in history:
        assert as_dict(vt.snapshot(as_of_csn=csn)) == state, f"as-of {csn} diverged"


# Maintenance ops (checkpoint / retention-safe vacuum) interleave with the
# same transaction scripts; every one must be OBSERVATIONALLY INVISIBLE —
# same latest snapshot, same every-historical-csn as-of reads. This is the
# transparency contract the reference's checkpointer provides
# (/root/reference/src/system/checkpointer.rs): maintenance may rewrite
# storage, never answers.
txn_or_maint = st.one_of(
    txn,
    st.just("checkpoint"),
    st.just("vacuum"),
)
maint_script = st.lists(txn_or_maint, min_size=2, max_size=5)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(script=maint_script)
def test_maintenance_is_observationally_invisible(spark, tmp_path_factory, script):
    path = tmp_path_factory.mktemp("vt_maint")
    vt = VersionedTable.create(spark, str(path / "tbl"), key_cols=["k"], schema=SCHEMA)

    model: dict[int, str] = {}
    history: list[tuple[int, dict[int, str]]] = []

    def as_dict(df):
        return {r.k: r.v for r in df.collect()}

    for step in script:
        if step == "checkpoint":
            vt.checkpoint()
        elif step == "vacuum":
            # huge retention: nothing eligible -> must reclaim nothing visible
            vt.vacuum(retain_seconds=10**9)
        else:
            ops, do_commit = step
            t = vt.begin()
            staged = dict(model)
            for o in ops:
                if o[0] == "upsert":
                    _, k, v = o
                    t.upsert(spark.createDataFrame([(k, v)], SCHEMA))
                    staged[k] = v
                else:
                    _, k = o
                    t.delete_keys([(k,)])
                    staged.pop(k, None)
            if do_commit:
                csn = t.commit()
                model = staged
                history.append((csn, dict(model)))
            else:
                t.rollback()
        # invariant holds after EVERY step, maintenance included
        assert as_dict(vt.snapshot()) == model, f"after {step!r}"
        for csn, state in history:
            assert as_dict(vt.snapshot(as_of_csn=csn)) == state, (
                f"as-of {csn} diverged after {step!r}"
            )
