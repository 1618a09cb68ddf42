"""Tool-call loop detection (toolcalls.toolcall_loop_runs): the generic
gaps-and-islands run-length operator, checked on a hand-built tool
sequence with known runs, plus the plan shape (one conv_id shuffle, no
Python) and the retry-draw generator's run structure."""

from pyspark.sql import functions as F

from gmft_spark.operators.toolcalls import (
    LOOP_MIN,
    _loop_turns,
    toolcall_loop_runs,
    toolcall_loops,
)

SF = "/root/testdata/sf0.001"


def _frame(spark, seqs):
    rows = [
        (conv, i, tool)
        for conv, tools in seqs.items()
        for i, tool in enumerate(tools)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")


def test_run_lengths_on_known_sequences(spark):
    seqs = {
        # runs: [a,a,a], [b], [a,a] -> longest 3, 2 loops, looping
        "c1": ["a", "a", "a", "b", "a", "a"],
        # all distinct -> longest 1, no loops
        "c2": ["a", "b", "c", "d"],
        # single turn -> one run of 1
        "c3": ["b"],
        # one long run only
        "c4": ["x", "x"],
    }
    got = {
        r["conv_id"]: (
            r["n_tool_turns"],
            r["n_runs"],
            r["longest_run"],
            r["n_loops"],
            r["is_looping"],
        )
        for r in toolcall_loop_runs(_frame(spark, seqs)).collect()
    }
    assert got == {
        "c1": (6, 3, 3, 2, 1),
        "c2": (4, 4, 1, 0, 0),
        "c3": (1, 1, 1, 0, 0),
        "c4": (2, 1, 2, 1, 1),
    }


def test_turn_order_not_input_order(spark):
    """Runs follow turn_idx, not row arrival order."""
    df = _frame(spark, {}).unionByName(
        _frame(spark, {"c": ["z"]})
        .select("conv_id", F.lit(2).alias("turn_idx"), "tool")
        .unionByName(_frame(spark, {"c": ["z"]}))
        .unionByName(
            _frame(spark, {"c": ["y"]}).select(
                "conv_id", F.lit(1).alias("turn_idx"), "tool"
            )
        )
    )
    # ordered by turn_idx: z(0), y(1), z(2) -> three runs of 1
    [r] = toolcall_loop_runs(df).collect()
    assert (r["n_runs"], r["longest_run"], r["is_looping"]) == (3, 1, 0)


def test_generator_runs_match_detection(spark):
    """The retry-draw generator's segments (adjacent segments always get
    different tools) must be exactly what run detection recovers, and
    the fixture must exercise BOTH flag branches."""
    out = toolcall_loops(spark, SF).collect()
    assert out
    flags = {r["is_looping"] for r in out}
    assert flags == {0, 1}
    for r in out:
        assert r["n_runs"] <= r["n_tool_turns"]  # runs can't exceed turns
        assert (r["longest_run"] >= LOOP_MIN) == bool(r["is_looping"])


def test_plan_one_conv_shuffle_no_python(spark):
    plan = (
        toolcall_loops(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # all-JVM: draws, windows, rollups
    # shuffles: conv_id window partitioning + final orderBy only
    assert plan.count("Exchange") <= 3


def test_retry_recovery_counts_failure_followups(spark):
    """Failure→next-turn outcomes on the retry-draw sequence: counters
    reconcile against a pandas replay of the same frame, and the retry /
    recovery branches are live on the gate corpus."""
    from gmft_spark.operators.toolcalls import toolcall_retry_recovery

    seq = (
        _loop_turns(spark, SF)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .groupby("conv_id", sort=False)
    )
    expect = {}
    for _conv, g in seq:
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.ok:
                continue
            e = expect.setdefault(r.tool, [0, 0, 0, 0])
            e[0] += 1
            if i + 1 < len(rows):
                e[1] += 1
                nxt = rows[i + 1]
                if nxt.tool == r.tool:
                    e[2] += 1
                    if nxt.ok:
                        e[3] += 1
    got = {
        r["tool"]: [
            r["n_failures"],
            r["n_followed_up"],
            r["n_retries"],
            r["n_recovered"],
        ]
        for r in toolcall_retry_recovery(spark, SF).collect()
    }
    assert got == expect
    # branch census: failures, follow-ups, retries, recoveries all occur
    totals = [sum(v[i] for v in got.values()) for i in range(4)]
    assert all(t > 0 for t in totals), totals
