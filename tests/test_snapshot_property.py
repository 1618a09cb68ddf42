"""Model-based snapshot-layer property test: random interleavings of
append / upsert / delete / compact / expire must always agree with a
plain in-memory dict model, and time travel must reproduce any retained
historical state. (The bucketed-vacuum bug escaped the example-based
tests; this class of test walks the op lattice.)"""

import random

import pytest

from gmft_spark.plans import snapshots as S


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows], "doc_id long, payload string"
    )


def _read(spark, table):
    return {
        (r["doc_id"], r["payload"])
        for r in S.read_table(spark, table).collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_random_op_sequences_match_the_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = str(tmp_path / f"tbl{seed}")
    model: dict[int, str] = {}
    history: dict[int, dict[int, str]] = {}  # snapshot id -> state
    next_id = 0

    def snap_state():
        history[S.current_snapshot_id(table)] = dict(model)

    # seed the table (every later op requires a snapshot)
    first = {next_id + i: f"v{seed}.0.{i}" for i in range(6)}
    next_id += 6
    S.commit_append(spark, _df(spark, first.items()), table,
                    bucket_by=("doc_id", 3) if seed % 2 else None)
    model.update(first)
    snap_state()

    for step in range(1, 9):
        op = rng.choice(["append", "upsert", "delete", "compact", "expire"])
        if op == "append":
            batch = {next_id + i: f"v{seed}.{step}.{i}"
                     for i in range(rng.randint(1, 5))}
            next_id += len(batch)
            S.commit_append(spark, _df(spark, batch.items()), table)
            model.update(batch)
            snap_state()
        elif op == "upsert":
            keys = rng.sample(sorted(model), k=min(3, len(model)))
            batch = {k: f"u{seed}.{step}.{k}" for k in keys}
            batch[next_id] = f"u{seed}.{step}.new"
            next_id += 1
            S.commit_upsert(spark, _df(spark, batch.items()), table,
                            key_cols=["doc_id"])
            model.update(batch)
            snap_state()
        elif op == "delete":
            mod = rng.randint(2, 5)
            head = S.current_snapshot_id(table)
            sid = S.commit_delete(spark, table, f"doc_id % {mod} = 0")
            doomed = [k for k in model if k % mod == 0]
            for k in doomed:
                del model[k]
            if doomed:
                assert sid == head + 1
                snap_state()
            else:
                assert sid == head  # no-op commits nothing
        elif op == "compact":
            S.compact(spark, table, target_partitions=1)
            snap_state()
        else:
            keep = rng.randint(1, 3)
            r = S.expire_snapshots(table, keep_last=keep)
            kept = {s["snapshot_id"] for s in S.snapshots(table)}
            for sid in list(history):
                if sid not in kept:
                    del history[sid]
            assert r["expired_snapshots"] >= 0

        assert _read(spark, table) == {
            (k, v) for k, v in model.items()
        }, f"divergence after step {step} ({op})"

    # every retained snapshot time-travels to its recorded state
    for sid, state in history.items():
        got = {
            (r["doc_id"], r["payload"])
            for r in S.read_table(spark, table, snapshot_id=sid).collect()
        }
        assert got == {(k, v) for k, v in state.items()}, f"snapshot {sid}"
