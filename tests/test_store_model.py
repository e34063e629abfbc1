"""Model-based random walk over the whole TableStore surface: a fixed-
seed sequence of append / merge_upsert / delete_rows / compact /
stage+publish / stage+abandon / expire_snapshots ops, each checked
against a plain dict model.  Catches interaction bugs no single-feature
test shapes (e.g. a delete generation straddling a compaction straddling
a staged snapshot)."""

from __future__ import annotations

import random

from spider_spark.storage import TableStore


def test_store_random_walk_matches_model(spark, tmp_path):
    rng = random.Random(42)
    store = TableStore(spark, str(tmp_path))
    model: dict[int, str] = {}
    next_k = 0

    def fresh(n):
        nonlocal next_k
        ks = list(range(next_k, next_k + n))
        next_k += n
        return ks

    def df_of(pairs):
        return spark.createDataFrame(pairs, "k long, val string")

    store.write("t", df_of([(k, f"w{k}") for k in fresh(8)]))
    model.update({k: f"w{k}" for k in range(8)})

    deleted: set[int] = set()
    round_id = 0
    snapshots: list[tuple[int, dict[int, str]]] = []

    for step in range(34):
        op = rng.choice(
            ["append", "merge", "delete", "compact", "wap_publish",
             "wap_abandon", "reinsert", "expire", "snapshot", "orphan", "point"]
        )
        if op == "append":
            ks = fresh(rng.randrange(1, 5))
            # roughly half the appends carry a per-member bloom — point
            # probes below must stay exact under ANY mix of bloomed,
            # bloom-less, and compaction-rewritten members
            store.append(
                "t",
                df_of([(k, f"a{k}") for k in ks]),
                bloom_col="k" if rng.random() < 0.5 else None,
            )
            model.update({k: f"a{k}" for k in ks})
        elif op == "reinsert" and deleted:
            ks = rng.sample(sorted(deleted), min(2, len(deleted)))
            deleted.difference_update(ks)
            store.append("t", df_of([(k, f"r{k}.{step}") for k in ks]))
            model.update({k: f"r{k}.{step}" for k in ks})
        elif op == "merge" and model:
            ks = rng.sample(sorted(model), min(3, len(model)))
            new = fresh(1)
            rows = [(k, f"m{k}.{step}") for k in ks] + [(k, f"m{k}.{step}") for k in new]
            store.merge_upsert("t", df_of(rows), key="k")
            model.update({k: v for k, v in rows})
        elif op == "delete" and model:
            ks = rng.sample(sorted(model), min(rng.randrange(1, 4), len(model)))
            store.delete_rows("t", df_of([(k, "") for k in ks]).select("k"), "k")
            for k in ks:
                del model[k]
            deleted.update(ks)
        elif op == "compact":
            store.compact("t", max_members=3)
        elif op == "wap_publish":
            ks = fresh(2)
            v = store.stage_append("t", df_of([(k, f"s{k}") for k in ks]))
            # staged rows invisible until publish
            assert {r["k"] for r in store.read("t").collect()} == set(model)
            store.publish("t", v)
            model.update({k: f"s{k}" for k in ks})
        elif op == "wap_abandon":
            ks = fresh(1)
            store.stage_append("t", df_of([(k, f"x{k}") for k in ks]))
            # never published: the model is unchanged
        elif op == "expire":
            store.expire_snapshots(keep=3)
        elif op == "orphan":
            # crashed-writer debris: bytes on disk, no manifest — the
            # sweep removes exactly it and nothing the model can see
            import os
            import shutil as _sh

            src = store._manifest("t")["members"][0]["path"].split("/")[0]
            ghost = f"seg9{step:04d}"
            _sh.copytree(
                os.path.join(store._tdir("t"), src),
                os.path.join(store._tdir("t"), ghost),
            )
            assert store.remove_orphans("t") == [ghost]
        elif op == "point" and model:
            k = rng.choice(sorted(model))
            got_p = {(r["k"], r["val"]) for r in store.read_point("t", "k", k).collect()}
            assert got_p == {(k, model[k])}, f"point probe diverged at step {step}"
            if deleted:
                kd = rng.choice(sorted(deleted))
                assert store.read_point("t", "k", kd).count() == 0
        elif op == "snapshot":
            round_id += 1
            store.commit_round(round_id)
            snapshots.append((round_id, dict(model)))

        got = {r["k"]: r["val"] for r in store.read("t").collect()}
        assert got == model, f"divergence after step {step} ({op})"

    # time-travel spot check: every committed snapshot still replays,
    # except where later snapshot expiry reclaimed its manifest
    checked = 0
    for rid, snap in snapshots[-3:]:
        try:
            got = {r["k"]: r["val"] for r in store.read_at("t", round_id=rid).collect()}
        except FileNotFoundError:
            continue  # manifest expired — acceptable for old snapshots
        assert got == snap, f"time travel to round {rid} diverged"
        checked += 1
    assert model and next_k > 30  # the walk actually generated churn
