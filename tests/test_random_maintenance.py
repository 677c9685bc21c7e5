"""Randomized index-maintenance sequences: engine vs oracle.

The reference's write path is add (duplicate docids silently skipped,
field.ex:85), update = remove-then-re-add (field.ex:127-134), remove
(field.ex:136-146), each followed by a full idf/flnorm refresh
(field.ex:321-349). The hand-written tests pin each op once; this test
drives a seeded-random SEQUENCE of batches — adds that collide with
existing ids, updates that both replace and create, removes of present
and absent ids — and asserts rank identity on probe queries after
every step, so stats-refresh composition (N, df, idf, flnorm drifting
over the sequence) is checked, not just single ops.
"""

from __future__ import annotations

import random

import pytest

from ex_elasticlunr_spark import Index
from tests.oracle import OracleIndex
from tests.oracle.core import search as oracle_search

WORDS = ["quick", "brown", "fox", "jumped", "lorem", "ipsum", "dolor",
         "elixir", "livebook", "segment", "stream", "the", "and", "of",
         "spark", "index", "search", "merge", "token", "vector"]

PROBES = [
    {"query": {"match": {"content": "quick fox"}}},
    {"query": {"terms": {"content": ["lorem", "elixir", "spark"],
                         "minimum_should_match": 2}}},
    {"query": {"bool": {"must": {"match": {"content": "segment"}},
                        "must_not": {"terms": {"content": "ipsum"}},
                        "should": [{"match": {"content": "stream merge"}},
                                   {"match_all": {}}]}}},
    {"query": {"terms": {"content": {"value": "vektor", "fuzziness": 2}}}},
]


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8)))


def _assert_identical(idx, oidx, step):
    for q in PROBES:
        got = [(r["docid"], r["score"]) for r in idx.search(q).collect()]
        want = [(r["ref"], r["score"]) for r in oracle_search(oidx, q)]
        assert [g[0] for g in got] == [w[0] for w in want], (step, q)
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (step, q, gd)


def test_random_maintenance_sequence(spark):
    rng = random.Random(0x5EED5)
    next_id = 0

    def new_docs(n, reuse_ids=()):
        nonlocal next_id
        out = []
        for i in range(n):
            if i < len(reuse_ids):
                did = reuse_ids[i]
            else:
                did = f"d{next_id:03d}"
                next_id += 1
            out.append((did, _text(rng)))
        return out

    live = []  # ids ever added, for collision/removal sampling
    base = new_docs(20)
    live += [d for d, _ in base]

    idx = Index(name="maint").add_field("content")
    idx.add_documents(
        spark.createDataFrame(base, "id string, content string"),
        docid_col="id")
    oidx = OracleIndex().add_field("content")
    oidx.add_documents([{"id": d, "content": c} for d, c in base])
    _assert_identical(idx, oidx, "initial")

    for step in range(6):
        op = rng.choice(["add", "update", "remove"])
        if op == "add":
            # half the batch collides with existing ids -> silently
            # skipped by BOTH engines (field.ex:85 duplicate guard)
            collide = rng.sample(live, 2)
            docs = new_docs(4, reuse_ids=collide)
            live += [d for d, _ in docs if d not in live]
            idx.add_documents(
                spark.createDataFrame(docs, "id string, content string"),
                docid_col="id")
            oidx.add_documents([{"id": d, "content": c} for d, c in docs])
        elif op == "update":
            # update = remove-then-re-add; mixes replaced and brand-new
            docs = new_docs(3, reuse_ids=rng.sample(live, 2))
            live += [d for d, _ in docs if d not in live]
            idx.update_documents(
                spark.createDataFrame(docs, "id string, content string"),
                docid_col="id")
            oidx.remove_documents([d for d, _ in docs])
            oidx.add_documents([{"id": d, "content": c} for d, c in docs])
        else:
            # removes include an id that was never added (no-op) and
            # possibly one already removed
            targets = rng.sample(live, 2) + ["never-existed"]
            idx.remove_documents(
                spark.createDataFrame([(t,) for t in targets],
                                      "docid string"))
            oidx.remove_documents(targets)
            live = [d for d in live if d not in targets]
        # truncate the op-chain lineage the way a real maintenance loop
        # would — each add/update/remove otherwise stacks its anti-join +
        # stats refresh onto every later probe's plan
        idx.materialize()
        _assert_identical(idx, oidx, f"step{step}:{op}")


@pytest.mark.parametrize("seed", [11, 23, 37, 41, 59])
def test_random_maintenance_with_persistence(spark, tmp_path, seed):
    """The same randomized add/update/remove referee, but interleaved
    with the WAREHOUSE lifecycle at random steps: ``save_delta`` commits
    the pending ops as a generation and reloads, ``compact`` folds every
    generation + tombstone back into one base (build/deltas.py), so
    generational merge and tombstone folding are checked against the
    oracle at every prefix of the sequence — not just once per op as in
    tests/test_deltas.py.

    Every commit point additionally snapshots the oracle's probe
    results; after the sequence, each still-readable commit is
    time-traveled (Index.load(at=...)) and must reproduce its
    recorded results exactly, and every GC-expired commit must raise —
    the snapshot-history contract under arbitrary maintenance."""
    rng = random.Random(seed)
    wh = str(tmp_path / "wh")
    next_id = 0

    def _commit_seq():
        import json
        import os

        with open(os.path.join(wh, "manifest.json")) as fh:
            return int(json.load(fh)["commit_seq"])

    def _oracle_probe_results():
        # two probes keep the end-of-test history sweep cheap
        return [[(r["ref"], r["score"]) for r in oracle_search(oidx, q)]
                for q in (PROBES[0], PROBES[2])]

    commit_probes = {}  # commit_seq -> oracle results at commit time

    def new_docs(n, reuse_ids=()):
        nonlocal next_id
        out = []
        for i in range(n):
            if i < len(reuse_ids):
                did = reuse_ids[i]
            else:
                did = f"d{next_id:03d}"
                next_id += 1
            out.append((did, _text(rng)))
        return out

    live = []
    base = new_docs(16)
    live += [d for d, _ in base]

    idx = Index(name=f"maintp{seed}").add_field("content")
    idx.add_documents(
        spark.createDataFrame(base, "id string, content string"),
        docid_col="id")
    idx.save(wh)
    idx = Index.load(spark, wh, name=f"maintp{seed}")
    oidx = OracleIndex().add_field("content")
    oidx.add_documents([{"id": d, "content": c} for d, c in base])
    commit_probes[_commit_seq()] = _oracle_probe_results()
    _assert_identical(idx, oidx, f"seed{seed}:initial")

    for step in range(3):
        op = rng.choice(["add", "update", "remove"])
        if op == "add":
            collide = rng.sample(live, 1)
            docs = new_docs(3, reuse_ids=collide)
            live += [d for d, _ in docs if d not in live]
            idx.add_documents(
                spark.createDataFrame(docs, "id string, content string"),
                docid_col="id")
            oidx.add_documents([{"id": d, "content": c} for d, c in docs])
        elif op == "update":
            docs = new_docs(2, reuse_ids=rng.sample(live, 1))
            live += [d for d, _ in docs if d not in live]
            idx.update_documents(
                spark.createDataFrame(docs, "id string, content string"),
                docid_col="id")
            oidx.remove_documents([d for d, _ in docs])
            oidx.add_documents([{"id": d, "content": c} for d, c in docs])
        else:
            targets = rng.sample(live, 2) + ["never-existed"]
            idx.remove_documents(
                spark.createDataFrame([(t,) for t in targets],
                                      "docid string"))
            oidx.remove_documents(targets)
            live = [d for d in live if d not in targets]

        cycle = rng.choice(["none", "delta", "compact", "tiered"])
        if cycle == "tiered" and (idx.inverted._delta_adds
                                  or idx.inverted._delta_tombs is not None):
            # tiered folds COMMITTED generations only: commit pending
            # ops first (the streaming sink's natural call order)
            idx.save_delta()
        if cycle == "tiered":
            # fold the newest run of small generations into one
            # mid-tier generation (build/deltas.py compact_tiered);
            # tail=None exercises the auto ratio policy. May be a
            # no-op (<2 generations) — that path is part of the
            # contract too.
            idx.inverted.compact_tiered()
            idx = Index.load(spark, wh, name=f"maintp{seed}")
            commit_probes[_commit_seq()] = _oracle_probe_results()
            # exact-df referee across the fold: carried tombstones +
            # physically-folded in-suffix removals must leave the
            # vocabulary identical to the oracle's
            got_df = {r["term"]: r["df"]
                      for r in idx.tokens("content").collect()}
            want_df = {t: len(d) for t, d in
                       oidx.fields["content"].term_docs.items()}
            assert got_df == want_df, (seed, step, "df-after-tiered")
        elif cycle == "delta":
            # commit the pending ops as a new generation, reload: probes
            # now run over the multi-generation bind (tombstone
            # anti-joins + merged stats)
            idx.save_delta()
            idx = Index.load(spark, wh, name=f"maintp{seed}")
            commit_probes[_commit_seq()] = _oracle_probe_results()
            # exact-df-under-tombstones referee (build/deltas.py module
            # docstring, "Stats under tombstones are EXACT"):
            # bind_generations subtracts each tombstoned doc's own
            # postings from the summed df partials, so the
            # multi-generation bind's vocabulary df must equal the
            # oracle's WITHOUT a compact — checked directly here, not
            # just through score identity.
            got_df = {r["term"]: r["df"]
                      for r in idx.tokens("content").collect()}
            want_df = {t: len(d) for t, d in
                       oidx.fields["content"].term_docs.items()}
            assert got_df == want_df, (seed, step, "df-under-tombstones")
        elif cycle == "compact":
            # fold generations + tombstones into one base and reload
            idx.compact()
            idx = Index.load(spark, wh, name=f"maintp{seed}")
            commit_probes[_commit_seq()] = _oracle_probe_results()
        else:
            idx.materialize()
        _assert_identical(idx, oidx, f"seed{seed}:step{step}:{op}:{cycle}")

    # ---- snapshot-history sweep: every commit the GC kept must replay
    # its recorded oracle results; every expired one must raise ---------
    from ex_elasticlunr_spark.build.indexer import list_snapshots

    readable = {s["commit_seq"] for s in list_snapshots(wh)}
    assert _commit_seq() in readable  # HEAD is always readable
    for seq, want in sorted(commit_probes.items()):
        if seq not in readable:
            with pytest.raises(FileNotFoundError):
                Index.load(spark, wh, at=seq)
            continue
        hist = Index.load(spark, wh, name=f"maintp{seed}@{seq}", at=seq)
        for q, w in zip((PROBES[0], PROBES[2]), want):
            got = [(r["docid"], r["score"])
                   for r in hist.search(q).collect()]
            assert [g[0] for g in got] == [x[0] for x in w], (seed, seq, q)
            for (gd, gs), (_, ws) in zip(got, w):
                assert gs == pytest.approx(ws, abs=1e-9), (seed, seq, gd)
