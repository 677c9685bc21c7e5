"""Snapshot time travel (build/indexer.py _write_history /
list_snapshots / load(at=...)): every root commit — full save,
save_delta, compact — retains its manifest under ``history/`` keyed by
a monotone commit_seq, so any still-readable version can be bound
read-only, the parquet stand-in for Iceberg snapshot reads. Retention
follows the GC grace contract: delta commits reclaim nothing; a full
save's sweep (at the START of the save after next) retires the
versions whose artifacts it deletes, and list_snapshots stops
advertising them. The reference has no versioned storage at all (its
Disk provider rewrites one file per save, storage/disk.ex:22-31)."""

import pytest
from pyspark.sql import functions as F

from ex_elasticlunr_spark import Index
from ex_elasticlunr_spark.build.indexer import list_snapshots


def _docs(spark, rows):
    return spark.createDataFrame(rows, "docid string, text string")


@pytest.fixture()
def halves(spark):
    even = [(f"d{i}", f"spark merge window fast doc {i} alpha")
            for i in range(0, 20, 2)]
    odd = [(f"d{i}", f"merge window beta streaming doc {i}")
           for i in range(1, 20, 2)]
    return _docs(spark, even), _docs(spark, odd)


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "idx")


def _scores(idx, term="merg"):
    df = idx.search({"query": {"terms": {"text": term}}})
    return {r["docid"]: round(r["score"], 9) for r in df.collect()}


def test_time_travel_across_delta_commits(spark, halves, wh):
    even, odd = halves
    base = Index(name="t").add_field("text")
    base.add_documents(even, docid_col="docid")
    base.save(wh)  # commit 0 (full)
    want_base = _scores(base)

    loaded = Index.load(spark, wh)
    loaded.add_documents(odd, docid_col="docid")
    loaded.save_delta()  # commit 1 (delta)
    want_full = _scores(Index.load(spark, wh))

    snaps = list_snapshots(wh)
    assert [s["commit_seq"] for s in snaps] == [0, 1]
    assert [s["kind"] for s in snaps] == ["full", "delta"]
    assert snaps[1]["n_generations"] == 1

    # time travel to the pre-delta version: scores (idf/flnorm included)
    # must equal the base build exactly — the even-half index
    at0 = Index.load(spark, wh, at=0)
    assert _scores(at0) == want_base
    # and the current version still reads the merged index
    assert _scores(Index.load(spark, wh, at=1)) == want_full
    assert _scores(Index.load(spark, wh)) == want_full


def test_time_travel_across_removal_commit(spark, halves, wh):
    even, odd = halves
    idx = Index(name="t").add_field("text")
    idx.add_documents(even.unionByName(odd), docid_col="docid")
    idx.save(wh)  # commit 0
    want_all = _scores(idx)

    loaded = Index.load(spark, wh)
    loaded.inverted = loaded.inverted.remove_documents(["d1", "d3"])
    loaded.save_delta()  # commit 1 (tombstone-only generation)

    assert set(_scores(Index.load(spark, wh, at=0))) == set(want_all)
    now = _scores(Index.load(spark, wh))
    assert "d1" not in now and "d3" not in now


def test_compaction_expires_pre_compaction_versions(spark, halves, wh):
    even, odd = halves
    base = Index(name="t").add_field("text")
    base.add_documents(even, docid_col="docid")
    base.save(wh)  # commit 0
    loaded = Index.load(spark, wh)
    loaded.add_documents(odd, docid_col="docid")
    loaded.save_delta()  # commit 1

    compacted = Index.load(spark, wh)
    compacted.compact()  # commit 2 (full save; GC grace = one cycle)
    want = _scores(compacted)

    # within the grace window every version is still readable
    seqs = [s["commit_seq"] for s in list_snapshots(wh)]
    assert seqs == [0, 1, 2]
    assert _scores(Index.load(spark, wh, at=1)) == want

    # the NEXT full save sweeps the pre-compaction snapshot + gens:
    # commits 0 and 1 expire, the listing self-prunes, load(at=) raises
    again = Index.load(spark, wh)
    again.compact()  # commit 3
    seqs = [s["commit_seq"] for s in list_snapshots(wh)]
    assert seqs == [2, 3]
    with pytest.raises(FileNotFoundError):
        Index.load(spark, wh, at=0)
    with pytest.raises(FileNotFoundError):
        Index.load(spark, wh, at=99)
    assert _scores(Index.load(spark, wh, at=3)) == want


def test_history_backfill_heals_missing_twin(spark, halves, wh):
    """A crash between the root replace and the history copy leaves the
    committed version without a twin — the next commit backfills it."""
    import os

    even, odd = halves
    base = Index(name="t").add_field("text")
    base.add_documents(even, docid_col="docid")
    base.save(wh)  # commit 0
    os.unlink(os.path.join(wh, "history", "manifest-000000.json"))
    assert list_snapshots(wh) == []

    loaded = Index.load(spark, wh)
    loaded.add_documents(odd, docid_col="docid")
    loaded.save_delta()  # commit 1 — backfills commit 0's twin
    assert [s["commit_seq"] for s in list_snapshots(wh)] == [0, 1]
    assert set(_scores(Index.load(spark, wh, at=0))) == \
        set(_scores(base))


def test_generation_dirs_carry_no_history(spark, halves, wh):
    import os

    even, odd = halves
    base = Index(name="t").add_field("text")
    base.add_documents(even, docid_col="docid")
    base.save(wh)
    loaded = Index.load(spark, wh)
    loaded.add_documents(odd, docid_col="docid")
    gen_dir = loaded.inverted.save_delta()
    assert not os.path.exists(os.path.join(gen_dir, "history"))
