"""Experiment harness: one command runs the reads x DB-variants x tools
matrix end-to-end on a mini DB (2-genome holdout), producing the resumable
store, aggregate tables, and comparison plot (simulate.pl analyzeAll +
validation.pm produceValidationOutputFiles + doPlots.R analog)."""
import json
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main

from util_db import make_mini_db


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("experiments")
    db = str(root / "DB")
    rng = np.random.default_rng(777)
    make_mini_db(db, rng, n_genomes=5, genome_len=30000)
    st = str(root / "store")
    rc = cli_main([
        "experiments", "--DB", db, "--store", st, "--name", "exp1",
        "--nReads", "40", "--holdout", "auto2", "--seed", "3",
        "--tools", "metamaps,kraken2", "--meanLength", "4000",
    ])
    assert rc == 0
    return root, db, st


def test_store_layout_and_results(store):
    root, db, st = store
    base = os.path.join(st, "exp1")
    results = json.load(open(os.path.join(base, "results.json")))
    # full + holdout variants for both tools; kraken2 skipped (not installed)
    assert set(results) == {
        "full__metamaps", "full__kraken2",
        "holdout__metamaps", "holdout__kraken2",
    }
    for key in ("full__metamaps", "holdout__metamaps"):
        assert "reads" in results[key] and "distribution" in results[key]
    assert "skipped" in results["full__kraken2"]

    # reads + truth + reduced DB exist
    assert os.path.getsize(os.path.join(base, "reads.fastq")) > 0
    truth = open(os.path.join(base, "reads.truth")).read().splitlines()
    assert len(truth) == 40
    assert os.path.exists(os.path.join(base, "dbs", "holdout", "DB.fa"))


def test_holdout_accuracy_sane(store):
    root, db, st = store
    results = json.load(
        open(os.path.join(st, "exp1", "results.json"))
    )
    full = results["full__metamaps"]["reads"]["ALL"]["absolute"]
    assert full["N"] > 0
    assert full["correct"] / full["N"] > 0.6  # full DB: most reads correct
    # the holdout run must contain 'novel' category reads (their taxa left
    # the DB) — the leave-one-out machinery worked
    hold = results["holdout__metamaps"]["reads"]
    assert any(c.startswith("novel") for c in hold), sorted(hold)


def test_aggregate_tables(store):
    root, db, st = store
    tables = os.path.join(st, "exp1", "tables")
    acc = open(os.path.join(tables, "reads_accuracy.tsv")).read().splitlines()
    assert acc[0].startswith("run\tcategory\tlevel")
    assert any(l.startswith("full__metamaps\tALL\tspecies") for l in acc)
    comp = open(os.path.join(tables, "composition.tsv")).read().splitlines()
    assert comp[0].startswith("run\tlevel\tL1")
    assert any(l.startswith("full__metamaps\tspecies") for l in comp)


def test_plot_written(store):
    root, db, st = store
    pdf = os.path.join(st, "exp1", "plots", "comparison.pdf")
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        pytest.skip("matplotlib unavailable")
    assert os.path.getsize(pdf) > 0


def test_resumable(store, capsys):
    """Re-running the same experiment must reuse every flagged step (no
    recompute) and produce identical results.json."""
    root, db, st = store
    before = open(os.path.join(st, "exp1", "results.json")).read()
    import time

    t0 = time.perf_counter()
    rc = cli_main([
        "experiments", "--DB", db, "--store", st, "--name", "exp1",
        "--nReads", "40", "--holdout", "auto2", "--seed", "3",
        "--tools", "metamaps,kraken2", "--meanLength", "4000",
    ])
    dt = time.perf_counter() - t0
    assert rc == 0
    assert open(os.path.join(st, "exp1", "results.json")).read() == before
    assert dt < 30, f"resume took {dt:.1f}s — flags not honored?"


def test_aggregate_store(store):
    from metamaps_tpu.sim.experiments import aggregate_store

    root, db, st = store
    combined = aggregate_store(st)
    assert "exp1/full__metamaps" in combined
    agg = os.path.join(st, "_aggregate")
    summary = open(os.path.join(agg, "summary.tsv")).read().splitlines()
    assert summary[0].startswith("experiment\trun")
    assert any(l.startswith("exp1\tfull__metamaps\t") for l in summary)
    assert os.path.getsize(os.path.join(agg, "reads_accuracy.tsv")) > 0
