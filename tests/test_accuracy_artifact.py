"""Sanity bands over the committed at-scale accuracy artifact
(ACCURACY.json: 108-genome synthetic DB, 1500 simulated reads, full +
6-species-leave-out variants — VERDICT r3 item 5).

The bands encode the reference's qualitative claims (validation.pm:433
read categories, :1473 distribution metrics): in-DB reads assign at
species level near-perfectly; reads from held-out (novel) species cannot
be right at species rank but place at the correct GENUS most of the time;
composition distances stay small."""
import json
import os

import pytest

FN = os.path.join(os.path.dirname(__file__), "..", "ACCURACY.json")
FN_DEV = os.path.join(os.path.dirname(__file__), "..",
                      "ACCURACY_DEVICE.json")
_ARTS = [FN] + ([FN_DEV] if os.path.exists(FN_DEV) else [])


@pytest.fixture(scope="module",
                params=_ARTS, ids=[os.path.basename(p) for p in _ARTS])
def art(request):
    # same bands over the host-oracle artifact AND (when present) the
    # device-engine artifact (profiling/accuracy_device.py, VERDICT r4
    # item 5) — the two engines are bit-identical by contract, so both
    # runs must sit in the same accuracy bands
    assert os.path.exists(FN), "ACCURACY.json must be committed"
    return json.load(open(request.param))


def test_scale(art):
    assert art["db"]["n_genomes"] >= 100
    assert art["reads"]["n"] >= 1000


def test_full_db_read_accuracy(art):
    full = art["results"]["full__metamaps"]["reads"]["ALL"]
    assert full["absolute"]["N"] >= 1000
    assert full["absolute"]["accuracy"] >= 0.95
    assert full["species"]["accuracy"] >= 0.95


def test_holdout_read_accuracy(art):
    h = art["results"]["holdout__metamaps"]["reads"]
    assert h["ALL"]["absolute"]["accuracy"] >= 0.80
    # reads whose species was removed: absolute assignment CANNOT be
    # correct, but the genus-level placement should succeed mostly
    novel = h["novel"]
    assert novel["absolute"]["N"] >= 20
    assert novel["absolute"]["accuracy"] <= 0.05
    assert novel["genus"]["accuracy"] >= 0.5
    # in-DB reads stay near-perfect under the reduced DB
    assert h["truthLeafInDB"]["species"]["accuracy"] >= 0.95


def test_composition_distances(art):
    for key in ("full__metamaps", "holdout__metamaps"):
        d = art["results"][key]["distribution"]
        assert d["species"]["L1"] <= 0.3
        assert d["genus"]["L1"] <= 0.25
        assert d["genus"]["binary_recall"] >= 0.8
