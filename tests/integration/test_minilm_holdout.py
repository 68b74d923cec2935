"""Held-out evaluation report of the distilled encoder (VERDICT round-2 #4).

`tools/distill_minilm.py --holdout-frac 0.2 --augment 3` trains the encoder
WITHOUT a seeded 117-pair split and evaluates on it — the committed report
is the off-sample evidence the round-2 in-sample 0.9991 figure lacked.

Honest numbers this pins (measured on TPU, 2026-08-20):
  * held-out cosine mean ~0.93, top-10 retrieval-set agreement ~0.62 —
    the encoder INTERPOLATES the corpus domain, it does not reproduce the
    true checkpoint off-sample (impossible from 468 supervision pairs).
  * paraphrase agreement 0.24 -> 0.58 with paraphrase-invariance
    augmentation — the hardening that shipped into the production encoder.
The thresholds below are regression floors, not quality claims.
"""

import json
import os

import pytest


def _report_path():
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    return os.path.join(repo, "tools", "minilm_holdout_report.json")


class TestHoldoutReport:
    @pytest.fixture(scope="class")
    def report(self):
        path = _report_path()
        if not os.path.exists(path):
            pytest.skip("holdout report not generated in this checkout")
        with open(path) as f:
            return json.load(f)

    def test_trained_without_the_holdout(self, report):
        assert report["n_holdout"] >= 100
        assert report["n_train"] + report["n_holdout"] == 585

    def test_heldout_floors(self, report):
        assert report["holdout_cos_mean"] >= 0.85
        assert report["holdout_top10_agreement_mean"] >= 0.55

    def test_paraphrase_hardening_floor(self, report):
        # pre-augmentation this was 0.235; the augmented recipe must keep
        # the phrasing-robustness gain
        assert report["paraphrase_top10_agreement_mean"] >= 0.5
