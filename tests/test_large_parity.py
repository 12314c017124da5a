"""Opt-in (SILO_SLOW=1) >=1M-row device-vs-oracle parity run across every
action type — the CI face of scripts/large_parity.py."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.mark.skipif(os.environ.get("SILO_SLOW", "0") != "1",
                    reason="1M-row parity run; opt in with SILO_SLOW=1")
def test_million_row_parity():
    import large_parity

    summary = large_parity.run(
        n_rows=int(os.environ.get("SILO_PARITY_ROWS", 1_048_576)),
        n_queries=int(os.environ.get("SILO_PARITY_QUERIES", 40)),
        seed=5)
    assert summary["queries_checked"] >= 40
    assert set(summary["actions"]) >= {"Aggregated", "Details", "Mutations",
                                       "AminoAcidMutations", "Insertions"}
