"""Oracle output-type portability gate (COVERAGE.md standing rule,
VERDICT r6 #1/#4): no registry oracle may expose a column whose DuckDB
type Spark cannot produce (HUGEINT from un-CAST integer aggregates,
unsigned / sub-INTEGER widths). DESCRIBE-only — binds every oracle
without executing it, so this runs in seconds and needs no Spark."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


def test_no_nonportable_oracle_output_types():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} not present")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from oracle_type_audit import audit

    flagged = audit(SF_DIR)
    assert not flagged, (
        "oracle output columns with non-portable DuckDB types "
        f"(wrap in explicit CAST): {flagged}"
    )
