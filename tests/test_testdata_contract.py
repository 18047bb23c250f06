"""Schema contract over the driver-generated testdata.

Round-4 lesson: the driver regenerated `/root/testdata` between rounds
and `events.ts` silently changed from int64 epoch-nanos to parquet
timestamp[us], breaking every events query in the gate with a cryptic
DATATYPE_MISMATCH. This contract makes the next drift fail HERE, by
name, with the old/new types printed — and pins the type families the
schema-adaptive readers (qcommon.normalize_events_ts) actually handle.

Pure pyarrow — no Spark session needed, so this runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

# column -> allowed pyarrow type-name prefixes (families, not exact types:
# int32 vs int64 and float vs double upgrades are absorbed by casts)
CONTRACT = {
    "events": {
        "event_id": ("int",),
        # the single family normalize_events_ts handles since the round-6
        # retirement of the int64-nanos legacy branch; anything else is a
        # NEW layout the reader must learn about
        "ts": ("timestamp",),
        "user_id": ("int",),
        "event_type": ("string", "large_string"),
        "value": ("float", "double"),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int",),
        "text": ("string", "large_string"),
    },
    "embeddings": {
        "vec_id": ("int",),
        "embedding": ("list", "large_list", "fixed_size_list"),
    },
    "orders": {
        "o_orderkey": ("int",),
        "o_custkey": ("int",),
        "o_orderstatus": ("string", "large_string"),
        "o_totalprice": ("float", "double", "decimal"),
        "o_orderdate": ("timestamp", "date"),
        "o_orderpriority": ("string", "large_string"),
    },
    "lineitem": {
        "l_orderkey": ("int",),
        "l_partkey": ("int",),
        "l_suppkey": ("int",),
        "l_quantity": ("float", "double", "decimal"),
        "l_extendedprice": ("float", "double", "decimal"),
        "l_discount": ("float", "double", "decimal"),
        "l_returnflag": ("string", "large_string"),
        "l_linestatus": ("string", "large_string"),
        "l_shipdate": ("timestamp", "date"),
    },
    "customer": {
        "c_custkey": ("int",),
        "c_nationkey": ("int",),
        "c_acctbal": ("float", "double", "decimal"),
        "c_mktsegment": ("string", "large_string"),
    },
    "region": {"r_regionkey": ("int",), "r_name": ("string", "large_string")},
    "nation": {
        "n_nationkey": ("int",),
        "n_name": ("string", "large_string"),
        "n_regionkey": ("int",),
    },
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no testdata mounted")
@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_testdata_schema_contract(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    fields = {f.name: str(f.type) for f in schema}
    problems = []
    for col, families in CONTRACT[table].items():
        if col not in fields:
            problems.append(f"{table}.{col}: MISSING (have {sorted(fields)})")
        elif not any(fields[col].startswith(p) for p in families):
            problems.append(
                f"{table}.{col}: type {fields[col]!r} outside the handled "
                f"families {families} — update the reader AND this contract"
            )
    assert not problems, "\n".join(problems)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no testdata mounted")
def test_documents_text_has_no_vertical_tab():
    """Cross-engine tokenization dialect pin (round-11 fuzz finding):
    Java's \\s matches VERTICAL TAB (\\x0B) but RE2's — and therefore
    DuckDB's regexp_split_to_array — does not, so a document containing
    \\x0B would tokenize differently in the engine and the oracle. Every
    other probed whitespace/exotic character (NBSP, em space,
    ideographic space, zero-width space, \\f, \\r\\n) agrees. The corpus
    contract therefore excludes \\x0B; if the generator ever emits it,
    this names the divergence instead of a cryptic hash mismatch."""
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    bad = [
        i
        for i, v in enumerate(tbl.column("text").to_pylist())
        if v and "\x0b" in v
    ]
    assert not bad, f"documents rows with \\x0B (Java-only whitespace): {bad[:5]}"


def test_documents_quality_columns_non_null():
    """Quality-decile null-policy pin (the r14 pre-commitment, closed
    r15): quality_decile_stats* and the mixture-sampling family key on
    (lang, n_chars) with NO null branch by CONTRACT — Spark sorts ASC
    NULLS FIRST while DuckDB's default is NULLS LAST, so a null score
    or stratum would diverge engine-vs-oracle in bin assignment before
    any operator bug could. The corpus guarantees both columns non-null;
    if the generator ever emits one, this names the policy gap instead
    of a cryptic hash mismatch. Callers with nullable scores must filter
    or impute BEFORE the decile census (documented in curation.py)."""
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["lang", "n_chars"]
    )
    assert tbl.column("lang").null_count == 0
    assert tbl.column("n_chars").null_count == 0
