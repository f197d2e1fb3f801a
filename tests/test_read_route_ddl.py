"""Unit coverage for the north-rule I/O seam (VERDICT r03 #4): the
read_table routing rule as a pure function — every branch, including
the Iceberg one the sandbox can't execute — and the Iceberg install
DDL built from the schema registry (S12 on an Iceberg deployment)."""

from __future__ import annotations

import pytest

from mimirsbrunn_spark import schemas
from mimirsbrunn_spark.sources.readers import resolve_read_route


@pytest.mark.parametrize(
    "source,fmt,exists,want",
    [
        ("corpus.docs", "iceberg", False, "iceberg"),          # explicit format
        ("/data/x", "iceberg", True, "iceberg"),               # metadata path form
        ("/data/x.parquet", "parquet", True, "parquet"),       # explicit parquet
        ("corpus.docs", "auto", False, "catalog"),             # dotted ident
        ("prod.geo.admins", "auto", False, "catalog"),         # multi-part ident
        ("docs.parquet", "auto", False, "parquet"),            # ADVICE r03 #3
        ("docs.parq", "auto", False, "parquet"),
        ("corpus.docs", "auto", True, "parquet"),              # exists on disk wins
        ("/abs/path/docs", "auto", False, "parquet"),          # path-like
        ("reldir/docs", "auto", False, "parquet"),
        ("plainname", "auto", False, "parquet"),               # no dot: not an ident
    ],
)
def test_resolve_read_route(source, fmt, exists, want):
    assert resolve_read_route(source, fmt, path_exists=lambda: exists) == want


def test_resolve_read_route_rejects_unknown_fmt():
    with pytest.raises(ValueError, match="unknown fmt"):
        resolve_read_route("x", "orc")


def test_iceberg_ddl_docs_schema():
    ddl = schemas.iceberg_ddl(
        "corpus.docs", schemas.DOCS, partition_by=["bucket(256, doc_id)"]
    )
    assert "CREATE TABLE IF NOT EXISTS corpus.docs" in ddl
    assert "doc_id string NOT NULL" in ddl
    # the interleaved span struct must round-trip the registry types
    assert (
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        in ddl.replace("  ", " ")
    )
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(256, doc_id))" in ddl
    assert "'format-version' = '2'" in ddl


def test_corpus_install_ddl_set():
    ddls = schemas.corpus_install_ddl("lake")
    assert set(ddls) == {"docs", "admins"}
    assert "lake.admins" in ddls["admins"]
    assert "boundary_wkb binary" in ddls["admins"]
    # admins is a dim: no partition clause
    assert "PARTITIONED BY" not in ddls["admins"]
