"""Table lifecycle: create → insert → atomic publish, and partial update.

Mirrors the reference's index lifecycle (SURVEY §2.1 S9/S10):

- ``publish_table`` = the timestamped-index + alias-swap protocol
  (configuration.rs:45-73, storage.rs:129-205): data lands in a
  timestamped generation directory; a ``_CURRENT`` pointer file is
  swapped atomically (os.replace) to the new generation; previous
  generations are pruned — exactly the munin alias dance, on parquet.
  With an Iceberg catalog present this maps to a snapshot commit; the
  jar is absent in this image so the directory backend is default.
- ``merge_update`` = the partial-update bulk (storage.rs:99-126,
  update.rs:11-39): Iceberg MERGE INTO emulated as anti-join + union.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def publish_table(df: DataFrame, base_dir: str, name: str, keep_generations: int = 2) -> str:
    """Write df as a new generation of ``{base_dir}/{name}`` and atomically
    repoint ``_CURRENT``. Returns the generation path."""
    root = Path(base_dir) / name
    root.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S") + f"_{int(time.time_ns() % 1_000_000):06d}"
    gen_dir = root / f"gen_{ts}"
    df.write.mode("overwrite").parquet(str(gen_dir))

    pointer_tmp = root / f"_CURRENT.tmp_{ts}"
    pointer_tmp.write_text(json.dumps({"generation": gen_dir.name, "published_at": time.time()}))
    os.replace(pointer_tmp, root / "_CURRENT")  # atomic swap (the alias dance)

    # prune old generations (reference deletes previous indices at publish)
    gens = sorted(d for d in root.iterdir() if d.is_dir() and d.name.startswith("gen_"))
    for old in gens[:-keep_generations]:
        shutil.rmtree(old, ignore_errors=True)
    return str(gen_dir)


def resolve_generation(root: str | Path) -> Path:
    """Resolve a table root's ``_CURRENT`` pointer to its generation
    directory — the single owner of the pointer format (readers, the
    serving job, and the status probe all route through here).
    Raises OSError / ValueError / KeyError / TypeError on a missing or
    malformed pointer."""
    root = Path(root)
    pointer = json.loads((root / "_CURRENT").read_text())
    return root / pointer["generation"]


def read_published(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Read whatever generation ``_CURRENT`` points at — the Iceberg-
    snapshot-as-PIT property (SURVEY S7): a concurrent publish never
    mutates the generation a reader already resolved."""
    return spark.read.parquet(str(resolve_generation(Path(base_dir) / name)))


def read_published_union(spark: SparkSession, base_dir: str, prefix: str) -> DataFrame | None:
    """Union every published ``{prefix}*`` table (the reference's
    per-dataset indices under one alias, configuration.rs
    root_doctype_dataset → the munin_addr alias). None when none exist;
    a CORRUPT pointer on a present table raises rather than masking lake
    damage as absence."""
    root = Path(base_dir)
    if not root.is_dir():
        return None
    parts = []
    for d in sorted(root.iterdir()):
        if d.is_dir() and d.name.startswith(prefix) and (d / "_CURRENT").exists():
            parts.append(read_published(spark, base_dir, d.name))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def merge_update(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics (update-by-id partial documents): rows in ``updates``
    replace same-key rows in ``target`` column-wise (non-null update
    columns win), other rows pass through."""
    upd_cols = [c for c in updates.columns if c != key]
    # a duplicate key in `updates` (e.g. a replayed batch) would fan the
    # left join out and silently publish duplicate documents — refuse it
    # up front, like apply_dotted_updates does for (key, ident)
    dup = updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"updates contain multiple rows for key {dup[0][0]!r}; "
            "dedupe the update batch before merge_update (duplicate keys "
            "would multiply target rows)"
        )
    joined = target.alias("t").join(updates.alias("u"), key, "left")
    merged = joined.select(
        F.col(key),
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            if c in upd_cols
            else F.col(f"t.{c}").alias(c)
            for c in target.columns
            if c != key
        ],
    )
    inserts = updates.join(target.select(key), key, "left_anti")
    extra = set(updates.columns) - set(target.columns)
    if extra:
        raise ValueError(f"update columns not in target schema: {sorted(extra)}")
    # partial-document inserts are null-padded to the target schema (the
    # reference's update-by-id path upserts whatever fields it has;
    # silently dropping new-key rows would lose data).
    inserts = inserts.select(
        *[
            F.col(c) if c in updates.columns
            else F.lit(None).cast(target.schema[c].dataType).alias(c)
            for c in target.columns
        ]
    )
    return merged.unionByName(inserts)


# ---------------------------------------------------------------------------
# S10 — dotted-path partial updates (update.rs:11-39)
# ---------------------------------------------------------------------------


def _null_struct(dtype):
    """A struct literal with every field null — the typed analogue of the
    reference's json!({}) intermediate object creation."""
    from pyspark.sql import types as T

    return F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in dtype.fields]
    ) if isinstance(dtype, T.StructType) else F.lit(None).cast(dtype)


def _set_path(col_expr, dtype, path: list[str], value):
    """Recursively rebuild a struct column with ``path`` set to ``value``
    (generate_document_parts semantics: missing intermediate objects are
    created — here, null intermediate structs are replaced by all-null
    structs before the field is set)."""
    from pyspark.sql import types as T

    head = path[0]
    if not isinstance(dtype, T.StructType) or head not in dtype.fieldNames():
        raise ValueError(f"no such field {'.'.join(path)} in {dtype.simpleString()}")
    if len(path) == 1:
        return col_expr.withField(head, value.cast(dtype[head].dataType))
    sub_type = dtype[head].dataType
    sub = F.coalesce(col_expr.getField(head), _null_struct(sub_type))
    return col_expr.withField(head, _set_path(sub, sub_type, path[1:], value))


def apply_dotted_updates(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Partial-document update stream → MERGE into nested documents.

    ``updates`` rows are (key, ident, value) — one Set op per row, ident a
    dotted path like ``properties.image`` (the reference's
    UpdateOperation::Set, update.rs:11-39). Ops pivot to one column per
    distinct path (the op vocabulary is small — it comes from config) and
    each path is applied with withField rebuilds, creating null
    intermediate structs as the reference creates empty JSON objects.
    Paths outside the target schema raise (typed storage, not ES
    schemaless). Top-level (undotted) idents update plain columns.

    Ordering (ADVICE r02): the reference applies Set ops in sequence, so
    the LAST write must win deterministically. If ``updates`` carries a
    ``seq`` column, the pivot keeps max_by(value, seq); without one,
    multiple ops on the same (key, ident) are rejected up front rather
    than resolved by a nondeterministic first(). Across DIFFERENT idents
    the ops are applied depth-then-name sorted — a whole-struct Set
    lands before nested Sets layer on top of it — so overlapping paths
    (``properties`` + ``properties.image``) resolve the same way on
    every run instead of racing on collect() order."""
    idents = sorted(
        (r["ident"] for r in updates.select("ident").distinct().collect()),
        key=lambda i: (i.count("."), i),
    )
    for ident in idents:
        path = ident.split(".")
        dtype = target.schema[path[0]].dataType
        if len(path) > 1:
            _ = _set_path(F.coalesce(F.col(path[0]), _null_struct(dtype)), dtype, path[1:], F.lit("probe"))  # schema check

    if "seq" in updates.columns:
        agg = F.max_by("value", "seq")
    else:
        dup = updates.groupBy(key, "ident").count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                "multiple updates target the same (key, ident) "
                f"({dup[0][0]!r}, {dup[0][1]!r}) but there is no 'seq' column to order them; "
                "add 'seq' so last-write-wins is deterministic"
            )
        agg = F.first("value")
    pivoted = updates.groupBy(key).pivot("ident", idents).agg(agg)
    pivoted = pivoted.select(
        F.col(key), *[F.col(f"`{i}`").alias(f"__upd_{n}") for n, i in enumerate(idents)]
    )
    out = target.join(F.broadcast(pivoted), key, "left")
    for n, ident in enumerate(idents):
        path = ident.split(".")
        upd = F.col(f"__upd_{n}")
        root = path[0]
        dtype = target.schema[root].dataType
        if len(path) == 1:
            new_val = F.when(upd.isNotNull(), upd.cast(dtype)).otherwise(F.col(root))
        else:
            base = F.coalesce(F.col(root), _null_struct(dtype))
            new_val = F.when(upd.isNotNull(), _set_path(base, dtype, path[1:], upd)).otherwise(
                F.col(root)
            )
        out = out.withColumn(root, new_val)
    return out.drop(*[f"__upd_{n}" for n in range(len(idents))])
