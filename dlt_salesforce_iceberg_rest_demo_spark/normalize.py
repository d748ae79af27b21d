"""dlt-normalize parity layer (SURVEY.md §1.3, §2.3).

The reference's normalize stage (dlt-managed) does four things between
extraction and load:

1. snake_cases every identifier (Salesforce `CamelCase` -> `camel_case`);
2. injects lineage columns `_dlt_load_id` / `_dlt_id`;
3. canonicalizes datetimes to `%Y-%m-%dT%H:%M:%S.%fZ` strings that are
   then re-inferred as timestamps
   (/root/reference/salesforce/helpers/records.py:32-45);
4. aligns each batch to the destination table schema - append typed
   NULLs for missing columns, silently drop extras, keep target order
   (/root/reference/salesforce_pipeline.py:153-176).

Spark-first: all four are pure Column expressions (JVM-side, codegen'd),
never per-row Python - the reference's `_process_record`
(records.py:15-47) is exactly the per-row loop we refuse to port.
"""

from __future__ import annotations

import logging
import re
import time
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

# Canonical datetime format of the reference (records.py:38,45).
CANONICAL_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def snake_case(name: str) -> str:
    """dlt-style identifier normalization: CamelCase/kebab -> snake_case.

    `SystemModstamp` -> `system_modstamp`, `AccountId` -> `account_id`,
    `IsDeleted` -> `is_deleted`. Consecutive caps are kept as one word
    (`SLAExpirationDate` -> `sla_expiration_date`).
    """
    name = re.sub(r"[^0-9a-zA-Z_]+", "_", name)
    name = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    name = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    name = re.sub(r"_+", "_", name)
    return name.strip("_").lower()


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Rename every column to its snake_case form (T5)."""
    mapping = {c: snake_case(c) for c in df.columns}
    return df.select([F.col(f"`{c}`").alias(new) for c, new in mapping.items()])


def new_load_id() -> str:
    """dlt load ids are epoch-seconds strings (e.g. '1755043200.123')."""
    return str(time.time())


def add_lineage(
    df: DataFrame,
    load_id: str | None = None,
    *,
    deterministic_from: list[str] | None = None,
) -> DataFrame:
    """Inject `_dlt_load_id` / `_dlt_id` (T5).

    dlt's `_dlt_id` is a random per-row id; pass ``deterministic_from=
    [cols...]`` to derive it content-addressed (md5 of the concatenated
    columns) instead - reproducible across runs, required for
    oracle-checked pipelines and handy for idempotent retries.
    """
    load_id = load_id if load_id is not None else new_load_id()
    if deterministic_from:
        row_id: Column = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in deterministic_from]).cast(
                "binary"
            )
        )
    else:
        # uuid() is nondeterministic by design (matches dlt's random id).
        row_id = F.expr("uuid()")
    return df.withColumn("_dlt_load_id", F.lit(load_id)).withColumn("_dlt_id", row_id)


def canonicalize_datetime(df: DataFrame, columns: list[str]) -> DataFrame:
    """T1/T2: render timestamp columns in the reference's canonical string
    format. One vectorized expression per column; the reference does this
    per-row in Python (records.py:32-45)."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.date_format(F.col(c), CANONICAL_TS_FORMAT))
    return out


def parse_canonical_datetime(df: DataFrame, columns: list[str]) -> DataFrame:
    """Inverse of :func:`canonicalize_datetime`: parse canonical strings
    (or epoch-millis longs, the Bulk API shape - records.py:34-38) back
    to native timestamps. Native is the preferred on-lake representation;
    the string round-trip exists only for byte-parity checks."""
    out = df
    for c in columns:
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            out = out.withColumn(c, F.timestamp_millis(F.col(c)))
        else:
            out = out.withColumn(c, F.to_timestamp(F.col(c)))
    return out


def nullable_everything(schema: T.StructType) -> T.StructType:
    """Reference creates every Iceberg field `required=False`
    (iceberg/schema.py:57-62): force nullable=True on all fields."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )


def widen_types(schema: T.StructType) -> T.StructType:
    """Reference type widening (iceberg/schema.py:37-40): every integer
    width -> long, every float width -> double. Strings/bools/temporal
    pass through; anything unsupported falls back to string
    (iceberg/schema.py:53-55)."""
    def widen(dt: T.DataType) -> T.DataType:
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return T.LongType()
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return T.DoubleType()
        if isinstance(
            dt,
            (
                T.StringType,
                T.BooleanType,
                T.TimestampType,
                T.TimestampNTZType,
                T.DateType,
                T.BinaryType,
            ),
        ):
            return dt
        return T.StringType()

    return T.StructType(
        [T.StructField(f.name, widen(f.dataType), True, f.metadata) for f in schema.fields]
    )


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """T3 schema alignment, the reference's write-time evolution policy
    (salesforce_pipeline.py:153-176):

    - target columns missing from the batch -> typed NULL columns;
    - batch columns not in the target -> silently dropped;
    - output column order == target order;
    - present columns cast to the target type (permissive, NULL on
      failure - ANSI off matches dlt's forgiving typing).
    """
    projections: list[Column] = []
    df_cols = {c.lower(): c for c in df.columns}
    for field in target.fields:
        src = df_cols.get(field.name.lower())
        if src is None:
            projections.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            projections.append(F.col(f"`{src}`").cast(field.dataType).alias(field.name))
    return df.select(projections)


def normalize_batch(
    df: DataFrame,
    *,
    load_id: str | None = None,
    timestamp_columns: list[str] | None = None,
    target: T.StructType | None = None,
    deterministic_id_from: list[str] | None = None,
) -> DataFrame:
    """Full normalize pipeline: snake_case -> timestamp parse -> lineage
    -> (optional) schema alignment. Mirrors dlt extract->normalize->load
    handoff as one lazy Catalyst plan (no materialization between steps;
    the reference stages Parquet files between each)."""
    out = snake_case_columns(df)
    if timestamp_columns:
        out = parse_canonical_datetime(out, [snake_case(c) for c in timestamp_columns])
    out = add_lineage(out, load_id, deterministic_from=deterministic_id_from)
    if target is not None:
        out = align_to_schema(out, target)
    return out


def explode_nested(
    df: DataFrame,
    parent_name: str,
    id_col: str = "_dlt_id",
) -> dict[str, DataFrame]:
    """dlt-normalize child-table extraction: every array-of-struct
    column becomes its own child table keyed back to the parent.

    dlt's normalize layer relationalizes nested data as
    ``<parent>__<field>`` tables carrying ``_dlt_parent_id`` (the
    parent row's ``_dlt_id``) and ``_dlt_list_idx`` (the element's
    position). The reference never exercises it - Salesforce compound
    fields are pruned to flat leaves
    (`salesforce/helpers/records.py:70-84`) - but the layer is part of
    the framework's contract, so the Spark engine carries it too.

    Returns ``{parent_name: parent_df_without_nested_cols,
    "<parent>__<field>": child_df, ...}``. Requires ``id_col`` on the
    parent (add via `add_lineage` first). posexplode is map-side; each
    child table is written/partitioned independently downstream, which
    is exactly how nested data stays scan-efficient at 100 TB (child
    scans never touch parent payloads).
    """
    if id_col not in df.columns:
        raise ValueError(f"{id_col} missing - run add_lineage first")
    out: dict[str, DataFrame] = {}
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.ArrayType)
        and isinstance(f.dataType.elementType, T.StructType)
    ]
    parent = df
    for col in nested:
        child = (
            df.select(
                F.col(id_col).alias("_dlt_parent_id"),
                F.posexplode(F.col(col)).alias("_dlt_list_idx", "__elem"),
            )
            .select("_dlt_parent_id", "_dlt_list_idx", "__elem.*")
        )
        # snake_case only the payload fields - the _dlt control columns
        # are already canonical (snake_case would strip their prefix)
        for f in child.columns:
            if not f.startswith("_dlt_") and snake_case(f) != f:
                child = child.withColumnRenamed(f, snake_case(f))
        out[f"{parent_name}__{snake_case(col)}"] = child
        parent = parent.drop(col)
    out[parent_name] = parent
    return out


def pseudonymize(
    df: DataFrame, columns: list[str], salt: str | None = None
) -> DataFrame:
    """Deterministic salted pseudonymization of PII/key columns:
    every listed column is replaced by ``sha256(salt || '|' || value)``
    (NULL stays NULL) — the governance pass that makes a lake export
    shareable while PRESERVING JOINABILITY: equal raw values tokenize
    identically in every table of the export, so FK joins, group-bys
    and dedup all still work on the tokens (unlike random UUIDs), and
    without the salt the mapping cannot be replayed from public
    values. That un-replayability claim requires a SECRET caller-held
    salt: calling without one falls back to a well-known default and
    logs a loud warning, because low-entropy raws (keys, names, phone
    numbers) are dictionary-replayable under any public salt.
    Complements the pattern-based `text_redact_pii` scrubber (free
    text) with exact column-level tokenization. Map-side only — one
    projection, no shuffle, codegen'd sha2."""
    if salt is None:
        logger.warning(
            "pseudonymize called without an explicit salt: tokens use a "
            "PUBLIC default salt and are dictionary-replayable for "
            "low-entropy values; pass a secret salt for real "
            "de-identification"
        )
        salt = "dlt-salesforce-iceberg-rest-demo"
    out = df
    for c in columns:
        v = F.col(c).cast("string")
        out = out.withColumn(
            c,
            F.when(v.isNull(), F.lit(None).cast("string")).otherwise(
                F.sha2(F.concat(F.lit(salt), F.lit("|"), v), 256)
            ),
        )
    return out


def schema_compat_report(
    old: T.StructType, new: T.StructType
) -> dict[str, object]:
    """Data-contract compatibility check between two table schemas —
    the gate a WAP audit or CI step runs before publishing a schema
    change: classifies every difference and says whether the change
    is BACKWARD-compatible for readers of the old schema.

    - added:        columns only in ``new`` (additive; compatible —
                    `evolve_schema` semantics: old files read as NULL);
    - removed:      columns only in ``old`` (BREAKING for readers);
    - type_changed: same name, different type after reference widening
                    (int->long, float->double are therefore NOT flagged
                    — the lake applies them on write anyway; BREAKING
                    otherwise);
    - compatible:   True iff nothing was removed or type-changed.
    """
    old_w = {f.name.lower(): f.dataType for f in widen_types(old).fields}
    new_w = {f.name.lower(): f.dataType for f in widen_types(new).fields}
    added = sorted(n for n in new_w if n not in old_w)
    removed = sorted(n for n in old_w if n not in new_w)
    type_changed = sorted(
        n for n in old_w if n in new_w and old_w[n] != new_w[n]
    )
    return {
        "added": added,
        "removed": removed,
        "type_changed": type_changed,
        "compatible": not removed and not type_changed,
    }
