"""Generate an sfN scale slice by replicating an existing fixture dir
``factor`` times into DISJOINT key universes (keys offset by
10M/copy; document tokens prefixed per copy so the dedup/text corpora
stay disjoint and expected work grows linearly; nations/regions stay
shared dims). The slice measures ENGINE scaling with per-copy
statistics identical to the source — the saturated-vocabulary regime
(df growing with corpus) is intentionally not reproduced here; sf0.1
covers it (see STATE.md round-2 lessons).

Usage: python scripts/make_scale_slice.py [--src /root/testdata/sf0.1]
       [--dst /tmp/scale_sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import duckdb

STEP = 10_000_000  # key offset per copy; far above any sf0.1 key


def build(src: str, dst: str, factor: int) -> None:
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW copies AS SELECT unnest(generate_series(0, {factor - 1})) AS c"
    )

    def rep(table: str, select: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet' "
            f"CROSS JOIN copies) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    rep(
        "orders",
        f"o_orderkey + c*{STEP} AS o_orderkey, "
        f"o_custkey + c*{STEP} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    rep(
        "lineitem",
        f"l_orderkey + c*{STEP} AS l_orderkey, "
        f"l_partkey + c*{STEP} AS l_partkey, "
        f"l_suppkey + c*{STEP} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    rep(
        "customer",
        f"c_custkey + c*{STEP} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment",
    )
    rep("supplier", f"s_suppkey + c*{STEP} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    rep(
        "part",
        f"p_partkey + c*{STEP} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice",
    )
    # copy>0 documents get every token prefixed: within-copy statistics
    # identical, zero cross-copy shingle collisions -> dedup output and
    # candidate volume scale linearly with the corpus.
    rep(
        "documents",
        f"doc_id + c*{STEP} AS doc_id, "
        "CASE WHEN c = 0 THEN text ELSE array_to_string("
        "  list_transform(str_split(text, ' '), t -> concat('u', c, t)), ' ') "
        "END AS text, "
        "lang, source, "
        "CASE WHEN c = 0 THEN n_chars ELSE length(array_to_string("
        "  list_transform(str_split(text, ' '), t -> concat('u', c, t)), ' ')) "
        "END AS n_chars",
    )
    # copy>0 embeddings get a per-copy PERMUTATION of the 64 dims:
    # norms and all within-copy cosines are preserved exactly, but
    # cross-copy cosines decorrelate — without this, verbatim copies
    # give every vector 9 identical twins and the dedup/clustering
    # operators measure a different (duplicate-family) regime, not
    # scale-up of the original geometry.
    import random

    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    branches = []
    for c in range(1, factor):
        rng = random.Random(1000 + c)
        perm = list(range(1, dim + 1))
        rng.shuffle(perm)
        idx = ", ".join(f"embedding[{p}]" for p in perm)
        branches.append(f"WHEN c = {c} THEN [{idx}]")
    perm_expr = (
        "CASE " + " ".join(branches) + " ELSE embedding END"
        if branches
        else "embedding"
    )
    rep(
        "embeddings",
        f"vec_id + c*{STEP} AS vec_id, {perm_expr} AS embedding, label",
    )
    # shared dims + untouched stream table: byte-for-byte copies (events
    # keeps its TIMESTAMP(NANOS) physical type for the loader's
    # nanosAsLong path)
    for table in ("region", "nation", "events"):
        shutil.copyfile(f"{src}/{table}.parquet", out / f"{table}.parquet")


def build_growdf(src: str, dst: str, factor: int) -> None:
    """SATURATED-VOCABULARY slice: documents grow ``factor``x in rows
    and token volume while the token VOCABULARY stays fixed, so every
    token/shingle document frequency grows ~``factor``x — the Zipf-head
    regime the disjoint-universe slice (:func:`build`) deliberately
    does not reproduce (it prefixes tokens per copy, holding per-token
    df constant). This is the hard case for the df-split operators
    (containment hot/cold split, prefix filter, sparse-cosine df cap):
    shingles that were cold at sf0.1 must actually CROSS into the hot
    path here.

    Construction: copy 0 = originals; copy c>0 doc i = first half of
    doc i's tokens + second half of doc (i + 17c mod N)'s tokens
    (dense row-number indexing). Properties: token volume exactly
    ``factor``x (each original half appears in exactly ``factor``
    docs), vocabulary unchanged, every recombined doc distinct from
    every original and from other copies (distinct shift per copy), no
    doc duplicated verbatim — so threshold-based pair output grows
    near-linearly, not quadratically, and the measurement is scale-up,
    not a duplicate-family blowup. Only `documents` is rebuilt; other
    tables copy through byte-for-byte."""
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW copies AS SELECT unnest(generate_series(1, {factor - 1})) AS c"
    )
    con.execute(
        f"""
CREATE VIEW d AS
  SELECT doc_id, text, lang, source,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS idx,
         COUNT(*) OVER () AS n
  FROM '{src}/documents.parquet'
"""
    )
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
  FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (
    WITH rec AS (
      SELECT a.doc_id + c.c * {STEP} AS doc_id,
             array_to_string(
               str_split(a.text, ' ')[1:len(str_split(a.text, ' ')) // 2]
               || str_split(b.text, ' ')[len(str_split(b.text, ' ')) // 2 + 1:],
               ' ') AS text,
             a.lang, a.source
      FROM d a
      CROSS JOIN copies c
      JOIN d b ON b.idx = (a.idx + 17 * c.c) % a.n)
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM rec)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{src}/{table}.parquet", out / f"{table}.parquet")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale_sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--mode", choices=["disjoint", "growdf"], default="disjoint"
    )
    a = ap.parse_args()
    (build if a.mode == "disjoint" else build_growdf)(a.src, a.dst, a.factor)
    print(f"wrote {a.dst} (factor {a.factor}, mode {a.mode}, of {a.src})")
