"""Fuzzed-data oracle sweep (round-11 VERDICT #2): the three fixed
TESTDATA SFs cannot catch data-dependent accidents — tie-break luck,
empty-group edges, NULL handling, unicode tokenization. This tool
generates a SEEDED random-shape variant of the testdata tables (skewed
keys, NULL bursts, duplicate/near-duplicate/empty/unicode documents,
zero-norm embeddings, timestamp bursts with exact session-boundary
gaps) with the ORIGINAL parquet schemas, then runs the full
verify_oracle Spark-vs-DuckDB sweep against it.

Shape decisions, deliberately:
- key columns stay unique/non-NULL (they are primary-key contracts);
  FOREIGN keys get Zipf-style skew (a mega-customer, a mega-order, a
  hot part) so co-purchase graphs grow hubs and salting paths see heat;
- value and categorical columns get NULL BURSTS (contiguous runs, not
  uniform salt) — the originals carry zero NULLs, so this is the
  untested regime;
- ~60% of documents are seeded mutations of the ORIGINALS (keeps the
  generator's planted line/dup structure), plus exact duplicates under
  new doc_ids, near-duplicates (one token appended), and a chaos tail:
  empty strings, whitespace-only, unicode salad (CJK/emoji/RTL/
  combining accents), single tokens, 5k-token repeats;
- continuous measures stay FULL-ENTROPY doubles (quantizing to 2-3
  decimals parks aggregates exactly on display-round knife edges,
  where cross-engine summation-tree LSB drift flips the last rounded
  digit — inherent float nondeterminism, not an engine defect);
- key columns start at 0 (the testdata key-domain contract: probe
  fixtures select vec_id=0 / doc_id=0);
- embeddings keep the original dimension and add exact copies, scaled
  copies, a zero vector and a tiny-norm vector (cosine edge cases).

Usage::

    python tools/fuzz_oracle.py run --seed 1 --seed 2   # generate + sweep each
    python tools/fuzz_oracle.py run --seed 7 --keep     # keep the parquet dir
    python tools/fuzz_oracle.py gen --seed 7 --out /tmp/fuzz7   # data only

Writes one JSON artifact (``FUZZ_ORACLE.json`` at the repo root) with
per-seed, per-query results; exits non-zero on any FAIL/ERROR.

Known boundary (probed round 12, ``--empty events`` sweeps 247/247):
``--empty documents,embeddings`` currently reds ~21 queries, all in
three defensible classes — fixture probes that index a collected row
(vec_id=0/doc_id=0 absent from an empty corpus -> TypeError),
operators that RAISE LOUDLY on empty input (prototypicality seed
guard, BPE schema inference, kappa/Heaps degenerate denominators),
and genuine cross-engine empty-set semantics (Spark CUBE over an
empty frame emits no grand-total row, DuckDB emits one; the profiler
describes an empty table with 4 metadata rows, a SQL oracle has no
rows to describe). None are silent wrong answers; hardening the
fixture queries against empty corpora is future work, tracked in
TODO.md. Use ``--artifact`` to keep exploratory runs out of the
committed FUZZ_ORACLE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_UNICODE_WORDS = [
    "café", "naïve", "Zürich", "数据", "引擎", "データ", "мир", "δοκιμή",
    "مرحبا", "שלום", "🌊", "🚀✨", "éclair", "ﬃ", "ȷ̈", "ᏣᎳᎩ",
]


def _zipf_choice(rng: np.random.RandomState, values: np.ndarray, n: int) -> np.ndarray:
    """Skewed draw: rank-1/r weights over a shuffled copy of ``values``
    — the first few ranks soak up most rows (a mega-key), every value
    stays reachable."""
    vals = values.copy()
    rng.shuffle(vals)
    ranks = np.arange(1, len(vals) + 1, dtype="float64")
    w = 1.0 / ranks
    w /= w.sum()
    return rng.choice(vals, size=n, p=w)


def _null_burst(rng: np.random.RandomState, col: pd.Series, frac: float = 0.08) -> pd.Series:
    """NULL out ``frac`` of the rows in 2-4 contiguous runs."""
    col = col.copy().astype(object)
    n = len(col)
    if n == 0:
        return col
    total = max(1, int(n * frac))
    n_runs = int(rng.randint(2, 5))
    per = max(1, total // n_runs)
    for _ in range(n_runs):
        start = int(rng.randint(0, max(1, n - per)))
        col.iloc[start:start + per] = None
    return col


def _write(out_dir: str, name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    # cast through the ORIGINAL schema so Spark/DuckDB see identical
    # physical types at every seed (int32 dims, float32 embeddings, us
    # timestamps); drop the inherited pandas metadata blob
    table = pa.Table.from_pandas(df, preserve_index=False)
    cols = [table.column(schema.field(i).name).cast(schema.field(i).type) for i in range(len(schema))]
    clean = pa.schema([pa.field(f.name, f.type) for f in schema])
    pq.write_table(pa.Table.from_arrays(cols, schema=clean), os.path.join(out_dir, f"{name}.parquet"))


def generate(seed: int, src_dir: str, out_dir: str, empty: set[str] | None = None) -> None:
    rng = np.random.RandomState(seed)
    empty = empty or set()
    os.makedirs(out_dir, exist_ok=True)
    orig = {t: pq.read_table(os.path.join(src_dir, f"{t}.parquet")) for t in TABLES}
    schemas = {t: orig[t].schema for t in TABLES}
    O = {t: orig[t].to_pandas() for t in TABLES}

    def emit(name: str, df: pd.DataFrame) -> None:
        if name in empty:
            df = df.iloc[0:0]
        _write(out_dir, name, df, schemas[name])

    # --- dims: keep keys, scuff names -------------------------------
    region = O["region"].copy()
    scuff = rng.rand(len(region)) < 0.3
    region.loc[scuff, "r_name"] = region.loc[scuff, "r_name"] + " " + rng.choice(_UNICODE_WORDS)
    emit("region", region)

    nation = O["nation"].copy()
    nation["n_name"] = _null_burst(rng, nation["n_name"], 0.08)
    emit("nation", nation)

    # --- customer / supplier: skewed nation, NULL-burst values ------
    nkeys = O["nation"]["n_nationkey"].to_numpy()
    n_cust = int(len(O["customer"]) * (0.5 + rng.rand()))
    customer = pd.DataFrame({
        "c_custkey": np.arange(0, n_cust, dtype="int64"),
        "c_name": [f"Customer#{i}" for i in range(1, n_cust + 1)],
        "c_nationkey": _zipf_choice(rng, nkeys, n_cust),
        "c_acctbal": rng.randn(n_cust) * 2000.0,
        "c_mktsegment": rng.choice(O["customer"]["c_mktsegment"].unique(), n_cust),
    })
    customer.loc[0, "c_acctbal"] = 0.0
    customer["c_acctbal"] = _null_burst(rng, customer["c_acctbal"], 0.06)
    customer["c_mktsegment"] = _null_burst(rng, customer["c_mktsegment"], 0.05)
    emit("customer", customer)

    n_supp = max(3, int(len(O["supplier"]) * (0.5 + rng.rand())))
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(0, n_supp, dtype="int64"),
        "s_name": [f"Supplier#{i}" for i in range(1, n_supp + 1)],
        "s_nationkey": _zipf_choice(rng, nkeys, n_supp),
        "s_acctbal": rng.randn(n_supp) * 1000.0,
    })
    supplier["s_acctbal"] = _null_burst(rng, supplier["s_acctbal"], 0.06)
    emit("supplier", supplier)

    # --- part: hot brand, a NULL-burst price ------------------------
    n_part = max(10, int(len(O["part"]) * (0.5 + rng.rand())))
    part = pd.DataFrame({
        "p_partkey": np.arange(0, n_part, dtype="int64"),
        "p_name": [f"part {i} " + ("✨" if i % 17 == 0 else "plain") for i in range(1, n_part + 1)],
        "p_brand": _zipf_choice(rng, O["part"]["p_brand"].unique(), n_part),
        "p_type": rng.choice(O["part"]["p_type"].unique(), n_part),
        "p_size": rng.randint(0, 51, n_part),
        "p_retailprice": 100.0 + rng.rand(n_part) * 900.0,
    })
    part["p_retailprice"] = _null_burst(rng, part["p_retailprice"], 0.05)
    emit("part", part)

    # --- orders: mega-customer, date bursts, priority NULLs ---------
    n_ord = int(len(O["orders"]) * (0.5 + rng.rand()))
    base_day = pd.Timestamp("2024-03-01")
    day_pool = np.concatenate([
        rng.randint(0, 90, n_ord // 2),              # spread
        np.full(n_ord - n_ord // 2, int(rng.randint(0, 90))),  # one burst day
    ])
    rng.shuffle(day_pool)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(0, n_ord, dtype="int64"),
        "o_custkey": _zipf_choice(rng, customer["c_custkey"].to_numpy(), n_ord),
        "o_orderstatus": rng.choice(O["orders"]["o_orderstatus"].unique(), n_ord),
        "o_totalprice": np.abs(rng.randn(n_ord)) * 10000.0,
        "o_orderdate": (base_day + pd.to_timedelta(day_pool, unit="D")).astype("datetime64[us]"),
        "o_orderpriority": rng.choice(O["orders"]["o_orderpriority"].unique(), n_ord),
    })
    orders["o_orderpriority"] = _null_burst(rng, orders["o_orderpriority"], 0.07)
    emit("orders", orders)

    # --- lineitem: a mega-order (graph hub), NULL-burst measures ----
    n_li = int(len(O["lineitem"]) * (0.5 + rng.rand()))
    okeys = orders["o_orderkey"].to_numpy()
    l_order = _zipf_choice(rng, okeys, n_li)
    lineitem = pd.DataFrame({
        "l_orderkey": l_order,
        "l_partkey": _zipf_choice(rng, part["p_partkey"].to_numpy(), n_li),
        "l_suppkey": rng.choice(supplier["s_suppkey"].to_numpy(), n_li),
        "l_linenumber": np.int32(1) + rng.randint(0, 7, n_li).astype("int32"),
        "l_quantity": rng.randint(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.abs(rng.randn(n_li)) * 5000.0,
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(O["lineitem"]["l_returnflag"].unique(), n_li),
        "l_linestatus": rng.choice(O["lineitem"]["l_linestatus"].unique(), n_li),
        "l_shipdate": (base_day + pd.to_timedelta(rng.randint(0, 120, n_li), unit="D")).astype("datetime64[us]"),
    })
    lineitem["l_extendedprice"] = _null_burst(rng, lineitem["l_extendedprice"], 0.05)
    emit("lineitem", lineitem)

    # --- events: session-boundary gaps, skewed users, NULL values ---
    n_ev = int(len(O["events"]) * (0.5 + rng.rand()))
    users = np.arange(1, max(5, n_ev // 20) + 1, dtype="int64")
    gaps = rng.choice([5, 60, 1799, 1800, 1801, 7200], n_ev, p=[0.5, 0.3, 0.05, 0.05, 0.05, 0.05])
    ts = pd.Timestamp("2024-03-01 00:00:00") + pd.to_timedelta(np.cumsum(gaps) // max(1, len(users) // 8), unit="s")
    events = pd.DataFrame({
        "event_id": np.arange(0, n_ev, dtype="int64"),
        "ts": ts.astype("datetime64[us]"),
        "user_id": _zipf_choice(rng, users, n_ev),
        "event_type": rng.choice(O["events"]["event_type"].unique(), n_ev),
        "value": rng.rand(n_ev) * 100.0,
        "props": [json.dumps({"k": int(k)}) if k % 7 else "{not json" for k in rng.randint(0, 500, n_ev)],
    })
    events["value"] = _null_burst(rng, events["value"], 0.06)
    emit("events", events)

    # --- documents: mutated originals + duplicates + chaos tail -----
    od = O["documents"]
    keep = od.sample(frac=0.6, random_state=seed).reset_index(drop=True)
    dup_src = od.sample(frac=0.15, random_state=seed + 1).reset_index(drop=True)
    dups = dup_src.copy()
    dups["source"] = list(rng.choice(od["source"].unique(), len(dups)))  # cross-source exact dups
    near = od.sample(frac=0.1, random_state=seed + 2).reset_index(drop=True)
    near["text"] = near["text"] + " zzextra"
    vocab = ["alpha", "beta", "merge", "scan", "sort", "spark", "query"] + _UNICODE_WORDS
    chaos_texts = (
        ["", "   ", "\n\n", "one", "🌊 🌊 🌊", " ".join(["dup"] * 5000)]
        + [" ".join(rng.choice(vocab, int(rng.randint(3, 60)))) for _ in range(max(4, len(od) // 10))]
    )
    chaos = pd.DataFrame({
        "text": chaos_texts,
        "lang": rng.choice(list(od["lang"].unique()) + ["xx"], len(chaos_texts)),
        "source": rng.choice(od["source"].unique(), len(chaos_texts)),
    })
    docs = pd.concat(
        [keep[["text", "lang", "source"]], dups[["text", "lang", "source"]],
         near[["text", "lang", "source"]], chaos],
        ignore_index=True,
    )
    docs = docs.sample(frac=1.0, random_state=seed + 3).reset_index(drop=True)
    docs["lang"] = _null_burst(rng, docs["lang"], 0.04)
    docs["doc_id"] = np.arange(0, len(docs), dtype="int64")
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    emit("documents", docs[["doc_id", "text", "lang", "source", "n_chars"]])

    # --- embeddings: copies, scaled copies, zero/tiny vectors -------
    oe = O["embeddings"]
    dim = len(oe["embedding"].iloc[0])
    base = oe.sample(frac=0.7, random_state=seed).reset_index(drop=True)
    copies = base.head(max(3, len(base) // 10)).copy()
    scaled = base.head(max(3, len(base) // 20)).copy()
    scaled["embedding"] = scaled["embedding"].map(lambda v: [float(x) * 2.0 for x in v])
    extras = pd.DataFrame({
        "embedding": [
            [0.0] * dim,
            [1e-30] * dim,
            list(np.round(rng.randn(dim), 4)),
        ],
        "label": rng.choice(oe["label"].unique(), 3),
    })
    emb = pd.concat(
        [base[["embedding", "label"]], copies[["embedding", "label"]],
         scaled[["embedding", "label"]], extras],
        ignore_index=True,
    )
    emb["vec_id"] = np.arange(0, len(emb), dtype="int64")
    emit("embeddings", emb[["vec_id", "embedding", "label"]])


def sweep(fuzz_dir: str, names: list[str] | None = None) -> dict:
    import duckdb

    import __spark_entry__ as entrymod
    from tools.verify_oracle import TABLES as VT
    from tools.verify_oracle import compare
    from usajobs_etl_service_spark.session import get_spark

    spark = get_spark("fuzz_oracle")
    con = duckdb.connect()
    for t in VT:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'")
    registry = entrymod.queries()
    names = names or list(registry)
    results: dict[str, str] = {}
    for name in names:
        try:
            results[name] = compare(name, spark, con, fuzz_dir)
        except Exception as e:  # noqa: BLE001 — a fuzz sweep must not die mid-run
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        print(f"{name:32s} {results[name]}", flush=True)
    n_bad = sum(1 for v in results.values() if not v.startswith(("OK", "SKIP")))
    print(f"\n{len(names) - n_bad}/{len(names)} passing")
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("cmd", choices=["run", "gen"])
    ap.add_argument("--seed", type=int, action="append", required=True)
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", default=None, help="data dir (gen / single-seed run)")
    ap.add_argument("--keep", action="store_true", help="keep generated parquet dirs")
    ap.add_argument("--empty", default="", help="comma-separated tables to emit EMPTY")
    ap.add_argument("--queries", nargs="+", default=None)
    ap.add_argument("--artifact", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "FUZZ_ORACLE.json"))
    args = ap.parse_args()
    empty = {t for t in args.empty.split(",") if t}

    if args.cmd == "gen":
        for seed in args.seed:
            out = args.out or f"/tmp/fuzzdata_seed{seed}"
            generate(seed, args.src, out, empty)
            print(f"seed {seed}: wrote {out}")
        return

    artifact: dict = {"src": args.src, "empty_tables": sorted(empty), "seeds": {}}
    if os.path.exists(args.artifact):
        with open(args.artifact) as f:
            try:
                artifact = json.load(f)
            except Exception:
                pass
    any_bad = False
    for seed in args.seed:
        out = args.out or tempfile.mkdtemp(prefix=f"fuzzdata_seed{seed}_")
        generate(seed, args.src, out, empty)
        results = sweep(out, args.queries)
        n_bad = sum(1 for v in results.values() if not v.startswith(("OK", "SKIP")))
        any_bad = any_bad or n_bad > 0
        artifact.setdefault("seeds", {})[str(seed)] = {
            "data_dir": out if args.keep else "(removed)",
            "n_queries": len(results),
            "n_ok": sum(1 for v in results.values() if v.startswith("OK")),
            "n_skip": sum(1 for v in results.values() if v.startswith("SKIP")),
            "n_bad": n_bad,
            "failures": {k: v for k, v in results.items() if not v.startswith(("OK", "SKIP"))},
        }
        if not args.keep:
            shutil.rmtree(out, ignore_errors=True)
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {args.artifact}")
    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
