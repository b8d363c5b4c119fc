#!/usr/bin/env python3
"""Scale-ladder data: synthesize sf1 (10x sf0.1) by replicating each
fact-ish table 10 times with referentially consistent key shifts —
orders.o_custkey shifts with customer.c_custkey, lineitem's three FKs
shift with their parents, so every join keeps its selectivity while row
counts scale 10x. Dimension tables (region, nation) stay single-copy,
like a real warehouse. Text/embedding payloads are kept IDENTICAL
across copies on purpose: a 10x-duplicated corpus is the realistic
stress case for the dedup/ANN family. events.ts is written as raw
INT64 nanos (the same physical layout the driver's TIMESTAMP(NANOS)
column has once nanosAsLong applies).

Each replicated table is a DIRECTORY of 4 part files per copy (40
splits per table): a single-file table would give a Spark scan one
input split and serialize per-row-heavy queries on one core — a layout
no real large dataset has (the first ladder run measured q29, a pure
projection, at 16x for this reason alone; the 10-file layout of rounds
8-9 still capped every scan at 10-way on 32 cores).

Dev-side tool; never runs in the library. Output: /root/repo/target/sf1
(gitignored — only the bench JSON is committed).
Usage: make_sf1.py [src=/root/testdata/sf0.1] [dst=/root/repo/target/sf1]
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
if os.path.exists(dst):
    shutil.rmtree(dst)
os.makedirs(dst)
SHIFT = 10_000_000  # > any key range in sf0.1 by 10x

con = duckdb.connect()

def emit_single(name, select):
    con.sql(f"COPY ({select}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n}")

SLICES = 4  # files per copy: COPIES x 4 splits per table
# COPIES scales the ladder rung: 10 = sf1 (the default), 30 = sf3 —
# same referential key-shift construction at any multiple.
COPIES = int(os.environ.get("SF_COPIES", "10"))

def emit(name, select_for_k, idcol):
    # One file per (copy, id-mod slice): 40 files per table. Parquet
    # cannot split below file/row-group granularity, so the file count
    # IS the scan parallelism ceiling — 10 files serialized per-row-heavy
    # scans at 10-way on 32 cores (measured: the media family left 3.2x
    # idle; every documents scan likewise). 40 >= cores matches what any
    # real 10x dataset would have; content is identical (the slices
    # partition each copy by id residue).
    d = f"{dst}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    for k in range(COPIES):
        for j in range(SLICES):
            con.sql(f"COPY (SELECT * FROM ({select_for_k(k * SHIFT)}) __t "
                    f"WHERE ({idcol}) % {SLICES} = {j}) "
                    f"TO '{d}/part-{k:05d}-{j}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
    print(f"{name}: {n}")

for t in ("region", "nation"):
    emit_single(t, f"SELECT * FROM '{src}/{t}.parquet'")

emit("customer", lambda s: f"""
  SELECT c_custkey + {s} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet'""", "c_custkey")
emit("supplier", lambda s: f"""
  SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet'""", "s_suppkey")
emit("part", lambda s: f"""
  SELECT p_partkey + {s} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{src}/part.parquet'""", "p_partkey")
emit("orders", lambda s: f"""
  SELECT o_orderkey + {s} AS o_orderkey, o_custkey + {s} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet'""", "o_orderkey")
emit("lineitem", lambda s: f"""
  SELECT l_orderkey + {s} AS l_orderkey, l_partkey + {s} AS l_partkey,
         l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{src}/lineitem.parquet'""", "l_orderkey")
emit("events", lambda s: f"""
  SELECT event_id + {s} AS event_id, epoch_ns(ts) AS ts,
         user_id + {s} AS user_id, event_type, value, props
  FROM '{src}/events.parquet'""", "event_id")
emit("documents", lambda s: f"""
  SELECT doc_id + {s} AS doc_id, text, lang, source, n_chars
  FROM '{src}/documents.parquet'""", "doc_id")
emit("embeddings", lambda s: f"""
  SELECT vec_id + {s} AS vec_id, embedding, label
  FROM '{src}/embeddings.parquet'""", "vec_id")
