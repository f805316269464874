#!/usr/bin/env python3
"""One-off restore of /root/testdata/sf0.01 after an accidental wipe
(Verify arg-order mistake made sf0.01 the outDir; Verify clears outDir).

Sources, in fidelity order:
- events: EXACT recovery from a surviving full-scan dump
  (/tmp/verify_out2/s1_full_scan = raw sf0.01 events, validated
  byte-equal against the store fixture's clicks/purchases datasets).
  Only `props` (unused by every query) is re-synthesized.
- region/nation: scale-invariant (verified sf0.001 == sf0.1) -> copied.
- customer/orders/lineitem: FK-consistent downsample of sf0.1
  (c_custkey < 1500 chain); l_partkey/l_suppkey remapped into the
  sf0.01 keyspace. part/supplier: key-prefix subsets (no query reads
  them).
- documents: whole dup-clusters sampled from sf0.1 (every 10th) so the
  near-dup structure matches the original's stats (~25 pairs/47
  members), filled with non-dup docs, ids remapped to 0..499.
- embeddings: vec_id < 500 prefix of sf0.1 (35 LSH pairs vs 33
  originally -- structure preserved).

The driver's correctness gate compares Spark vs DuckDB over the SAME
files, so it stays fully meaningful on this reconstruction.
"""
import duckdb, glob, os
from collections import defaultdict
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.001"
DST = "/root/testdata/sf0.01"
con = duckdb.connect()

def write(name, tbl):
    ref = pq.read_schema(f"{SRC}/{name}.parquet")
    ref = pa.schema([ref.field(i) for i in range(len(ref.names))])  # drop metadata
    tbl = tbl.select(ref.names).cast(ref)
    pq.write_table(tbl, f"{DST}/{name}.parquet")
    print(name, tbl.num_rows)

os.makedirs(DST, exist_ok=True)

# --- events: exact rows from the s1 full-scan dump + synthetic props
s1 = sorted(glob.glob("/tmp/verify_out2/s1_full_scan/*.parquet"))
ev = con.execute(f"""
  SELECT event_id, CAST(ts AS TIMESTAMP_NS) AS ts, user_id, event_type,
         value, '{{"k": ' || CAST((event_id * 7919) % 100 AS VARCHAR) || '}}' AS props
  FROM read_parquet({s1}) ORDER BY event_id""").arrow()
write("events", ev)

# --- dimensions: scale-invariant
for t in ["region", "nation"]:
    write(t, con.execute(f"SELECT * FROM '{SMALL}/{t}.parquet'").arrow())

# --- fact chain: custkey < 1500
write("customer", con.execute(
    f"SELECT * FROM '{SRC}/customer.parquet' WHERE c_custkey < 1500 ORDER BY c_custkey").arrow())
write("orders", con.execute(
    f"SELECT * FROM '{SRC}/orders.parquet' WHERE o_custkey < 1500 ORDER BY o_orderkey").arrow())
write("lineitem", con.execute(f"""
  SELECT l_orderkey, l_partkey % 2000 AS l_partkey, l_suppkey % 100 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'
  WHERE l_orderkey IN (SELECT o_orderkey FROM '{SRC}/orders.parquet'
                       WHERE o_custkey < 1500)
  ORDER BY l_orderkey, l_linenumber""").arrow())
write("part", con.execute(
    f"SELECT * FROM '{SRC}/part.parquet' WHERE p_partkey < 2000 ORDER BY p_partkey").arrow())
write("supplier", con.execute(
    f"SELECT * FROM '{SRC}/supplier.parquet' WHERE s_suppkey < 100 ORDER BY s_suppkey").arrow())

# --- embeddings: prefix keeps 35 near-dup pairs
write("embeddings", con.execute(
    f"SELECT * FROM '{SRC}/embeddings.parquet' WHERE vec_id < 500 ORDER BY vec_id").arrow())

# --- documents: sample whole dup clusters (every 10th), fill with
# non-members, remap ids to 0..499
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SRC}/documents.parquet'")
# inline the exact-jaccard pair query (threshold 0.5, 3-gram shingles)
# the repo's word-3-gram shingle CTE (PipelineQueries.ShingleCte)
pairs = con.execute("""
  WITH sh AS (SELECT DISTINCT doc_id AS id,
                ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
                   unnest(generate_series(1, len(ws) - 2)) t(i)),
       cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       p AS (SELECT a.id AS i, b.id AS j, count(*) AS inter
             FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
             GROUP BY 1, 2)
  SELECT p.i, p.j FROM p
  JOIN cnt ca ON ca.id = p.i JOIN cnt cb ON cb.id = p.j
  WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.5""").df()
parent = {}
def find(x):
    while parent.setdefault(x, x) != x:
        parent[x] = parent[parent[x]]; x = parent[x]
    return x
for i, j in zip(pairs.i, pairs.j):
    parent[find(int(i))] = find(int(j))
cl = defaultdict(list)
for x in list(parent):
    cl[find(x)].append(x)
clusters = sorted(cl.values(), key=min)
keep = []
for idx, c in enumerate(clusters):
    if idx % 10 == 0:
        keep.extend(c)
members = set().union(*cl.values())
nonmem = [d for d in range(5000) if d not in members]
need = 500 - len(keep)
fill = [nonmem[round(k * (len(nonmem) - 1) / (need - 1))] for k in range(need)]
chosen = sorted(set(keep) | set(fill))
assert len(chosen) == 500, len(chosen)
ids = ",".join(map(str, chosen))
docs = con.execute(f"""
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS doc_id,
         text, lang, source, n_chars
  FROM documents WHERE doc_id IN ({ids}) ORDER BY doc_id""").arrow()
write("documents", docs)
print("kept dup members:", len(keep), "of clusters:", (len(clusters) + 9) // 10)
