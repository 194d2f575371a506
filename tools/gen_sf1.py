#!/usr/bin/env python3
"""Generate an Nx scale-up of the sf0.1 fixture for the bench scale-slope
measurement (VERDICT r8 item 4; second decade r14 item 1). NOT an oracle
fixture: correctness stays gated on the driver's sf0.01 tables; this data
exists only to measure the sec-per-query slope across scale factors with
the same partition rule.

Construction: R replicas of sf0.1 (R = 10*SF, argv[1] = SF, default 1),
replica i shifting every entity key (orderkey/partkey/suppkey/custkey/
doc_id/vec_id/event_id/user_id) by i*KEY_OFF so each replica is a
disjoint, referentially-consistent sub-database — joins fan out exactly
as at Rx data, distinct counts scale Rx. Document text is passed through
a per-replica ROTATED-ALPHABET substitution (bijective char map):
within-replica dup/near-dup structure is preserved exactly
(MinHash/SimHash/winnowing are permutation-covariant), while
cross-replica shingle overlap drops to ~0 — so dedup queries see Rx
corpora, not a degenerate R-way duplicate explosion. Past 26 replicas
the rotations would repeat (replica 26's text would exactly duplicate
replica 0's, planting an artificial cross-replica dup structure), so
replicas >= 26 additionally SWAP CASE — 52 distinct bijections, enough
through sf5. Embeddings get a per-replica additive epsilon for the same
reason (no R-way exact-tie neighbor lists). Dims nation/region stay
fixed (TPC-H semantics); the un-shifted c_nationkey/s_nationkey
references stay valid.

Output: bench_ab/sf<SF>/<table>.parquet (untracked; ~240 MB per sf1)."""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
SF = int(sys.argv[1]) if len(sys.argv) > 1 else 1
R = 10 * SF
assert R <= 52, "only 52 distinct text bijections available (see docstring)"
DST = os.path.join(os.path.dirname(__file__), "..", "bench_ab", f"sf{SF}")
# > any sf0.1 key (max observed ~2.4M), and COPRIME to the small moduli
# downstream synthetic-payload generators apply to keys (the multimodal
# queries derive pixel/PCM bytes from `id % 256` / `id % 5` / `id % 4`):
# the round-14 first sf3 run measured a 7x wall on the media pair
# detectors because 2^24 = 0 (mod 256) made every replica's payloads
# byte-identical to replica 0's — an R-way duplicate explosion the
# generator contract promises NOT to plant. 2^24 + 1 is odd, != 0 mod
# 5, so key-derived payloads differ per replica.
KEY_OFF = (1 << 24) + 1

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGITS = "0123456789"

def rot(s, i):
    n = len(s)
    return s[i % n:] + s[:i % n]

def repl_select(table, i):
    k = f"+ {i * KEY_OFF}"
    if table == "lineitem":
        return (f"SELECT l_orderkey {k} AS l_orderkey, l_partkey {k} AS l_partkey, "
                f"l_suppkey {k} AS l_suppkey, l_linenumber, l_quantity, "
                f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
                f"l_shipdate FROM src")
    if table == "orders":
        return (f"SELECT o_orderkey {k} AS o_orderkey, o_custkey {k} AS o_custkey, "
                f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src")
    if table == "customer":
        return (f"SELECT c_custkey {k} AS c_custkey, c_name, c_nationkey, "
                f"c_acctbal, c_mktsegment FROM src")
    if table == "supplier":
        return f"SELECT s_suppkey {k} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM src"
    if table == "part":
        return (f"SELECT p_partkey {k} AS p_partkey, p_name, p_brand, p_type, "
                f"p_size, p_retailprice FROM src")
    if table == "events":
        return (f"SELECT event_id {k} AS event_id, ts, user_id {k} AS user_id, "
                f"event_type, value, props FROM src")
    if table == "documents":
        # digits rotate too (i % 10): digit-only shingles would otherwise
        # collide across every replica and grow posting lists R-wide
        frm = LOWER + UPPER + DIGITS
        if i < 26:
            to = rot(LOWER, i) + rot(UPPER, i) + rot(DIGITS, i)
        else:  # case-swap bijections: distinct from every pure rotation
            to = rot(UPPER, i) + rot(LOWER, i) + rot(DIGITS, i)
        return (f"SELECT doc_id {k} AS doc_id, "
                f"translate(text, '{frm}', '{to}') AS text, "
                f"lang, source, n_chars FROM src")
    if table == "embeddings":
        # label suffix per replica: labels are the within-corpus blocking
        # key of the exact near-dup operators — verbatim labels made
        # within-label joins R^2 instead of R (the sub-database contract:
        # joins fan out exactly as at Rx data). No query filters label by
        # literal (grepped), so the suffix only partitions the key space.
        eps = i * 1e-3
        lbl = "label" if i == 0 else f"label || '_r{i}'"
        return (f"SELECT vec_id {k} AS vec_id, "
                f"list_transform(embedding, x -> CAST(x + {eps} AS FLOAT)) AS embedding, "
                f"{lbl} AS label FROM src")
    raise ValueError(table)

def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for table in ["region", "nation"]:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
                    f"'{DST}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        print(f"{table}: copied")
    for table in ["customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"]:
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
        union = " UNION ALL ".join(repl_select(table, i) for i in range(R))
        con.execute(f"COPY ({union}) TO '{DST}/{table}.parquet' "
                    f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

if __name__ == "__main__":
    main()
