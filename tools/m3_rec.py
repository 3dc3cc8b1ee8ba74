#!/usr/bin/env python3
"""Recursive-CTE variant of the m3_latency_gbt oracle prototype.

One WITH RECURSIVE iteration per (tree, level): 11 iterations per
boosting stage (10 split levels + the leaf/advance boundary), state =
the train rows + grid rows. All cross-row sums are order-pinned
sequential folds (list_reduce over window lists ordered exactly like
the driver's loops), so every double matches GbtLocal.fit bit-for-bit.

Usage: python3 tools/m3_rec.py /root/testdata/sf0.01 [trees]
"""
import sys, time
import duckdb

from m3_proto import PRO, TRAIN_TARGET, MAX_DEPTH, fit, predict, round_half_up4

LR = 0.1


def build_sql(pro, n_trees):
    iters = 11 * n_trees
    dlr = "CAST('0.1' AS DOUBLE)"
    eps = "CAST('1.0E-12' AS DOUBLE)"
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    flt = "FILTER (WHERE kind = 't' AND v IS NULL)"

    def cands(lx, lr, f_id):
        # candidate positions where x strictly increases, then one ordered
        # prefix fold per candidate (sl = the driver's running residual
        # sum at that position), then the gain/threshold struct. Staged
        # transforms keep the slice fold evaluated ONCE per candidate.
        # NOTE: struct-literal accumulators in list_reduce are broken in
        # DuckDB 1.0 (fields fold independently), so sl must come from
        # slice folds, and the final ratchet must return a WHOLE struct.
        ks = (f"list_filter(list_transform(range(1, n), k -> "
              f"CASE WHEN {lx}[k] < {lx}[k+1] THEN k END), k -> k IS NOT NULL)")
        withsl = (f"list_transform({ks}, k -> {{'kk': k, "
                  f"'s1': CAST(list_reduce({lr}[1:k], (a,b) -> a + b) AS DOUBLE)}})")
        gain = "c.s1*c.s1/c.kk + (s - c.s1)*(s - c.s1)/(n - c.kk) - s*s/n"
        thr = (f"CASE WHEN {lx}[c.kk]/2 + {lx}[c.kk+1]/2 < {lx}[c.kk+1] "
               f"THEN {lx}[c.kk]/2 + {lx}[c.kk+1]/2 ELSE {lx}[c.kk] END")
        return (f"list_transform({withsl}, c -> "
                f"{{'g': {gain}, 'f': CAST({f_id} AS BIGINT), 'thr': {thr}}})")

    seed = (f"{{'g': {eps}, 'f': CAST(-1 AS BIGINT), "
            f"'thr': CAST(0 AS DOUBLE)}}")
    # fold in the driver's scan order (feature 0's candidates, then
    # feature 1's); strict > keeps the FIRST max — the ratchet
    pick = (f"list_reduce(list_prepend({seed}, "
            f"list_concat({cands('lx0', 'lr0', 0)}, {cands('lx1', 'lr1', 1)})), "
            f"(a, c) -> CASE WHEN c.g > a.g THEN c ELSE a END)")

    return f"""WITH RECURSIVE
pro AS MATERIALIZED (SELECT expid, scaleout, avglat, avgthr
  FROM ({pro}) WHERE isbckpres = 0),
md AS (SELECT GREATEST(1, COUNT(*) // {TRAIN_TARGET}) AS m FROM pro),
tr AS MATERIALIZED (SELECT
    row_number() OVER (ORDER BY scaleout, avgthr, avglat) AS pos,
    CAST(scaleout AS DOUBLE) AS f0, avgthr AS f1, avglat AS y
  FROM pro WHERE expid % (SELECT m FROM md) = 1 % (SELECT m FROM md)),
i0 AS (SELECT CAST(list_reduce(list(y ORDER BY pos), (a,b) -> a + b) AS DOUBLE)
    / COUNT(*) AS iv FROM tr),
grid AS MATERIALIZED (SELECT
    1000000 + row_number() OVER (ORDER BY f0, f1) AS pos, f0, f1
  FROM (SELECT f0, UNNEST([lo, (lo + hi)/2, hi]) AS f1
        FROM (SELECT CAST(scaleout AS DOUBLE) AS f0,
                     MIN(avgthr) AS lo, MAX(avgthr) AS hi
              FROM pro WHERE expid % (SELECT m FROM md) = 1 % (SELECT m FROM md)
              GROUP BY scaleout))),
st0 AS MATERIALIZED (
  SELECT 't' AS kind, pos, f0, f1, y, iv AS f, y - iv AS r,
         CAST(1 AS BIGINT) AS nd, CAST(NULL AS DOUBLE) AS v
  FROM tr, i0
  UNION ALL
  SELECT 'g', pos, f0, f1, CAST(NULL AS DOUBLE), iv, CAST(NULL AS DOUBLE), 1, NULL
  FROM grid, i0),
rec AS (
  SELECT 0 AS it, * FROM st0
  UNION ALL
  SELECT it + 1, kind, pos, f0, f1, y,
    CASE WHEN lvl = 10 THEN f + {dlr} * COALESCE(v, s/n) ELSE f END AS f,
    CASE WHEN lvl = 10 THEN y - (f + {dlr} * COALESCE(v, s/n)) ELSE r END AS r,
    CASE WHEN lvl = 10 THEN 1
         WHEN v IS NULL AND pk.f >= 0 THEN
           2*nd + CASE WHEN (CASE pk.f WHEN 0 THEN f0 ELSE f1 END) <= pk.thr
                       THEN 0 ELSE 1 END
         ELSE nd END AS nd,
    CASE WHEN lvl = 10 THEN NULL
         WHEN v IS NULL AND pk.f = -1 THEN s/n
         ELSE v END AS v
  FROM (
    SELECT *, it % 11 AS lvl,
      CASE WHEN lvl0 < 10 THEN {pick} END AS pk
    FROM (
      SELECT *, it % 11 AS lvl0,
        CAST(list_reduce(lsp, (a,b) -> a + b) AS DOUBLE) AS s
      FROM (
          SELECT it, kind, pos, f0, f1, y, f, r, nd, v,
            COUNT(*) {flt} OVER (PARTITION BY nd) AS n,
            list(r) {flt} OVER (PARTITION BY nd ORDER BY pos {frame}) AS lsp,
            list(f0) {flt} OVER (PARTITION BY nd ORDER BY f0, pos {frame}) AS lx0,
            list(r) {flt} OVER (PARTITION BY nd ORDER BY f0, pos {frame}) AS lr0,
            list(f1) {flt} OVER (PARTITION BY nd ORDER BY f1, pos {frame}) AS lx1,
            list(r) {flt} OVER (PARTITION BY nd ORDER BY f1, pos {frame}) AS lr1
          FROM rec WHERE it < {iters}))))
SELECT f0 AS scaleout, ROUND(f1 + 1e-9, 4) AS avgthr,
       ROUND(f + 1e-9, 4) AS pred_latency
FROM rec WHERE it = {iters} AND kind = 'g'"""


def main():
    sf = sys.argv[1]
    n_trees = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    con = duckdb.connect()
    con.sql(f"create view orders as select * from read_parquet('{sf}/orders.parquet')")

    rows = con.sql(f"SELECT expid, scaleout, avglat, avgthr FROM ({PRO}) WHERE isbckpres = 0").fetchall()
    mod = max(1, len(rows) // TRAIN_TARGET)
    train = sorted([(float(r[1]), r[3], r[2]) for r in rows if r[0] % mod == 1 % mod])
    xs = [[r[0], r[1]] for r in train]
    ys = [r[2] for r in train]
    model = fit(xs, ys, n_trees)
    gsrc = {}
    for r in rows:
        if r[0] % mod == 1 % mod:
            so = float(r[1])
            lo, hi = gsrc.get(so, (float("inf"), float("-inf")))
            gsrc[so] = (min(lo, r[3]), max(hi, r[3]))
    expected = sorted(
        (so, round_half_up4(thr + 1e-9), round_half_up4(predict(model, [so, thr]) + 1e-9))
        for so in gsrc for thr in (gsrc[so][0], (gsrc[so][0] + gsrc[so][1]) / 2, gsrc[so][1]))

    sql = build_sql(PRO, n_trees)
    print(f"sql: {len(sql)} bytes, trees={n_trees}", flush=True)
    t0 = time.time()
    got = sorted(con.sql(sql).fetchall())
    print(f"duckdb: {time.time() - t0:.2f}s, {len(got)} rows", flush=True)
    if got == expected:
        print("MATCH bit-exact")
    else:
        bad = [(e, g) for e, g in zip(expected, got) if e != g]
        print(f"MISMATCH {len(bad)}/{len(expected)}")
        for e, g in bad[:8]:
            print("  exp", e, " got", g)


if __name__ == "__main__":
    main()
