#!/usr/bin/env python3
"""Prototype harness for the m3_latency_gbt relational oracle.

Replicates GbtLocal.fit + the m3_latency_gbt query bit-for-bit in Python
(IEEE doubles, same operation order as the Scala driver code), generates
the unrolled per-level DuckDB oracle SQL, runs it, and compares cell by
cell. Used to converge the generator before porting it to Scala
(MlQueries.oracles). Not part of the library.

Usage: python3 tools/m3_proto.py /root/testdata/sf0.01 [--sql-only]
"""
import sys, time
import duckdb

PRO = """SELECT o_orderkey AS expid,
       2 + o_orderkey % 23 AS scaleout,
       ROUND(o_totalprice / 100, 4) AS avglat,
       ROUND(o_totalprice, 4) AS avgthr,
       CAST(o_orderkey % 3 = 0 AS BIGINT) AS isbckpres
FROM orders"""

TRAIN_TARGET = 80
MAX_TREES = 60
MAX_DEPTH = 10
LR = 0.1
EPS = 1e-12


# ---------------------------------------------------------------- python fit
def fit_tree(xs, target, idx, depth):
    n = len(idx)
    s = 0.0
    for j in idx:
        s += target[j]
    mean = s / n
    if depth >= MAX_DEPTH or n < 2:
        return (-1, 0.0, mean, None, None)
    best_gain = EPS
    best_feat = -1
    best_thr = 0.0
    nfeat = len(xs[idx[0]])
    for f in range(nfeat):
        ord_ = sorted(idx, key=lambda j: (xs[j][f], j))
        sl = 0.0
        for k in range(n - 1):
            sl += target[ord_[k]]
            a = xs[ord_[k]][f]
            b = xs[ord_[k + 1]][f]
            if a < b:
                nl = k + 1
                gain = sl * sl / nl + (s - sl) * (s - sl) / (n - nl) - s * s / n
                if gain > best_gain:
                    mid = a / 2 + b / 2
                    best_gain = gain
                    best_feat = f
                    best_thr = mid if mid < b else a
    if best_feat < 0:
        return (-1, 0.0, mean, None, None)
    l_idx = [j for j in idx if xs[j][best_feat] <= best_thr]
    r_idx = [j for j in idx if xs[j][best_feat] > best_thr]
    return (best_feat, best_thr, mean,
            fit_tree(xs, target, l_idx, depth + 1),
            fit_tree(xs, target, r_idx, depth + 1))


def eval_tree(node, x):
    while node[0] >= 0:
        node = node[3] if x[node[0]] <= node[1] else node[4]
    return node[2]


def fit(xs, ys, n_trees):
    n = len(ys)
    s = 0.0
    for v in ys:
        s += v
    init = s / n
    f = [init] * n
    trees = []
    for _ in range(n_trees):
        residual = [ys[i] - f[i] for i in range(n)]
        t = fit_tree(xs, residual, list(range(n)), 0)
        for i in range(n):
            f[i] += LR * eval_tree(t, xs[i])
        trees.append(t)
    return (init, trees)


def predict(model, x):
    init, trees = model
    s = init
    for t in trees:
        s += LR * eval_tree(t, x)
    return s


def round_half_up4(v):
    # Spark ROUND(x, 4): BigDecimal HALF_UP on the double's exact value
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------- oracle sql
def dlit(v):
    return f"CAST('{v!r}' AS DOUBLE)"


def stage_ctes(m):
    """One boosting stage: 10 split levels + final leaf level + per-row
    tree prediction + f advance. Input: s{m-1}(pos, f0, f1, y, f).
    Output: s{m}(pos, f0, f1, y, f) and tree relations p{m}_{L}, v{m}_{L}."""
    out = []
    out.append(f"""r{m}_0 AS MATERIALIZED (SELECT pos, f0, f1, y - f AS r, 1 AS nd FROM s{m - 1})""")
    for L in range(MAX_DEPTH):
        out.append(f"""a{m}_{L} AS MATERIALIZED (SELECT nd, COUNT(*) AS n,
  CAST(list_reduce(list(r ORDER BY pos), (u,w) -> u + w) AS DOUBLE) AS s
  FROM r{m}_{L} GROUP BY nd)""")
        out.append(f"""g{m}_{L} AS MATERIALIZED (
  SELECT nd, f, k, lx, lr, n, s FROM (
    SELECT c.nd, c.f, a.n, a.s, c.lx, c.lr, UNNEST(range(1, a.n)) AS k
    FROM (SELECT nd, f, list(x ORDER BY x, pos) AS lx,
                 list(r ORDER BY x, pos) AS lr
          FROM (SELECT nd, pos, r, 0 AS f, f0 AS x FROM r{m}_{L}
                UNION ALL SELECT nd, pos, r, 1, f1 FROM r{m}_{L})
          GROUP BY nd, f) c
    JOIN a{m}_{L} a USING (nd))
  WHERE lx[k] < lx[k+1])""")
        out.append(f"""p{m}_{L} AS MATERIALIZED (
  SELECT nd, f, CASE WHEN lx[k]/2 + lx[k+1]/2 < lx[k+1]
                     THEN lx[k]/2 + lx[k+1]/2 ELSE lx[k] END AS thr
  FROM (SELECT *, row_number() OVER (PARTITION BY nd ORDER BY gain DESC, f, k) AS rk
        FROM (SELECT *, sl*sl/k + (s-sl)*(s-sl)/(n-k) - s*s/n AS gain
              FROM (SELECT *, CAST(list_reduce(lr[1:k], (u,w) -> u + w) AS DOUBLE) AS sl
                    FROM g{m}_{L}))
        WHERE gain > CAST('1.0E-12' AS DOUBLE))
  WHERE rk = 1)""")
        out.append(f"""v{m}_{L} AS MATERIALIZED (SELECT a.nd, a.s / a.n AS v
  FROM a{m}_{L} a LEFT JOIN p{m}_{L} p USING (nd) WHERE p.nd IS NULL)""")
        out.append(f"""r{m}_{L + 1} AS MATERIALIZED (
  SELECT r.pos, r.f0, r.f1, r.r,
         2*r.nd + CASE WHEN (CASE p.f WHEN 0 THEN r.f0 ELSE r.f1 END) <= p.thr
                       THEN 0 ELSE 1 END AS nd
  FROM r{m}_{L} r JOIN p{m}_{L} p USING (nd))""")
    D = MAX_DEPTH
    out.append(f"""a{m}_{D} AS MATERIALIZED (SELECT nd, COUNT(*) AS n,
  CAST(list_reduce(list(r ORDER BY pos), (u,w) -> u + w) AS DOUBLE) AS s
  FROM r{m}_{D} GROUP BY nd)""")
    out.append(f"""v{m}_{D} AS MATERIALIZED (SELECT nd, s / n AS v FROM a{m}_{D})""")
    tp = "\n  UNION ALL ".join(
        f"SELECT r.pos, v.v FROM r{m}_{L} r JOIN v{m}_{L} v USING (nd)"
        for L in range(MAX_DEPTH + 1))
    out.append(f"""tp{m} AS MATERIALIZED (\n  {tp})""")
    out.append(f"""s{m} AS MATERIALIZED (
  SELECT t.pos, t.f0, t.f1, t.y, t.f + {dlit(LR)} * tp.v AS f
  FROM s{m - 1} t JOIN tp{m} tp USING (pos))""")
    return out


def grid_ctes(m):
    """Grid traversal of tree m: walk picks level by level, collect the
    leaf value, advance the running prediction (Model.predict order)."""
    out = []
    out.append(f"""q{m}_0 AS MATERIALIZED (SELECT gid, f0, f1, 1 AS nd, CAST(NULL AS DOUBLE) AS lv, p FROM q{m - 1})""")
    for L in range(MAX_DEPTH + 1):
        pj = (f"LEFT JOIN p{m}_{L} p ON g.nd = p.nd"
              if L < MAX_DEPTH else "LEFT JOIN (SELECT NULL::BIGINT AS nd, 0 AS f, 0.0 AS thr WHERE FALSE) p ON g.nd = p.nd")
        out.append(f"""q{m}_{L + 1} AS MATERIALIZED (
  SELECT g.gid, g.f0, g.f1,
         CASE WHEN g.lv IS NULL AND p.nd IS NOT NULL
              THEN 2*g.nd + CASE WHEN (CASE p.f WHEN 0 THEN g.f0 ELSE g.f1 END) <= p.thr
                                 THEN 0 ELSE 1 END
              ELSE g.nd END AS nd,
         COALESCE(g.lv, lv.v) AS lv, g.p
  FROM q{m}_{L} g
  {pj}
  LEFT JOIN v{m}_{L} lv ON g.nd = lv.nd AND g.lv IS NULL)""")
    D1 = MAX_DEPTH + 1
    out.append(f"""q{m} AS MATERIALIZED (SELECT gid, f0, f1, 1 AS nd, CAST(NULL AS DOUBLE) AS lv,
  p + {dlit(LR)} * lv AS p FROM q{m}_{D1})""")
    # q{m} shape matches q{m-1} consumption: (gid, f0, f1, p)
    return out


def build_sql(pro):
    ctes = [f"""pro AS MATERIALIZED (SELECT expid, scaleout, avglat, avgthr
  FROM ({pro}) WHERE isbckpres = 0)""",
            f"""md AS (SELECT GREATEST(1, COUNT(*) // {TRAIN_TARGET}) AS m FROM pro)""",
            f"""tr AS MATERIALIZED (SELECT row_number() OVER (ORDER BY scaleout, avgthr, avglat) AS pos,
  CAST(scaleout AS DOUBLE) AS f0, avgthr AS f1, avglat AS y
  FROM pro WHERE expid % (SELECT m FROM md) = 1 % (SELECT m FROM md))""",
            """i0 AS (SELECT CAST(list_reduce(list(y ORDER BY pos), (u,w) -> u + w) AS DOUBLE)
  / COUNT(*) AS iv FROM tr)""",
            """s0 AS MATERIALIZED (SELECT pos, f0, f1, y, (SELECT iv FROM i0) AS f FROM tr)"""]
    for m in range(1, MAX_TREES + 1):
        ctes.extend(stage_ctes(m))
    ctes.append("""grid AS MATERIALIZED (SELECT row_number() OVER (ORDER BY f0, avgthr) AS gid, f0, avgthr AS f1
  FROM (SELECT f0, UNNEST([lo, (lo + hi)/2, hi]) AS avgthr
        FROM (SELECT CAST(scaleout AS DOUBLE) AS f0, MIN(avgthr) AS lo, MAX(avgthr) AS hi
              FROM pro WHERE expid % (SELECT m FROM md) = 1 % (SELECT m FROM md)
              GROUP BY scaleout)))""")
    ctes.append("""q0 AS MATERIALIZED (SELECT gid, f0, f1, (SELECT iv FROM i0) AS p FROM grid)""")
    for m in range(1, MAX_TREES + 1):
        ctes.extend(grid_ctes(m))
    final = f"""SELECT f0 AS scaleout, ROUND(f1 + 1e-9, 4) AS avgthr,
  ROUND(p + 1e-9, 4) AS pred_latency FROM q{MAX_TREES}"""
    return "WITH " + ",\n".join(ctes) + "\n" + final


def main():
    sf = sys.argv[1]
    con = duckdb.connect()
    con.sql(f"create view orders as select * from read_parquet('{sf}/orders.parquet')")

    # ---- python expected
    pool = con.sql(f"SELECT expid, scaleout, avglat, avgthr FROM ({PRO}) WHERE isbckpres = 0")
    rows = pool.fetchall()
    n_pool = len(rows)
    mod = max(1, n_pool // TRAIN_TARGET)
    train = sorted([(float(r[1]), r[3], r[2]) for r in rows if r[0] % mod == 1 % mod])
    xs = [[r[0], r[1]] for r in train]
    ys = [r[2] for r in train]
    t0 = time.time()
    model = fit(xs, ys, MAX_TREES)
    print(f"python fit: {len(xs)} rows, {MAX_TREES} trees, {time.time() - t0:.2f}s")
    # grid
    gsrc = {}
    for r in rows:
        if r[0] % mod == 1 % mod:
            so = float(r[1])
            lo, hi = gsrc.get(so, (float("inf"), float("-inf")))
            gsrc[so] = (min(lo, r[3]), max(hi, r[3]))
    expected = []
    for so in sorted(gsrc):
        lo, hi = gsrc[so]
        for thr in (lo, (lo + hi) / 2, hi):
            expected.append((so, round_half_up4(thr + 1e-9),
                             round_half_up4(predict(model, [so, thr]) + 1e-9)))
    expected.sort()

    # ---- oracle
    sql = build_sql(PRO)
    print(f"oracle sql: {len(sql)} bytes, {sql.count(' AS ')} projections")
    if len(sys.argv) > 2 and sys.argv[2] == "--sql-only":
        print(sql[:3000])
        return
    t0 = time.time()
    got = sorted([(r[0], r[1], r[2]) for r in con.sql(sql).fetchall()])
    print(f"duckdb oracle: {time.time() - t0:.2f}s, {len(got)} rows")
    if got == expected:
        print("MATCH: oracle == python-replicated Spark semantics, bit-exact")
    else:
        print(f"MISMATCH: {len(expected)} expected vs {len(got)} got")
        for e, g in list(zip(expected, got))[:10]:
            if e != g:
                print("  exp", e, " got", g)


if __name__ == "__main__":
    main()
