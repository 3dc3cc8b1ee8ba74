package graft.models

/** Deterministic ISOLATION FOREST (Liu et al. 2008) over integer-quantized
  * vectors — the unsupervised outlier screen a pipeline runs over an
  * embedding table before indexing/training (corrupted decodes, adversarial
  * points, pipeline bugs all isolate in few random splits).
  *
  * Every "random" choice is an md5 draw keyed by (tree, node, purpose), so
  * the whole FIT is a pure function of the data — the same move that made
  * the hyperplane LSH planes and the GBT oracle replayable. Unlike the GBT
  * replay, no cross-row SUM exists anywhere: node statistics are min/max
  * (order-free in any engine), so the DuckDB oracle replays the fit with
  * plain windowed aggregates — no order-pinned folds needed.
  *
  * Fit, per tree t over its subsample: at node nd (path-integer ids — root
  * 1, children 2·nd / 2·nd+1) at depth d < maxDepth with ≥ 2 members:
  *   f   = draw(t, nd, 'f') % dim                 (split feature)
  *   cut = mn + ((mx − mn) · draw(t, nd, 'c')) div 1e6
  * over the node members' f-th component range [mn, mx]; members with
  * x_f ≤ cut go left. A node with one member, a constant feature
  * (mn = mx), or depth = maxDepth terminates. Deviation from the paper,
  * by design: the anomaly score is the RAW path-length sum over trees
  * (monotone-equivalent to 2^(−E[h]/c(ψ)) for ranking) — the published
  * normalization needs log/2^x, and transcendental-free integer scores are
  * what keep the oracle exact (the [[graft.pipeline.TextOps.dsirWeights]]
  * trade). Scoring follows fitted cuts only: a point reaching a node the
  * subsample never split stops there (no c(size) continuation — documented
  * monotone deviation, same for every point).
  */
object IsoLocal {

  val Trees = 8
  val MaxDepth = 8
  val Psi = 64
  val DrawMod = 1000000L

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 60-bit md5 draw in [0, 1e6) — the SQL spelling is
    * CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) % 1000000. */
  def draw(key: String): Long =
    java.lang.Long.parseLong(md5Hex(key).substring(0, 15), 16) % DrawMod

  /** (tree, node) → (feature, cut). Absence of a node = leaf. */
  type Cuts = Map[(Int, Long), (Int, Long)]

  /** Fit `Trees` trees; `samples(t)` is tree t's subsample (rows =
    * quantized vectors). Pure integer arithmetic throughout. */
  def fit(samples: Array[Array[Array[Long]]], dim: Int): Cuts = {
    val cuts = scala.collection.mutable.Map.empty[(Int, Long), (Int, Long)]
    def split(t: Int, nd: Long, depth: Int, members: Array[Array[Long]]): Unit = {
      if (depth >= MaxDepth || members.length <= 1) return
      val f = (draw(s"iso:$t:$nd:f") % dim).toInt
      var mn = Long.MaxValue; var mx = Long.MinValue
      members.foreach { v => val x = v(f); if (x < mn) mn = x; if (x > mx) mx = x }
      if (mn == mx) return
      val cut = mn + (mx - mn) * draw(s"iso:$t:$nd:c") / DrawMod
      cuts((t, nd)) = (f, cut)
      split(t, 2 * nd, depth + 1, members.filter(_(f) <= cut))
      split(t, 2 * nd + 1, depth + 1, members.filter(_(f) > cut))
    }
    samples.zipWithIndex.foreach { case (s, t) => split(t, 1L, 0, s) }
    cuts.toMap
  }

  /** Path length of `v` in tree t: follow fitted cuts until a node with
    * none. Bounded by MaxDepth because fitted cuts never exceed it. */
  def pathLength(cuts: Cuts, t: Int, v: Array[Long]): Int = {
    var nd = 1L; var depth = 0
    var c = cuts.get((t, nd))
    while (c.isDefined) {
      val (f, cut) = c.get
      nd = 2 * nd + (if (v(f) <= cut) 0 else 1)
      depth += 1
      c = cuts.get((t, nd))
    }
    depth
  }

  /** Anomaly score: total path length over all trees (SMALLER = more
    * anomalous). Exact integer. */
  def pathSum(cuts: Cuts, v: Array[Long]): Long =
    (0 until Trees).map(t => pathLength(cuts, t, v).toLong).sum
}
