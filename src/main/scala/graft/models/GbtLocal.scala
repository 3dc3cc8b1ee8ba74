package graft.models

/** M3's gradient-boosted regression trees, fit IN THE DRIVER.
  *
  * The reference fits sklearn's GradientBoostingRegressor in-process on
  * the profiles table (reference analytics/app/latency/models.py:28-54) —
  * a table that holds one row per completed profiling run, i.e. dozens of
  * rows by construction. Fitting that with MLlib's distributed GBT costs
  * hundreds of scheduler round-trips (each boosting iteration is several
  * Spark jobs over an 80-row partition: 16-22 s at any SF), while the fit
  * itself is microseconds of arithmetic. The scale-correct split is the
  * one the reference itself uses: fit the tiny model single-node, then
  * score the (arbitrarily large) prediction grid distributively with the
  * broadcast model. [[LatencyGbt]] keeps the MLlib pipeline form for
  * users who want a cluster-fit model on genuinely large training data.
  *
  * Semantics match the reference configuration: squared loss, learning
  * rate 0.1, max_depth 10, n_estimators = 3·n capped (LatencyGbt.numTrees),
  * min_samples_split 2, min_samples_leaf 1, exact greedy splits at
  * midpoints of consecutive distinct feature values, variance-reduction
  * criterion. Fully deterministic: ties between equal-gain splits resolve
  * to the lowest (feature, threshold), and all sums are sequential over
  * the row order given.
  *
  * Feature scaling is deliberately absent: tree splits are invariant
  * under any monotone per-feature transform, so the reference's
  * StandardScaler stage cannot change predictions — only thresholds'
  * units.
  */
object GbtLocal {

  /** The reference's max_depth (analytics/app/latency/models.py:28-54)
    * — shared by [[fit]]'s default and the recursive DuckDB oracle's
    * per-tree iteration stride (maxDepth split levels + 1 boundary), so
    * a depth change cannot silently desync the replay. */
  val DefaultMaxDepth = 10

  /** Binary tree node; `feat < 0` marks a leaf carrying `value`. */
  final case class Node(feat: Int, thr: Double, value: Double,
                        left: Node, right: Node) extends Serializable {
    def isLeaf: Boolean = feat < 0
  }

  final case class Model(init: Double, lr: Double, trees: Array[Node])
      extends Serializable {
    def predict(x: Array[Double]): Double = {
      var s = init
      var i = 0
      while (i < trees.length) { s += lr * evalTree(trees(i), x); i += 1 }
      s
    }
  }

  private def evalTree(root: Node, x: Array[Double]): Double = {
    var cur = root
    while (!cur.isLeaf) cur = if (x(cur.feat) <= cur.thr) cur.left else cur.right
    cur.value
  }

  /** One CART regression tree over rows `idx` of (xs, target). Gain is the
    * SSE decrease in sum-form (the shared squared term cancels):
    * sl²/nl + sr²/nr − s²/n. */
  private def fitTree(xs: Array[Array[Double]], target: Array[Double],
                      idx: Array[Int], depth: Int, maxDepth: Int): Node = {
    val n = idx.length
    var s = 0.0
    var i = 0
    while (i < n) { s += target(idx(i)); i += 1 }
    val mean = s / n
    if (depth >= maxDepth || n < 2) return Node(-1, 0.0, mean, null, null)

    val nFeat = xs(idx(0)).length
    var bestGain = 1e-12 // below this the node is pure: stop
    var bestFeat = -1
    var bestThr = 0.0
    var f = 0
    while (f < nFeat) {
      val ord = idx.sortBy(j => (xs(j)(f), j)) // stable + deterministic
      var sl = 0.0
      var k = 0
      while (k < n - 1) {
        sl += target(ord(k))
        val a = xs(ord(k))(f)
        val b = xs(ord(k + 1))(f)
        if (a < b) {
          val nl = k + 1
          val gain = sl * sl / nl + (s - sl) * (s - sl) / (n - nl) - s * s / n
          if (gain > bestGain) {
            // a/2 + b/2 can round UP to exactly b for adjacent doubles,
            // which would empty the right side (x > thr) and mean-of-zero
            // NaN-poison the tree; splitting at a keeps both sides
            // non-empty (x <= a vs x > a) with identical membership.
            val mid = a / 2 + b / 2
            bestGain = gain; bestFeat = f; bestThr = if (mid < b) mid else a
          }
        }
        k += 1
      }
      f += 1
    }
    if (bestFeat < 0) return Node(-1, 0.0, mean, null, null)
    val lIdx = idx.filter(j => xs(j)(bestFeat) <= bestThr)
    val rIdx = idx.filter(j => xs(j)(bestFeat) > bestThr)
    Node(bestFeat, bestThr, mean,
      fitTree(xs, target, lIdx, depth + 1, maxDepth),
      fitTree(xs, target, rIdx, depth + 1, maxDepth))
  }

  /** Double literal that stays a DOUBLE in any ANSI engine: bare decimal
    * literals parse as DECIMAL in both Spark and DuckDB (poisoning the
    * whole expression into decimal arithmetic), so literals go through a
    * string cast — Java's shortest round-trip `Double.toString` plus a
    * correctly-rounding parse reproduces the identical bits. */
  private def dlit(v: Double): String = s"CAST('${v.toString}' AS DOUBLE)"

  /** Render one tree as a nested ANSI `CASE WHEN` scalar expression over
    * the given feature column expressions. */
  def treeSql(n: Node, feat: Seq[String]): String =
    if (n.isLeaf) dlit(n.value)
    else s"(CASE WHEN ${feat(n.feat)} <= ${dlit(n.thr)} " +
      s"THEN ${treeSql(n.left, feat)} ELSE ${treeSql(n.right, feat)} END)"

  /** The whole ensemble as one scalar SQL expression. Terms are summed
    * left-to-right in stage order — the same association order as
    * [[Model.predict]]'s loop — so double arithmetic matches exactly. */
  def modelSql(m: Model, feat: Seq[String]): String =
    (dlit(m.init) +:
      m.trees.map(t => s"${dlit(m.lr)} * ${treeSql(t, feat)}").toSeq)
      .mkString(" + ")

  /** Boosted fit: F0 = mean(y); each stage fits a tree to the current
    * residuals and advances F by lr·tree (squared loss ⇒ the gradient IS
    * the residual, and leaf means are the exact line-search optimum). */
  def fit(xs: Array[Array[Double]], y: Array[Double], nTrees: Int,
          maxDepth: Int = DefaultMaxDepth, lr: Double = 0.1): Model = {
    require(xs.nonEmpty && xs.length == y.length, "non-empty, aligned train set")
    val n = y.length
    val init = { var s = 0.0; var i = 0; while (i < n) { s += y(i); i += 1 }; s / n }
    val f = Array.fill(n)(init)
    val residual = new Array[Double](n)
    val all = Array.range(0, n)
    val trees = new Array[Node](nTrees)
    var m = 0
    while (m < nTrees) {
      var i = 0
      while (i < n) { residual(i) = y(i) - f(i); i += 1 }
      val t = fitTree(xs, residual, all, 0, maxDepth)
      i = 0
      while (i < n) { f(i) += lr * evalTree(t, xs(i)); i += 1 }
      trees(m) = t
      m += 1
    }
    Model(init, lr, trees)
  }
}
