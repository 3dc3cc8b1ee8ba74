package graft.models

/** Non-negative least squares via the Lawson–Hanson active-set method,
  * for small problems (the TWRES MST fit is 4-dimensional, reference
  * baselines/models.py:29 `scipy.optimize.nnls`). Plain Scala — runs on
  * the driver over a handful of aggregated training points.
  */
object Nnls {

  /** Solve min ‖Ax − b‖₂ s.t. x ≥ 0. `a` is row-major (m×n), n small. */
  def solve(a: Array[Array[Double]], b: Array[Double], maxIter: Int = 200): Array[Double] = {
    val m = a.length
    val n = a(0).length
    val passive = Array.fill(n)(false)
    val x = Array.fill(n)(0.0)

    def residual(): Array[Double] = {
      val r = new Array[Double](m)
      var i = 0
      while (i < m) {
        var s = b(i); var j = 0
        while (j < n) { s -= a(i)(j) * x(j); j += 1 }
        r(i) = s; i += 1
      }
      r
    }
    def gradient(r: Array[Double]): Array[Double] =
      (0 until n).map(j => (0 until m).map(i => a(i)(j) * r(i)).sum).toArray

    /** Unconstrained LS on the passive set via normal equations. */
    def lsPassive(): Array[Double] = {
      val idx = (0 until n).filter(passive).toArray
      val k = idx.length
      if (k == 0) return Array.fill(n)(0.0)
      val ata = Array.tabulate(k, k)((p, q) =>
        (0 until m).map(i => a(i)(idx(p)) * a(i)(idx(q))).sum)
      val atb = Array.tabulate(k)(p => (0 until m).map(i => a(i)(idx(p)) * b(i)).sum)
      // Gaussian elimination with partial pivoting
      val mm = Array.tabulate(k, k + 1)((p, q) => if (q < k) ata(p)(q) else atb(p))
      for (c <- 0 until k) {
        val piv = (c until k).maxBy(r => math.abs(mm(r)(c)))
        val t = mm(c); mm(c) = mm(piv); mm(piv) = t
        val d = mm(c)(c)
        for (q <- c to k) mm(c)(q) /= d
        for (r <- 0 until k if r != c) {
          val f = mm(r)(c)
          for (q <- c to k) mm(r)(q) -= f * mm(c)(q)
        }
      }
      val out = Array.fill(n)(0.0)
      idx.zipWithIndex.foreach { case (j, p) => out(j) = mm(p)(k) }
      out
    }

    var iter = 0
    val eps = 1e-11
    while (iter < maxIter) {
      val w = gradient(residual())
      val cand = (0 until n).filter(j => !passive(j) && w(j) > eps)
      if (cand.isEmpty) return x
      passive(cand.maxBy(w)) = true
      var z = lsPassive()
      // inner loop: back off along (x → z) until z feasible on passive set
      while ((0 until n).exists(j => passive(j) && z(j) <= 0)) {
        val alpha = (0 until n)
          .filter(j => passive(j) && z(j) <= 0)
          .map(j => x(j) / (x(j) - z(j))).min
        for (j <- 0 until n if passive(j)) x(j) = x(j) + alpha * (z(j) - x(j))
        for (j <- 0 until n if passive(j) && x(j) <= eps) { passive(j) = false; x(j) = 0.0 }
        z = lsPassive()
      }
      for (j <- 0 until n) x(j) = if (passive(j)) z(j) else 0.0
      iter += 1
    }
    x
  }
}
