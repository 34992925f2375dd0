package graft.operators

/** Closed-form evaluation of ARITHMETIC key-hierarchy recursions.
  *
  * q200 (`parent(k) = k div 10`) and q426 (`parent(k) = k div 4`,
  * per-edge multiplicity `node % 3 + 1`) declare their walks as Spark 4
  * recursive CTEs — the surface a migrating user writes. But when the
  * parent function is pure arithmetic, a row's ENTIRE ancestor path is
  * a function of the row itself: depth is the base-B digit count minus
  * one, the root is the leading base-B digit, and a multiplicative path
  * weight is a product of at most 62/log2(B) codegen'd CASE factors.
  * That turns an O(depth)-round UnionLoop (one shuffle + plan round per
  * level) into ONE scan feeding ONE aggregation — the plan a 100 TB
  * input wants, with no iteration state at all.
  *
  * All three builders emit literal comparison/`div` SQL expression
  * trees (the EquiDepthBins.searchCountExpr discipline — an interpreted
  * `aggregate` lambda fold is ~40× slower than a codegen'd CASE tree).
  * Arithmetic is exact integer `div`/`%` on BIGINT, so the closed form
  * is bit-identical to the recursion on every input; KeyHierarchySpec
  * proves equality against an independent JVM walk and against the
  * recursive branch itself.
  */
object KeyHierarchy {

  /** base^0, base^1, … while they fit in a Long (base ≥ 2). */
  def powers(base: Long): Seq[Long] = {
    require(base >= 2L, s"base must be >= 2, got $base")
    Iterator
      .iterate(BigInt(1))(_ * base)
      .takeWhile(_ <= Long.MaxValue)
      .map(_.toLong)
      .toSeq
  }

  /** Binary CASE tree over `bounds` (ascending): returns leaf(i) where
    * i = number of bounds <= k (so i == 0 below the first bound and
    * bounds.length at/above the last). Depth of the tree is
    * log2(bounds), the same shape searchCountExpr emits.
    */
  private def tree(k: String, bounds: Seq[Long], leaf: Int => String): String = {
    def t(lo: Int, hi: Int): String =
      if (lo == hi) leaf(lo)
      else {
        val mid = (lo + hi) / 2
        s"(CASE WHEN $k < ${bounds(mid)}L THEN ${t(lo, mid)} ELSE ${t(mid + 1, hi)} END)"
      }
    t(0, bounds.length)
  }

  /** depth(k) = number of `div base` steps until the value drops below
    * base — the base-B digit count minus one. Defined for k >= 0.
    */
  def depthSql(k: String, base: Long): String =
    tree(k, powers(base).drop(1), i => i.toString)

  /** root(k) = k div base^depth(k) — the leading base-B digit (k itself
    * when k < base). Defined for k >= 0.
    */
  def rootSql(k: String, base: Long): String = {
    val ps = powers(base)
    tree(k, ps.drop(1), i => if (i == 0) s"($k)" else s"(($k) div ${ps(i)}L)")
  }

  /** Product of `factor(node)` over every non-terminal path node
    * node_i = k div base^i (i = 0 .. depth-1, each >= base); the
    * terminal root contributes nothing. `factor` receives the node's
    * SQL and must return an integer-typed SQL expression. Emitted as a
    * flat chain of <= powers(base).size-1 CASE factors — each factor is
    * 1 exactly when the path has already terminated, so the chain is
    * correct for every depth without branching on depth itself.
    *
    * OVERFLOW PRECONDITION: the product runs in BIGINT, so the caller
    * must ensure max|factor|^(path length) fits 63 bits — path length
    * is floor(log_base(k)), so the bound is
    * log2(maxFactor) * log_base(Long.MaxValue) < 63. q426 (base 4,
    * factor <= 3, <= 31 factors) peaks at 3^31 ~ 6.2e14 — safe by 16
    * bits; a factor of 5+ at base 2 would NOT be. Spark wraps BIGINT
    * multiplies silently outside ANSI mode — there is no runtime net.
    */
  def pathProductSql(k: String, base: Long, factor: String => String): String = {
    val ps = powers(base)
    val terms = (0 until ps.size - 1).map { i =>
      val node = if (i == 0) s"($k)" else s"(($k) div ${ps(i)}L)"
      s"(CASE WHEN $k >= ${ps(i + 1)}L THEN CAST(${factor(node)} AS BIGINT) ELSE 1L END)"
    }
    terms.mkString("(", " * ", ")")
  }
}
