package graft.operators

/** Embedding-vector expressions over `array<float>`/`array<double>`
  * columns: dot product, L2 norm, cosine similarity — all per-row
  * higher-order-function folds (codegen'd, no UDF, no shuffle).
  *
  * Vectors must be cast to array<double> upstream: float→double keeps the
  * folds bit-identical with the DuckDB oracle (both engines then fold
  * doubles in list order).
  */
object VectorOps {
  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  def norm2Spark(a: String): String =
    s"sqrt(aggregate($a, 0D, (acc, v) -> acc + v * v))"

  def cosineSpark(a: String, b: String): String =
    s"(${dotSpark(a, b)} / nullif(${norm2Spark(a)} * ${norm2Spark(b)}, 0D))"

  def dotDuck(a: String, b: String): String = s"list_dot_product($a, $b)"

  def cosineDuck(a: String, b: String): String =
    s"(list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)), 0))"

  /** Deterministic random-hyperplane LSH bucket id over `dim`-dimensional
    * vectors with `planes` hyperplanes: plane p's component d is a
    * pseudo-random value in [-0.5, 0.5) derived from md5(p,d) — fully
    * deterministic, no RNG state, identical across runs and engines.
    * Bucket = integer whose bit p is sign(v · plane_p).
    */
  def lshBucketDuck(vec: String, dim: Int, planes: Int, offset: Int = 0): String = {
    val terms = (0 until planes).map { p0 =>
      val p = p0 + offset
      val dot =
        s"""list_sum(list_transform(range(0, $dim),
           | d -> $vec[d + 1] * (((${TextOps.hash60Duck(s"'$p:' || d::VARCHAR")} % 1000003) / 1000003.0) - 0.5)))""".stripMargin
      s"(CASE WHEN $dot > 0 THEN 1::BIGINT ELSE 0::BIGINT END << $p0)"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Micro-unit integer vector: round(x·10⁶) per component as BIGINT —
    * the exact-arithmetic representation shared with DeterministicKMeans
    * (no float lands on a 6-dp midpoint, so the scaling is unambiguous).
    */
  def microVecSpark(vec: String): String =
    s"transform($vec, x -> cast(round(cast(x as double) * 1000000, 0) as bigint))"

  /** Symmetric int8 quantization codes of a micro-unit vector `v6` with
    * scale denominator `m` (= max |component|, >= 1): each code is the
    * half-up rounding of x·127/m, computed entirely in 64-bit integer
    * math via the sign-split identity halfUp(s/n) = sign(s)·((2|s|+n)
    * div (2n)) — bit-identical on any engine. Codes lie in [-127, 127].
    */
  def int8CodesSpark(v6: String, m: String): String =
    s"""transform($v6, x -> CASE WHEN x < 0
       |  THEN -((2 * (-x) * 127 + $m) div (2 * $m))
       |  ELSE (2 * x * 127 + $m) div (2 * $m) END)""".stripMargin

  /** DuckDB mirror of int8CodesSpark over a scalar component `x6`. */
  def int8CodeDuck(x6: String, m: String): String =
    s"""CASE WHEN $x6 < 0
       |  THEN -((2 * (-($x6)) * 127 + $m) // (2 * $m))
       |  ELSE (2 * ($x6) * 127 + $m) // (2 * $m) END""".stripMargin

  def lshBucketSpark(vec: String, dim: Int, planes: Int, offset: Int = 0): String = {
    val terms = (0 until planes).map { p0 =>
      val p = p0 + offset
      // component d of plane p: (hash60("p:d") % 1000003) / 1000003.0 - 0.5
      val dot =
        s"""aggregate(zip_with($vec, transform(sequence(0, ${dim - 1}),
           | d -> (pmod(${TextOps.hash60Spark(s"concat('$p:', cast(d as string))")}, 1000003) / 1000003.0D) - 0.5D),
           | (x, y) -> x * y), 0D, (acc, v) -> acc + v)""".stripMargin
      s"shiftleft(CASE WHEN $dot > 0 THEN cast(1 as bigint) ELSE cast(0 as bigint) END, $p0)"
    }
    terms.mkString("(", " + ", ")")
  }
}
