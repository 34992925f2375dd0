package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor-Jaccard link prediction over an undirected graph,
  * with a SCALE-DISPATCHED default (the `Dedup.dedupe`/`components`
  * pattern): the engine measures the wedge mass Σ_w deg(w)² — the exact
  * enumeration's resource — with one scalar aggregation it needs anyway
  * (to size the pair shuffle), and routes:
  *
  *  - mass ≤ `wedgeMassLimit` → EXACT wedge enumeration (every
  *    distance-2 pair scored |N∩|/|N∪|; the q223 oracle-truth form,
  *    mass-sized pair shuffle, broadcast degree scoring);
  *  - mass > limit → MINHASHED NEIGHBORHOODS (the q231 form): 4×2
  *    minhash bands over each node's neighbor-id set, bucket-capped
  *    band self-join for candidates, exact Jaccard verified ONLY on
  *    candidates — work bounded by band-bucket caps instead of
  *    Σ deg(w)², the swap that survives a dense 100 TB graph
  *    (measured 2026-08 at 10× harness scale: 2.8× wall vs exact's
  *    18.2×). Semantics in this regime: top-k among banded candidates
  *    (the standard LSH trade — high-Jaccard pairs band together with
  *    high probability; hub-diluted low-similarity pairs may be
  *    missed).
  *
  * The limit defaults to 5×10⁸ (an 8 GB-executor exact run is measured
  * comfortable through ~3×10⁹ at 10× harness scale, so 5×10⁸ leaves 6×
  * headroom below the measured-safe ceiling while keeping every
  * harness-scale correctness run on the engine-exact branch) and is
  * overridable via conf `spark.graft.graph.wedgeMassLimit`.
  *
  * Input `und` must be the DOUBLED edge list (both (u,v) and (v,u) per
  * undirected edge, no self-loops, already distinct).
  */
object LinkPrediction {

  val defaultWedgeMassLimit: Long = 500000000L

  /** Top-`k` predicted links (u, v, cmn, jaccard) ordered by
    * (jaccard desc, u, v). On the exact branch `degCap` drops hub
    * WITNESSES (deg > cap) before the wedge join — a hub contributes
    * deg² wedges and near-zero Jaccard signal (the jaccardPairs df-cap
    * discipline); the minhash branch needs no witness cap because the
    * band-bucket cap bounds candidate mass directly (q231 parity:
    * signatures cover the FULL neighbor set).
    */
  def topK(und: DataFrame, k: Int, degCap: Int = 512,
      wedgeMassLimit: Long = -1L): DataFrame = {
    val s = und.sparkSession
    val limit =
      if (wedgeMassLimit >= 0) wedgeMassLimit
      else s.conf.get("spark.graft.graph.wedgeMassLimit",
        defaultWedgeMassLimit.toString).toLong
    val u = und.localCheckpoint() // deg + both branches read it
    val deg = u.groupBy(col("u").as("n")).agg(count(lit(1)).as("dg"))
    val mass = Option(
      deg.filter(col("dg") <= degCap)
        .agg(sum(col("dg") * col("dg"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (mass <= limit) exactTopK(u, deg, mass, k, degCap)
    else minhashTopK(u, k, degCap)
  }

  /** Exact branch: wedge enumeration with a mass-sized pair shuffle
    * (pairs ≈ wedges/1.5 and partial aggregation cannot compress a
    * low-multiplicity pair stream — a fixed 32-partition agg would put
    * pairs/32 entries in one hash map and OOM; ~1.5M pairs/task is the
    * spill-safe shape) and broadcast degree scoring (zero shuffles over
    * the pair stream after the agg).
    */
  private def exactTopK(und: DataFrame, deg: DataFrame, mass: Long,
      k: Int, degCap: Int): DataFrame = {
    val okWitness = deg.filter(col("dg") <= degCap).select(col("n").as("v"))
    val nPart = math.max(32L, math.min(2048L, mass / 4500000L)).toInt
    val undW = und.join(okWitness, "v")
    val wedges = undW.as("x").join(undW.as("y"),
      col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .select(col("x.u").as("pu"), col("y.u").as("pv"))
    val common = wedges.repartition(nPart, col("pu"), col("pv"))
      .groupBy("pu", "pv")
      .agg(count(lit(1)).as("cmn"))
    common
      .join(broadcast(deg.select(col("n").as("pu"), col("dg").as("du"))), "pu")
      .join(broadcast(deg.select(col("n").as("pv"), col("dg").as("dv"))), "pv")
      .select(col("pu").as("u"), col("pv").as("v"), col("cmn"),
        round(col("cmn").cast("double") /
          (col("du") + col("dv") - col("cmn")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
      .limit(k)
  }

  /** Minhash branch: neighbor-set signatures through the band join
    * (q46 machinery, bucket-capped), exact verify on candidates only.
    */
  private def minhashTopK(und: DataFrame, k: Int, degCap: Int): DataFrame = {
    val adj = und.groupBy("u")
      .agg(collect_set("v").as("nbrs"))
      .withColumn("__nh",
        expr(s"transform(nbrs, x -> ${TextOps.hash60Spark("cast(x as string)")})"))
      .localCheckpoint()
    val bands = adj.select(
      (col("u") +:
        (0 until 4).map(b =>
          expr(TextOps.bandSpark(b, 2, "__nh")).as(s"band$b"))): _*)
    val cand = Dedup.minhashCandidatePairs(bands, "u", maxBucket = 32)
    cand
      .join(adj.select(col("u").as("u_a"), col("nbrs").as("na")), "u_a")
      .join(adj.select(col("u").as("u_b"), col("nbrs").as("nb")), "u_b")
      .select(col("u_a").as("u"), col("u_b").as("v"),
        expr("cast(size(array_intersect(na, nb)) as bigint)").as("cmn"),
        expr("size(na)").as("du"), expr("size(nb)").as("dv"))
      .select(col("u"), col("v"), col("cmn"),
        round(col("cmn").cast("double") /
          (col("du") + col("dv") - col("cmn")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
      .limit(k)
  }
}
