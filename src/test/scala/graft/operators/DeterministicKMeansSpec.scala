package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DeterministicKMeans: clustering quality on planted blobs, exact
  * partition-invariance (the property that makes it oracle-checkable),
  * and output invariants.
  */
class DeterministicKMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 8-dim blobs, 40 points each, deterministic jitter
  private lazy val blobs = (0 until 80).map { i =>
    val center = if (i < 40) 1.0f else -1.0f
    val v = (0 until 8).map(d => center + 0.01f * ((i * 7 + d * 3) % 5)).toArray
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("planted blobs split perfectly at k=2") {
    val out = DeterministicKMeans.clusterSizes(blobs, "vec_id", "embedding", k = 2, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(_._2).sorted.toSeq === Seq(40L, 40L))
    // membership check via id_sum: ids 0..39 sum to 780, 40..79 to 2380
    assert(out.map(_._3).sorted.toSeq === Seq(780L, 2380L))
  }

  test("bit-identical result under different partitioning") {
    val a = DeterministicKMeans.clusterSizes(blobs.repartition(1), "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = DeterministicKMeans.clusterSizes(blobs.repartition(7, col("vec_id")), "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("assignments agree with clusterSizes") {
    val asg = DeterministicKMeans.assignments(blobs, "vec_id", "embedding", k = 4, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(asg.length === 80)
    val fromAsg = asg.groupBy(_._2).map { case (c, xs) =>
      (c, xs.length.toLong, xs.map(_._1).sum)
    }.toSet
    val sizes = DeterministicKMeans.clusterSizes(blobs, "vec_id", "embedding", k = 4, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromAsg === sizes)
  }

  test("clusters partition the input: sizes sum to N, ids to ΣN") {
    val out = DeterministicKMeans.clusterSizes(blobs, "vec_id", "embedding", k = 8, iters = 5)
      .collect()
    assert(out.map(_.getLong(1)).sum === 80L)
    assert(out.map(_.getLong(2)).sum === (0L until 80L).sum)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }
}
