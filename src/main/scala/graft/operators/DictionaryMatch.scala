package graft.operators

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher: one automaton pass counts ALL
  * occurrences of every dictionary term (including terms nested inside
  * other terms, via merged suffix-link outputs) in a single scan of the
  * text — the scale answer to "grep a 10k-term lexicon over 100 TB of
  * documents", where the naive plan is k full scans (one
  * `instr`/`replace` pass per term) and the automaton plan is ONE scan
  * whose cost is independent of k.
  *
  * The automaton is built once on the driver (size O(Σ|term|), a few
  * KB for realistic lexicons) and shipped to executors inside the
  * task closure — the broadcast-small-dimension pattern applied to a
  * state machine instead of a hash table.
  *
  * Determinism: pure integer counting over the text; no floats, no
  * ordering sensitivity (per-doc counts are summed with a commutative
  * reduce).
  */
final class AhoCorasick(val terms: IndexedSeq[String]) extends Serializable {
  require(terms.nonEmpty && terms.forall(_.nonEmpty))

  // trie: goto maps per node, built densely then frozen to arrays.
  private val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val outTerm = mutable.ArrayBuffer(-1) // node -> term idx or -1
  terms.zipWithIndex.foreach { case (t, i) =>
    var n = 0
    t.foreach { c =>
      n = gotoMaps(n).getOrElseUpdate(c, {
        gotoMaps += mutable.Map.empty[Char, Int]
        outTerm += -1
        gotoMaps.size - 1
      })
    }
    outTerm(n) = i
  }

  private val size = gotoMaps.size
  private val fail = new Array[Int](size)
  // merged outputs: for each node, the term indices matched when the
  // scan reaches it (its own output plus every suffix-link output) —
  // precomputed so the hot loop never walks the fail chain.
  private val outs: Array[Array[Int]] = {
    val res = new Array[Array[Int]](size)
    val queue = mutable.Queue.empty[Int]
    res(0) = Array.empty
    gotoMaps(0).valuesIterator.foreach { v =>
      fail(v) = 0
      res(v) = if (outTerm(v) >= 0) Array(outTerm(v)) else Array.empty
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = gotoMaps(f).getOrElse(c, 0) match {
          case `v` => 0 // the root child itself
          case w => w
        }
        res(v) =
          if (outTerm(v) >= 0) outTerm(v) +: res(fail(v)) else res(fail(v))
        queue += v
      }
    }
    res
  }
  private val gotoFrozen: Array[Map[Char, Int]] =
    gotoMaps.map(_.toMap).toArray

  /** Occurrence count per term over one text (all positions, nested
    * matches included). Allocation-free except the result array.
    */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](terms.size)
    var n = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (n != 0 && !gotoFrozen(n).contains(c)) n = fail(n)
      n = gotoFrozen(n).getOrElse(c, 0)
      val os = outs(n)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}
