package graft

/** graft.Stage.key — the staleness-proof staging key:
  *  - stable for unchanged content;
  *  - CHANGES when a source file is rewritten in place (size or mtime);
  *  - distinct for distinct dataset dirs even with equal content
  *    (the full path is folded in, not its 32-bit hashCode).
  */
class StageKeySpec extends SparkSpec {

  private def mkData(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_stagekey_$tag")
    val t = d.resolve("orders.parquet")
    java.nio.file.Files.write(t, Array[Byte](1, 2, 3))
    d
  }

  test("stable for unchanged content; sensitive to in-place rewrite") {
    val d = mkData("a")
    val k1 = Stage.key(d.toString, "orders")
    val k2 = Stage.key(d.toString, "orders")
    assert(k1 === k2, "same content must key identically")
    assert(k1.length === 16)
    // rewrite in place with different size
    java.nio.file.Files.write(d.resolve("orders.parquet"),
      Array[Byte](1, 2, 3, 4))
    val k3 = Stage.key(d.toString, "orders")
    assert(k3 !== k1, "a regenerated source must get a fresh key")
  }

  test("distinct dirs never collide, even with identical content") {
    val d1 = mkData("b")
    val d2 = mkData("c")
    // align mtimes so only the path differs
    val t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    java.nio.file.Files.setLastModifiedTime(d1.resolve("orders.parquet"), t)
    java.nio.file.Files.setLastModifiedTime(d2.resolve("orders.parquet"), t)
    assert(Stage.key(d1.toString, "orders") !== Stage.key(d2.toString, "orders"))
  }

  test("sweepSiblings liveness reads the DEEPEST mtime, not the top dir's") {
    // a directory's own mtime only moves when its direct entries change
    // — a writer streaming into a nested table subdir for >30 min looks
    // stale from the top. The sweep must treat any recently-touched
    // file anywhere in the tree as liveness (round-12 advisory).
    import java.nio.file.{Files, Paths}
    val parent = Files.createTempDirectory("graft_sweep")
    def mk(name: String, deepTouchMs: Long): java.nio.file.Path = {
      val d = parent.resolve(name)
      Files.createDirectories(d.resolve("t.parquet"))
      Files.write(d.resolve("t.parquet").resolve("part-0"), Array[Byte](1))
      Files.write(d.resolve("_STAGED"), Array[Byte](0))
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3L * 3600 * 1000)
      // age EVERYTHING, then touch only the nested part file as asked
      Seq(d, d.resolve("_STAGED"), d.resolve("t.parquet"),
        d.resolve("t.parquet").resolve("part-0"))
        .foreach(p => Files.setLastModifiedTime(p, old))
      Files.setLastModifiedTime(d.resolve("t.parquet").resolve("part-0"),
        java.nio.file.attribute.FileTime.fromMillis(deepTouchMs))
      d
    }
    val now = System.currentTimeMillis()
    val live = mk("graft_sw_live", now)            // nested write 0 min ago
    val stale = mk("graft_sw_stale", now - 3L * 3600 * 1000)
    Stage.sweepSiblings(parent.toString, "graft_sw_", "graft_sw_keepme")
    assert(Files.exists(live), "deep-touched sibling must survive the sweep")
    assert(!Files.exists(stale), "genuinely stale sibling must be swept")
  }

  test("directory-shaped tables fingerprint every part file") {
    val d = java.nio.file.Files.createTempDirectory("graft_stagekey_dir")
    val t = d.resolve("orders.parquet")
    java.nio.file.Files.createDirectories(t)
    java.nio.file.Files.write(t.resolve("part-0"), Array[Byte](1))
    java.nio.file.Files.write(t.resolve("part-1"), Array[Byte](2))
    val k1 = Stage.key(d.toString, "orders")
    java.nio.file.Files.write(t.resolve("part-1"), Array[Byte](2, 2))
    assert(Stage.key(d.toString, "orders") !== k1)
  }
}
