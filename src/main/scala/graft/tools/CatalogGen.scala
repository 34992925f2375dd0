package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Generate `CATALOG.md` — the per-query index (name → defining
  * file:line → oracle type → measured 10× ratio) — FROM the
  * `SparkEntry.queries` registry instead of hand-maintaining it
  * (round-7 verdict item 8: SURVEY §8 / README / registry drift).
  *
  * Sources of truth:
  *   - the registry itself (names, declaration order, oracle presence);
  *   - the source tree (defining file:line, located by the unique
  *     `"<name>"` literal of each QueryDef);
  *   - the newest `SCALE_r*.md` ratio table(s): for each query the most
  *    recently measured 10× ratio wins; unmeasured queries show `—`
  *    (roster exclusions are deliberate and documented there).
  *
  * Oracle type classification:
  *   - `hash`     — full DuckDB value-hash compare;
  *   - `contract` — sketch/approx accuracy contract (exact witnesses +
  *     pinned-TRUE bound flags, the q32/q134 discipline);
  *   - `rows`     — no SQL-expressible oracle; driver records the
  *     weaker rows-only check.
  *
  *   runMain graft.tools.CatalogGen [repoRoot]
  */
object CatalogGen {
  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse("."))
    val srcRoot = root.resolve("src/main/scala/graft")

    // file -> lines, for every query/extension source file
    val files: Seq[(Path, Array[String])] = {
      val st = Files.walk(srcRoot) // close the stream (the Stage.key fd lesson)
      try st.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .map(p => p -> new String(Files.readAllBytes(p), "UTF-8").split("\n", -1))
        .toSeq
      finally st.close()
    }

    def defSite(name: String): String = {
      val lit = "\"" + name + "\""
      val hits = for {
        (p, lines) <- files
        (l, i) <- lines.zipWithIndex if l.contains(lit)
      } yield (root.relativize(p).toString, i + 1, l)
      // the DEFINING site is the QueryDef literal in a queries/ file
      // (oracle-reuse references like Training25.oracleOf exist too);
      // first match in a queries/ file in wave order = the declaration.
      hits.find(h => h._1.contains("/queries/"))
        .orElse(hits.headOption)
        .map(h => s"${h._1}:${h._2}")
        .getOrElse("?")
    }

    // newest-round-wins 10x ratios from the SCALE_r*.md tables
    // name cell may carry an annotation — "q143_triangle_count
    // (dispatched)" — so match anything up to the cell boundary
    // (SCALE_r09's dispatch rows were silently skipped by the strict
    // form and the catalog kept stale r7/r8 exact-form ratios)
    val ratioRe = """\|\s*(q\w+)[^|]*\|\s*[\d.]+\s*\|\s*[\d.]+\s*\|\s*([\d.]+)\s*\|""".r
    val scaleFiles = {
      val st = Files.list(root)
      // sort by the extracted ROUND NUMBER, not the file name:
      // lexicographic order would put SCALE_r100.md before SCALE_r11.md
      // and let every older round override the newest measurements
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.matches("SCALE_r\\d+\\.md"))
        .toSeq.sortBy(p =>
          p.getFileName.toString.stripPrefix("SCALE_r").stripSuffix(".md").toInt)
      finally st.close()
    }
    val ratios = scaleFiles.foldLeft(Map.empty[String, String]) { (acc, p) =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      // within one round's file the FIRST occurrence wins: isolated
      // measurements are listed before the (pollution-inflated) full
      // sweep and are the authoritative figures
      val fileFirst = ratioRe.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2)).toSeq
        .groupBy(_._1).view.mapValues(_.head._2).toMap
      acc ++ fileFirst
    }
    // [^|]* after the name: annotation-tolerant like ratioRe above
    // ("wafer_pipeline (10× = 639k rows)" is the newest isolated row)
    val extraRe = """\|\s*(wafer_pipeline|snapshot_read\w*)[^|]*\|\s*[\d.]+\s*\|\s*[\d.]+\s*\|\s*([\d.]+)\s*\|""".r
    val extraRatios = scaleFiles.foldLeft(Map.empty[String, String]) { (acc, p) =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      // same first-occurrence-in-file rule as the query ratios above:
      // isolated re-measures precede the pollution-inflated sweep rows
      acc ++ extraRe.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2)).toSeq
        .groupBy(_._1).view.mapValues(_.head._2).toMap
    }

    val defs = graft.SparkEntry.allDefs
    val rows = defs.map { q =>
      val otype = q.oracle match {
        case None => "rows"
        case Some(sql) if sql.contains("TRUE AS") => "contract"
        case Some(_) => "hash"
      }
      val ratio = ratios.getOrElse(q.name, "—")
      s"| ${q.name} | ${defSite(q.name)} | $otype | $ratio |"
    }

    val counts = defs.groupBy(q => q.oracle match {
      case None => "rows"
      case Some(sql) if sql.contains("TRUE AS") => "contract"
      case Some(_) => "hash"
    }).view.mapValues(_.size).toMap
    val measured = defs.count(q => ratios.contains(q.name))

    val extra = Seq("wafer_pipeline", "snapshot_read_asof",
      "snapshot_read_cdc", "snapshot_read_retention")
      .flatMap(n => extraRatios.get(n).map(r => s"| $n | (composed/storage path — ScaleCheck special row) | — | $r |"))

    val md = new StringBuilder
    md.append("# CATALOG — generated query index\n\n")
    md.append("GENERATED by `runMain graft.tools.CatalogGen` from the\n")
    md.append("`SparkEntry.queries` registry — do not edit by hand (SURVEY §8\n")
    md.append("and README point here; regenerate after adding a wave).\n\n")
    md.append(s"**${defs.size} declared queries** — oracle types: ")
    md.append(s"${counts.getOrElse("hash", 0)} hash, ")
    md.append(s"${counts.getOrElse("contract", 0)} contract, ")
    md.append(s"${counts.getOrElse("rows", 0)} rows-only. ")
    md.append(s"$measured have a measured 10× ratio (newest round wins; ")
    md.append("`—` = excluded from the ScaleCheck roster, exclusions are\n")
    md.append("documented in the newest SCALE_r*.md).\n\n")
    md.append("| query | defined at | oracle | 10× ratio |\n|---|---|---|---|\n")
    rows.foreach(r => md.append(r).append("\n"))
    if (extra.nonEmpty) {
      md.append("\nComposed / storage paths measured as ScaleCheck special rows:\n\n")
      md.append("| path | defined at | oracle | 10× ratio |\n|---|---|---|---|\n")
      extra.foreach(r => md.append(r).append("\n"))
    }

    // Bench history with the SELF-NORMALIZING comparison (round-11
    // verdict item 2): raw headline seconds are only comparable between
    // same-box calm runs; headline / mean(calibration_s,
    // calibration_end_s) is dimensionless in box speed — the workload
    // runs BETWEEN the two probes, so the bracketing mean is the box
    // speed while it ran (end-only misnormalizes when a drift wave
    // starts or ends mid-run) — so THIS column is the cross-round
    // gate. Generated from the driver-recorded BENCH_r*.json (rounds
    // before r11 carry no calibration — their calibrated cell is `—`).
    val benchFiles = {
      val st = Files.list(root)
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.matches("BENCH_r\\d+\\.json"))
        .toSeq.sortBy(p =>
          p.getFileName.toString.stripPrefix("BENCH_r").stripSuffix(".json").toInt)
      finally st.close()
    }
    def jNum(text: String, key: String): Option[Double] =
      s""""$key":\\s*([-\\d.eE]+)""".r.findFirstMatchIn(text).map(_.group(1).toDouble)
    val benchRows = benchFiles.map { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      val round = p.getFileName.toString.stripPrefix("BENCH_r").stripSuffix(".json")
      val v = jNum(text, "value")
      val calW = jNum(text, "calibration_s").filter(_ > 0)
      val calE = jNum(text, "calibration_end_s").filter(_ > 0)
      val cal = (calW, calE) match {
        case (Some(w), Some(e)) => Some((w + e) / 2)
        case _ => None
      }
      val calibrated = (v, cal) match {
        case (Some(a), Some(c)) => f"${a / c}%.2f"
        case _ => "—"
      }
      s"| r${round.toInt} | ${v.fold("—")(x => f"$x%.2f")} | ${cal.fold("—")(x => f"$x%.3f")} | $calibrated |"
    }
    if (benchRows.nonEmpty) {
      md.append("\nBench headline history (warm median-of-3, sf0.1; calibrated\n")
      md.append("= value / mean(calibration_s, calibration_end_s) — the\n")
      md.append("drift-proof comparison):\n\n")
      md.append("| round | headline s | mean calibration s | calibrated |\n|---|---|---|---|\n")
      benchRows.foreach(r => md.append(r).append("\n"))
    }
    Files.write(root.resolve("CATALOG.md"),
      md.toString.getBytes("UTF-8"))
    println(s"[catalog] wrote ${root.resolve("CATALOG.md")} — ${defs.size} queries, $measured with ratios")

    // CAPABILITIES.md — the per-capability narrative SURVEY §8 cites
    // for waves past round 8 (round-12 verdict item 5): every wave
    // file's HEADER scaladoc (which documents each declared query's
    // capability and scale plan) emitted verbatim, grouped by file in
    // registry order, each group listing its declared queries. Every
    // catalog query is therefore reachable from a generated capability
    // row, and the narrative cannot drift from the code because it IS
    // the code's own header.
    def headerDoc(path: Path): String = {
      val text = new String(Files.readAllBytes(path), "UTF-8")
      val start = text.indexOf("/**")
      val end = text.indexOf("*/", start)
      if (start < 0 || end < 0) ""
      else text.substring(start + 3, end).linesIterator
        .map(_.replaceFirst("^\\s*\\*\\s?", "").stripTrailing())
        .mkString("\n").trim
    }
    val byFile = defs.map(q => defSite(q.name).split(":")(0) -> q.name)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val fileOrder = defs.map(q => defSite(q.name).split(":")(0)).distinct
    val cap = new StringBuilder
    cap.append("# CAPABILITIES — generated per-wave capability index\n\n")
    cap.append("GENERATED by `runMain graft.tools.CatalogGen` from each wave\n")
    cap.append("file's header scaladoc — do not edit by hand. SURVEY §8 cites\n")
    cap.append("this file as the per-capability narrative for every declared\n")
    cap.append("query; per-query oracle/ratio status lives in CATALOG.md.\n")
    fileOrder.foreach { f =>
      val qs = byFile.getOrElse(f, Seq.empty)
      cap.append(s"\n## `$f` — ${qs.mkString(", ")}\n\n")
      val doc = headerDoc(root.resolve(f))
      cap.append(if (doc.nonEmpty) doc else "(no header scaladoc)").append("\n")
    }
    Files.write(root.resolve("CAPABILITIES.md"),
      cap.toString.getBytes("UTF-8"))
    println(s"[catalog] wrote ${root.resolve("CAPABILITIES.md")} — ${fileOrder.size} wave files")
  }
}
