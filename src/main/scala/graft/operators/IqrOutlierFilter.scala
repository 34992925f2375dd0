package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group sequential upper-IQR outlier filter.
  *
  * Re-expresses the reference's `remove_outliers_by_class`
  * (`/root/reference/src/preprocessing.py:69-113`) Spark-first: instead of
  * pandas' group-iterate-concat, each column pass is
  * groupBy→agg(percentile)→broadcast-join→filter, so the big side never
  * shuffles — only the tiny per-group bounds table moves.
  *
  * Pinned reference semantics:
  *   - columns are filtered **sequentially**: pass N's quantiles are
  *     computed on the survivors of pass N-1 (preprocessing.py:96-108
  *     rebinds `filtered`);
  *   - **upper bound only**: drop rows with value > Q3 + k·IQR
  *     (README.md:47-54 confirms no lower bound);
  *   - a group is left unfiltered for a column when it has <2 non-null
  *     values (preprocessing.py:97) or IQR == 0 (preprocessing.py:104);
  *   - rows whose value is null in the filtered column are dropped in
  *     filtered groups (pandas `NaN <= x` → False) but kept in skipped
  *     groups;
  *   - rows with a null group key are dropped entirely when
  *     `dropNullKeys` (pandas groupby drops NaN keys — a documented
  *     reference behavior we replicate, see SURVEY.md §2 D1).
  *
  * Scale: the bounds side is ≤ #groups rows → always broadcast. The data
  * side is scanned once per column pass; callers with expensive upstream
  * plans should cache the input. Exact `percentile` is a full-sort-per-
  * group aggregate — at 100 TB swap `exact=false` to use
  * `approx_percentile` (t-digest, single pass, mergeable) at a bounded
  * accuracy cost.
  */
object IqrOutlierFilter {
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String],
      k: Double = 1.5,
      dropNullKeys: Boolean = true,
      exact: Boolean = true): DataFrame = {
    // reduceOption: groupCols may be EMPTY (global, ungrouped IQR pass —
    // the reference's whole-frame form); a bare reduce throws on it
    var cur =
      if (dropNullKeys)
        df.filter(groupCols.map(col(_).isNotNull)
          .reduceOption(_ && _).getOrElse(lit(true)))
      else df
    for (c <- valueCols) {
      // Both quartiles come from ONE percentile(col, array(...)) aggregate
      // so the group's values are buffered (exact) / sketched (approx)
      // once, not once per quantile.
      val pcts =
        if (exact) expr(s"percentile($c, array(0.25D, 0.75D))")
        else expr(s"approx_percentile($c, array(0.25D, 0.75D), 10000)")
      // The per-group bounds are <= #groups rows: collect them eagerly and
      // rejoin as a literal LocalRelation. Keeping them lazy instead would
      // embed pass N-1's whole join subtree inside pass N's aggregate —
      // the final plan then re-executes every earlier pass per pass
      // (O(cols²) scans); with literal bounds the final plan is one scan
      // plus a linear chain of broadcast-local joins and filters.
      val bounds = cur
        .groupBy(groupCols.map(col): _*)
        .agg(pcts.as("__qs"), count(col(c)).as("__cnt"))
        .withColumn("__q1", element_at(col("__qs"), 1).cast("double"))
        .withColumn("__q3", element_at(col("__qs"), 2).cast("double"))
        .drop("__qs")
        .withColumn("__ub", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      val boundsLocal = {
        val rows = bounds.collect().toList
        df.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          bounds.schema)
      }
      // dropNullKeys=false must join NULL-SAFELY: groupBy emits a
      // null-key bounds row, but a using-columns inner join never
      // matches null = null — the kept-null-keys promise would
      // silently drop those rows anyway.
      val joined =
        if (dropNullKeys) cur.join(broadcast(boundsLocal), groupCols, "inner")
        else {
          val bl = groupCols.foldLeft(boundsLocal)(
            (d, g) => d.withColumnRenamed(g, s"__bk_$g"))
          cur.join(broadcast(bl),
              // reduceOption: empty groupCols degenerates to the one-row
              // global-bounds cross join (lit(true)), matching the old
              // using-columns behavior instead of throwing
              groupCols.map(g => col(g) <=> col(s"__bk_$g"))
                .reduceOption(_ && _).getOrElse(lit(true)),
              "inner")
            .drop(groupCols.map(g => s"__bk_$g"): _*)
        }
      cur = joined
        .filter(
          col("__cnt") < 2 ||
            (col("__q3") - col("__q1")) === 0.0 ||
            (col(c).isNotNull && col(c) <= col("__ub")))
        .drop("__q1", "__q3", "__cnt", "__ub")
    }
    cur.select(df.columns.map(col).toIndexedSeq: _*) // using-column joins move keys first; restore input order
  }
}
