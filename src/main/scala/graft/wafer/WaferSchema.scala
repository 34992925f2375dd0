package graft.wafer

import org.apache.spark.sql.types._

/** The reference pipeline's data model (SURVEY.md §1; constants from
  * /root/reference/src/preprocessing.py:14-43).
  *
  * The reference infers schema from CSV; we declare it explicitly — the
  * per-stage "Schema Validator" its README promises but never ships
  * (README.md:60, SURVEY.md §1.3).
  */
object WaferSchema {
  /** Outlier-removal columns, filtered sequentially in this order
    * (preprocessing.py:14).
    */
  val sizeCols: Seq[String] = Seq("SIZE_X", "SIZE_Y", "DEFECT_AREA")

  /** 18 K-Means features (preprocessing.py:16-35). */
  val clusterFeatures: Seq[String] = Seq(
    "SIZE_X", "SIZE_Y", "DEFECT_AREA",
    "ENERGY_PARAM", "MDAT_OFFSET", "RELATIVEMAGNITUDE",
    "PATCHDEFECTSIGNAL", "INTENSITY", "POLARITY",
    "MDAT_GL", "MDAT_NOISE", "PATCHNOISE",
    "SIZE_D", "RADIUS", "ANGLE",
    "ALIGNRATIO", "SPOTLIKENESS", "ACTIVERATIO")

  /** Process steps clustered independently (preprocessing.py:37). */
  val defaultSteps: Seq[String] = Seq("PC", "RMG", "CBCMP")

  /** (step → killer cluster id) rule table (preprocessing.py:39-43). */
  val killerClusterMapping: Map[String, Int] = Map("PC" -> 1, "RMG" -> 1, "CBCMP" -> 0)

  /** Full 25-column input schema: 21 columns named in reference code +
    * 4 pass-through identifier columns (FIXTURES.md §A).
    */
  val inputSchema: StructType = StructType(
    Seq(
      StructField("LOT_ID", StringType),
      StructField("WAFER_ID", StringType),
      StructField("COORD_X", DoubleType),
      StructField("COORD_Y", DoubleType),
      StructField("Class", StringType),
      StructField("IS_DEFECT", StringType),
      StructField("Step_desc", StringType)) ++
      clusterFeatures.map(StructField(_, DoubleType)))

  require(inputSchema.length == 25)
}
