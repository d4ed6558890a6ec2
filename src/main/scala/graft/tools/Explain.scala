package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection main: prints the formatted physical plan of the
  * named queries (or a default set) — the `.explain("formatted")`
  * feedback loop for pushdown / broadcast / codegen review. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("f02_comppct_cutoff", "a03_dominant_condition",
        "a18_hz_wta_sum", "s08_rating_raster_join", "j13_merged_rating_tables")
    for (n <- names) {
      println(s"\n===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
