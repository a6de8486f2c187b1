package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for the named
  * queries (all when none given) at the given sf dir. Used to audit
  * pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs
  * shuffle), and whole-stage codegen spans per SURVEY.md §4.
  *
  * Usage: scripts/run.sh graft.Explain /root/testdata/sf0.001 [name...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
