package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** One SparkSession per suite, configured exactly like Verify/Bench
  * (UTC, nanos legacy conf set at build — never mutated later). */
trait SharedSpark extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(self.getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // shared across suites in one JVM — do not stop; Spark cleans up at exit
    super.afterAll()
  }
}
