package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity + whole-catalog smoke at sf0.001: every declared
  * query runs, returns rows, and keeps the naming contract the driver's
  * hash-compare depends on (lowercase, no duplicate names). */
class CatalogSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.modules.flatMap(_.all).map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(
      SparkEntry.queries.keySet))
  }

  test("every job pipeline references only existing catalog queries") {
    graft.jobs.Jobs.pipelines.foreach { case (job, qs) =>
      val missing = qs.map(_._1).filterNot(SparkEntry.queries.contains)
      assert(missing.isEmpty, s"$job references unknown: $missing")
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 with rows and lowercase columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          val badCols = df.columns.filterNot(c => c == c.toLowerCase)
          val n = df.count()
          (if (badCols.nonEmpty)
             Seq(s"$name: non-lowercase columns ${badCols.mkString(",")}")
           else Nil) ++
            (if (n == 0) Seq(s"$name: 0 rows") else Nil)
        } catch {
          case e: Exception => Seq(s"$name: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
