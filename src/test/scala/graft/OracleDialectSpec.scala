package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Offline contract for the S2 Oracle face: the dialect Spark resolves
  * for oracle URLs and the reader options graft layers on it. The live
  * extract path is the SAME partitioned reader TablesSpec certifies
  * end-to-end on embedded Derby — this spec pins everything
  * Oracle-specific that can be checked without an Oracle instance. */
class OracleDialectSpec extends AnyFunSuite with SharedSpark {

  test("spark resolves a dedicated Oracle dialect for oracle URLs") {
    val d = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:oracle:thin:@warehouse:1521/svc")
    // not the no-op fallback: Oracle identifier quoting is double
    // quotes (case-sensitive names survive), and the dialect must
    // compile Spark's LIMIT onto Oracle (ROWNUM/FETCH FIRST) for
    // pushdown — presence of the dedicated dialect is what S2's
    // pushdown claims rest on
    assert(d.getClass.getName.toLowerCase.contains("oracle"),
      s"expected the built-in OracleDialect, got ${d.getClass}")
    assert(d.quoteIdentifier("ldap_uid") == "\"ldap_uid\"")
  }

  test("oracleJdbc pins date mapping, NLS session, fetch size, schema") {
    val opts = Tables.oracleOptions(
      Some("enrollment_id LONG, units DOUBLE"))
    // DATE must stay a date: the driver's Timestamp default shifts
    // calendar dates across the UTC boundary
    assert(opts("oracle.jdbc.mapDateToTimestamp") == "false")
    // deterministic per-connection formats for pushed predicates
    assert(opts("sessionInitStatement").contains("NLS_DATE_FORMAT"))
    assert(opts("sessionInitStatement").contains("FF6"))
    // bulk fetch, not the 10-row driver default
    assert(opts("fetchsize").toInt >= 1000)
    // NUMBER-without-scale lands as the caller's narrow type
    assert(opts("customSchema") == "enrollment_id LONG, units DOUBLE")
    // and the url guard rejects non-oracle URLs outright
    intercept[IllegalArgumentException] {
      Tables.oracleJdbc(spark, "jdbc:derby:memory:x", "T", "ID",
        0L, 1L, 1)
    }
  }
}
